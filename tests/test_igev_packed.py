"""Depth-to-lane packed 3D conv (nn/conv3d_packed.py) vs the direct NDHWC
path: the packed kernel is the 3D kernel scattered into zeros, so results
must match to accumulation-order fp error. Also pins the full IGEV forward
under agg_packed=True vs False on the SAME parameters (the packed layout
changes no parameter tree — checkpoint interchange holds)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dkt_stereo_tpu.nn.conv3d_packed import conv3d_packed, deconv3d_packed


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize(
    "kd,stride,pad,D",
    [(3, 1, 1, 8), (3, 2, 1, 8), (3, 2, 1, 9), (1, 1, 0, 6), (3, 1, 1, 5)],
)
def test_conv3d_packed_matches_direct(kd, stride, pad, D):
    rng = np.random.default_rng(0)
    B, H, W, Ci, Co = 2, 6, 7, 3, 5
    x = _rand(rng, B, D, H, W, Ci)  # NDHWC
    k = _rand(rng, kd, kd, kd, Ci, Co)

    ref = jax.lax.conv_general_dilated(
        x, k, (stride,) * 3, [(pad, pad)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    got = conv3d_packed(
        x.transpose(0, 2, 3, 1, 4), k, (stride,) * 3, (pad,) * 3
    ).transpose(0, 3, 1, 2, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("k,stride,pad,opad,D", [(4, 2, 1, 0, 6), (3, 2, 1, 1, 5), (4, 2, 1, 0, 7)])
def test_deconv3d_packed_matches_torch_semantics(k, stride, pad, opad, D):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    B, H, W, Ci, Co = 1, 5, 6, 3, 4
    x = rng.standard_normal((B, D, H, W, Ci)).astype(np.float32)
    # stored layout (k,k,k,O,I) = torch (I,O,kd,kh,kw).transpose(2,3,4,1,0)
    w_t = rng.standard_normal((Ci, Co, k, k, k)).astype(np.float32)
    w = jnp.asarray(np.transpose(w_t, (2, 3, 4, 1, 0)))

    with torch.no_grad():
        ref = torch.nn.functional.conv_transpose3d(
            torch.from_numpy(x).permute(0, 4, 1, 2, 3),
            torch.from_numpy(w_t), stride=stride, padding=pad, output_padding=opad,
        ).permute(0, 2, 3, 4, 1).numpy()

    got = deconv3d_packed(
        jnp.asarray(x).transpose(0, 2, 3, 1, 4), w,
        (stride,) * 3, (pad,) * 3, (opad,) * 3,
    ).transpose(0, 3, 1, 2, 4)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5, rtol=3e-5)


def test_igev_forward_packed_matches_direct():
    from dkt_stereo_tpu.models import IGEVStereo, IGEVStereoConfig

    rng = np.random.default_rng(2)
    B, H, W = 1, 64, 96
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))

    cfg_direct = IGEVStereoConfig(mixed_precision=False, max_disp=64, agg_packed=False)
    cfg_packed = IGEVStereoConfig(mixed_precision=False, max_disp=64, agg_packed=True)
    m_direct = IGEVStereo(cfg_direct, iters=2, test_mode=True)
    m_packed = IGEVStereo(cfg_packed, iters=2, test_mode=True)
    m_direct_t = IGEVStereo(cfg_direct, iters=2, test_mode=False)
    m_packed_t = IGEVStereo(cfg_packed, iters=2, test_mode=False)

    # train-mode tree is the superset (spx_4_* heads); test mode shares the
    # rest via the ghost-param scopes
    params = m_direct_t.init(jax.random.PRNGKey(0), img1, img2)
    # identical parameter trees: the packed path must apply the same params
    _, disp_d = m_direct.apply(params, img1, img2)
    _, disp_p = m_packed.apply(params, img1, img2)
    np.testing.assert_allclose(
        np.asarray(disp_p), np.asarray(disp_d), atol=1e-3, rtol=1e-3
    )

    # and train mode (init_disp head + spx path share the volume)
    out_d = m_direct_t.apply(params, img1, img2)
    out_p = m_packed_t.apply(params, img1, img2)
    np.testing.assert_allclose(
        np.asarray(out_p["init_disp"]), np.asarray(out_d["init_disp"]), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_p["disp_preds"]), np.asarray(out_d["disp_preds"]), atol=1e-3, rtol=1e-3
    )
