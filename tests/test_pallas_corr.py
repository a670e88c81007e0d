"""Pallas corr-lookup kernel (interpret mode on CPU) vs the XLA reference op."""

import numpy as np
import jax
import jax.numpy as jnp

from dkt_stereo_tpu.ops import corr_lookup, corr_pyramid, corr_volume
from dkt_stereo_tpu.ops.pallas import corr_lookup_pallas


def _setup(rng, B=1, H=8, W=32, D=16):
    f1 = jnp.asarray(rng.standard_normal((B, H, W, D)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((B, H, W, D)).astype(np.float32))
    vol = corr_volume(f1, f2)
    pyr = tuple(corr_pyramid(vol, 4))
    coords = jnp.asarray(rng.uniform(-2, W + 2, (B, H, W, 1)).astype(np.float32))
    return pyr, coords


def test_pallas_lookup_matches_xla(rng):
    pyr, coords = _setup(rng)
    want = np.asarray(corr_lookup(list(pyr), coords, 4))
    got = np.asarray(corr_lookup_pallas(pyr, coords, 4, True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_lookup_bf16_pyramid(rng):
    pyr, coords = _setup(rng)
    pyr_bf = tuple(v.astype(jnp.bfloat16) for v in pyr)
    want = np.asarray(corr_lookup(list(pyr_bf), coords, 4))
    got = np.asarray(corr_lookup_pallas(pyr_bf, coords, 4, True))
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_pallas_lookup_vjp_matches_xla(rng):
    pyr, coords = _setup(rng, H=4, W=16)

    def f_xla(pyr):
        return (corr_lookup(list(pyr), coords, 4) ** 2).sum()

    def f_pl(pyr):
        return (corr_lookup_pallas(pyr, coords, 4, True) ** 2).sum()

    g_xla = jax.grad(f_xla)(pyr)
    g_pl = jax.grad(f_pl)(pyr)
    for a, b in zip(g_pl, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_pallas_lookup_integer_coords_exact(rng):
    # integer positions must return exact volume entries (no interp blur)
    pyr, _ = _setup(rng, H=4, W=16)
    B, H, W, _ = pyr[0].shape
    coords = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.float32)[None, None, :, None], (B, H, W, 1)
    )
    out = np.asarray(corr_lookup_pallas(pyr, coords, 4, True))
    # level 0, center tap (k=radius) == vol[b,h,w,w]
    center = out[..., 4]
    vol = np.asarray(pyr[0])
    diag = np.einsum("bhww->bhw", vol)
    np.testing.assert_allclose(center, diag, atol=1e-5)


def test_model_with_pallas_corr_matches_reg(rng):
    # full model consistency: "reg_cuda" (pallas, interpret on CPU) == "reg"
    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig

    B, H, W = 1, 32, 64
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    cfg_reg = RAFTStereoConfig(
        mixed_precision=False, context_norm="instance", corr_dtype="float32"
    )
    cfg_pl = RAFTStereoConfig(
        mixed_precision=False, context_norm="instance", corr_dtype="float32",
        corr_implementation="reg_cuda",
    )
    model_reg = RAFTStereo(cfg_reg, iters=2, test_mode=True)
    model_pl = RAFTStereo(cfg_pl, iters=2, test_mode=True)
    params = model_reg.init(jax.random.PRNGKey(0), img1, img2)
    _, d_reg = model_reg.apply(params, img1, img2)
    _, d_pl = model_pl.apply(params, img1, img2)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_reg), atol=1e-3)


# ---- fused build+lookup ("alt_cuda": volume never materialized) ----

def _alt_setup(rng, B=1, H=8, W=32, D=16, dtype=np.float32):
    f1 = jnp.asarray(rng.standard_normal((B, H, W, D)).astype(dtype))
    f2 = jnp.asarray(rng.standard_normal((B, H, W, D)).astype(dtype))
    coords = jnp.asarray(rng.uniform(-2, W + 2, (B, H, W, 1)).astype(np.float32))
    return f1, f2, coords


def test_alt_pallas_matches_materialized(rng):
    from dkt_stereo_tpu.ops.corr import fmap_pyramid
    from dkt_stereo_tpu.ops.pallas.corr_alt import corr_lookup_alt_pallas

    f1, f2, coords = _alt_setup(rng)
    vol = corr_volume(f1, f2)
    want = np.asarray(corr_lookup(corr_pyramid(vol, 4), coords, 4))
    f2t = tuple(jnp.swapaxes(f, -1, -2) for f in fmap_pyramid(f2, 4))
    got = np.asarray(corr_lookup_alt_pallas(f1, f2t, coords, 4, True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_alt_pallas_bf16_features(rng):
    from dkt_stereo_tpu.ops.corr import corr_lookup_alt, fmap_pyramid
    from dkt_stereo_tpu.ops.pallas.corr_alt import corr_lookup_alt_pallas

    f1, f2, coords = _alt_setup(rng)
    f1b, f2b = f1.astype(jnp.bfloat16), f2.astype(jnp.bfloat16)
    pyr = fmap_pyramid(f2b, 4)
    want = np.asarray(corr_lookup_alt(f1b, pyr, coords, 4))
    f2t = tuple(jnp.swapaxes(f, -1, -2) for f in pyr)
    got = np.asarray(corr_lookup_alt_pallas(f1b, f2t, coords, 4, True))
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_alt_pallas_vjp_matches_xla(rng):
    from dkt_stereo_tpu.ops.corr import corr_lookup_alt, fmap_pyramid
    from dkt_stereo_tpu.ops.pallas.corr_alt import corr_lookup_alt_pallas

    f1, f2, coords = _alt_setup(rng, H=4, W=16)

    def f_xla(f1, f2):
        return (corr_lookup_alt(f1, fmap_pyramid(f2, 4), coords, 4) ** 2).sum()

    def f_pl(f1, f2):
        f2t = tuple(jnp.swapaxes(f, -1, -2) for f in fmap_pyramid(f2, 4))
        return (corr_lookup_alt_pallas(f1, f2t, coords, 4, True) ** 2).sum()

    g1_xla, g2_xla = jax.grad(f_xla, argnums=(0, 1))(f1, f2)
    g1_pl, g2_pl = jax.grad(f_pl, argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(g1_pl), np.asarray(g1_xla), atol=1e-3)
    np.testing.assert_allclose(np.asarray(g2_pl), np.asarray(g2_xla), atol=1e-3)


def test_alt_pallas_wide_row_chunking(rng):
    # W1 > the 512-column VMEM chunk limit exercises the (g, c) grid path
    from dkt_stereo_tpu.ops.corr import fmap_pyramid
    from dkt_stereo_tpu.ops.pallas.corr_alt import _pick_cols, corr_lookup_alt_pallas

    assert _pick_cols(720) == (768, 384) and _pick_cols(320) == (320, 320)
    f1, f2, coords = _alt_setup(rng, H=8, W=576, D=8)
    vol = corr_volume(f1, f2)
    want = np.asarray(corr_lookup(corr_pyramid(vol, 4), coords, 4))
    f2t = tuple(jnp.swapaxes(f, -1, -2) for f in fmap_pyramid(f2, 4))
    got = np.asarray(corr_lookup_alt_pallas(f1, f2t, coords, 4, True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_model_with_alt_pallas_matches_reg(rng):
    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig

    B, H, W = 1, 32, 64
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    cfg_reg = RAFTStereoConfig(
        mixed_precision=False, context_norm="instance", corr_dtype="float32"
    )
    cfg_alt = RAFTStereoConfig(
        mixed_precision=False, context_norm="instance", corr_dtype="float32",
        corr_implementation="alt_cuda",
    )
    model_reg = RAFTStereo(cfg_reg, iters=2, test_mode=True)
    model_alt = RAFTStereo(cfg_alt, iters=2, test_mode=True)
    params = model_reg.init(jax.random.PRNGKey(0), img1, img2)
    _, d_reg = model_reg.apply(params, img1, img2)
    _, d_alt = model_alt.apply(params, img1, img2)
    np.testing.assert_allclose(np.asarray(d_alt), np.asarray(d_reg), atol=1e-3)


def test_pallas_lookup_chunked_large_width(rng):
    # W1·ΣW2 above the VMEM element budget routes through the per-level
    # W1-chunked path (the Middlebury-F full-res case); must match XLA
    from dkt_stereo_tpu.ops.pallas import corr_lookup as m

    pyr, coords = _setup(rng, B=1, H=8, W=576, D=8)
    G, W1 = 8, 576
    assert m._pick_rows(G) * W1 * sum(v.shape[-1] * v.dtype.itemsize for v in pyr) > m._VMEM_BYTES
    want = np.asarray(corr_lookup(list(pyr), coords, 4))
    got = np.asarray(corr_lookup_pallas(pyr, coords, 4, True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_lookup_chunked_backward(rng):
    # grads at chunked-forward geometry must route through the chunked
    # backward too (regression: the all-levels single bwd call would blow
    # the VMEM budget exactly where the forward already chunks) and match
    # the XLA gradient
    import jax

    from dkt_stereo_tpu.ops.pallas import corr_lookup as m

    pyr, coords = _setup(rng, B=1, H=8, W=576, D=8)
    G, W1 = 8, 576
    assert m._pick_rows(G) * W1 * sum(v.shape[-1] * v.dtype.itemsize for v in pyr) > m._VMEM_BYTES

    def loss_pallas(p):
        return (corr_lookup_pallas(p, coords, 4, True) ** 2).sum()

    def loss_xla(p):
        return (corr_lookup(list(p), coords, 4) ** 2).sum()

    g_pallas = jax.grad(loss_pallas)(pyr)
    g_xla = jax.grad(loss_xla)(pyr)
    for a, b in zip(g_pallas, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2, rtol=1e-4)
