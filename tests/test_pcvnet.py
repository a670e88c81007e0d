"""PCVNet: parameter updater math vs reference formula, shapes, cascade, loss."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from dkt_stereo_tpu.models import PCVNet, PCVNetConfig
from dkt_stereo_tpu.losses.pcv import sequence_loss_pcvnet
from dkt_stereo_tpu.nn.pcv import gaussian_corr_lookup, gaussian_corr_pyramid

CFG = PCVNetConfig(mixed_precision=False)
B, H, W = 1, 32, 64


def test_gaussian_corr_lookup_matches_reference(rng):
    # vs pcvnet/corr.py:18-51 recomputed in torch
    import torch.nn.functional as F

    b, h, w = 1, 3, 64  # pyramid 64→16→4 (w=16 would degenerate to W2=1,
    G, S, L, cf = 4, 9, 3, 4  # where the reference's normalization is NaN)
    vol = rng.standard_normal((b, h, w, w)).astype(np.float32)
    mu_coords = rng.uniform(0, w, (b, h, w, G)).astype(np.float32)
    sigma = rng.uniform(0.5, 4, (b, h, w, G)).astype(np.float32)

    pyr = gaussian_corr_pyramid(jnp.asarray(vol), L, cf)
    ours = np.asarray(
        gaussian_corr_lookup([jnp.asarray(p) for p in pyr], jnp.asarray(mu_coords), jnp.asarray(sigma), S, cf)
    )

    corr = torch.from_numpy(vol).reshape(b * h * w, 1, 1, w)
    t_pyr = [corr]
    for _ in range(L - 1):
        corr = F.avg_pool2d(corr, [1, cf], stride=[1, cf])
        t_pyr.append(corr)
    idx = torch.arange(-(S // 2), S // 2 + 1).view(1, 1, 1, S).float()
    sig = torch.from_numpy(sigma).reshape(b * h * w, 1, G, 1)
    coo = torch.from_numpy(mu_coords).reshape(b * h * w, 1, G, 1)
    x = idx * sig + coo
    outs = []
    for i, c in enumerate(t_pyr):
        x0 = (x / cf**i).reshape(b * h * w, 1, G * S, 1)
        Sw = c.shape[-1]
        xg = 2 * x0 / (Sw - 1) - 1
        grid = torch.cat([xg, torch.zeros_like(x0)], dim=-1)
        s = F.grid_sample(c, grid, align_corners=True).view(b, h, w, -1)
        outs.append(s)
    theirs = torch.cat(outs, dim=-1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_parameters_updater_matches_reference_math(rng):
    # closed-form update formulas (update.py:87-112) vs direct numpy recompute
    from dkt_stereo_tpu.nn.pcv import ParametersUpdater

    G = 4
    hidden = jnp.asarray(rng.standard_normal((1, 4, 5, 128)).astype(np.float32))
    mu = jnp.asarray(rng.uniform(0, 50, (1, 4, 5, G)).astype(np.float32))
    sigma = jnp.asarray(rng.uniform(0.5, 8, (1, 4, 5, G)).astype(np.float32))
    w = jax.nn.softmax(jnp.asarray(rng.standard_normal((1, 4, 5, G)).astype(np.float32)), -1)

    m = ParametersUpdater(G)
    params = m.init(jax.random.PRNGKey(0), hidden, mu, sigma, w)
    mu2, w2, sigma2 = m.apply(params, hidden, mu, sigma, w)

    # recompute from the delta produced by the head
    from dkt_stereo_tpu.nn.gru import FlowHead

    delta = np.asarray(
        FlowHead(256, G).apply({"params": params["params"]["head"]}, hidden)
    )
    mu_n, sig_n, w_n = np.asarray(mu), np.asarray(sigma), np.asarray(w)
    M, s0, eps = float(G), 0.5, 1e-3
    d_sigma = 0.5 * (((1 - M * w_n) * sig_n**2 - s0**2 - delta**2) / (M * sig_n**3) + w_n * sig_n / s0**2)
    d_mu = -0.5 * delta * (1 / (M * sig_n**2) + w_n / s0**2)
    beta = 0.5 * (-1 / (M * w_n + eps) + np.log(s0 * M * w_n / sig_n + eps) + (sig_n**2 + delta**2) / (2 * s0**2) + 0.5)
    d_w = beta - beta.sum(-1, keepdims=True) / M
    d_sigma = np.clip(d_sigma, -3, 3)
    d_mu = np.clip(d_mu, -128, 128)
    d_w = np.clip(d_w, -1 / (M * 4), 1 / (M * 4))
    want_sigma = np.clip(sig_n - d_sigma, 0.1, 16)
    want_mu = mu_n - d_mu
    want_w = np.clip(w_n - d_w, 0, 1)
    want_w = want_w / want_w.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(sigma2), want_sigma, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mu2), want_mu, atol=1e-4)
    np.testing.assert_allclose(np.asarray(w2), want_w, atol=1e-5)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    model = PCVNet(CFG, iters=2, test_mode=False)
    params = model.init(jax.random.PRNGKey(0), img1, img2)
    return img1, img2, model, params


def test_pcvnet_forward_shapes(setup):
    img1, img2, model, params = setup
    out = model.apply(params, img1, img2)
    refined, disp_seq, mu_seq, w_seq, sigma_seq = out["output_list"]
    assert refined.shape == (B, H, W)
    assert disp_seq.shape == (2, B, H, W)
    assert mu_seq.shape == (2, B, H, W, 4)
    assert out["disp_preds"].shape == (1, B, H, W)
    assert np.isfinite(np.asarray(out["disp_preds"])).all()
    # disp_preds is the negated refined map; the refinement residual is
    # unconstrained at random init, so only the pre-refine sequence is
    # sign-definite: disp_seq = Σ w·μ with w ≥ 0 and μ clipped ≥ 0
    w = np.asarray(w_seq)
    assert np.isfinite(np.asarray(disp_seq)).all()
    assert (np.asarray(disp_seq) >= 0).all()
    assert (w >= 0).all() and (np.asarray(sigma_seq) > 0).all()
    # mixture weights stay normalized after the convex upsample in the
    # INTERIOR (a convex combination of simplex points); at borders the
    # reference's zero-padded unfold (model.py:68) lets softmax mass land
    # on zero taps, so sums legitimately dip below 1 there
    f = 2 ** CFG.n_downsample
    np.testing.assert_allclose(w[:, :, f:-f, f:-f].sum(-1), 1.0, atol=1e-3)
    assert w.sum(-1).max() <= 1.0 + 1e-3

    test_model = PCVNet(CFG, iters=2, test_mode=True)
    _, disp = test_model.apply(params, img1, img2)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(out["disp_preds"][0]), atol=1e-4)


def test_pcvnet_cascade(setup):
    img1, img2, model, params = setup
    casc = PCVNet(CFG, iters=2, test_mode=True, cascade=True)
    init_params = casc.apply(params, img1, img2)
    assert set(init_params) == {"disp", "sigma", "mu", "w"}
    assert init_params["mu"].shape == (B, H, W, 4)
    # test mode recomputes the final iteration's upsampled parameters from the
    # scan carry — must match the train-mode per-iteration outputs exactly
    casc_train = PCVNet(CFG, iters=2, test_mode=False, cascade=True)
    train_ip = casc_train.apply(params, img1, img2)["init_params"]
    for k in ("disp", "sigma", "mu", "w"):
        np.testing.assert_allclose(
            np.asarray(init_params[k]), np.asarray(train_ip[k]), atol=1e-5, err_msg=k
        )
    # feed into a second full-res stage
    full = PCVNet(CFG, iters=2, test_mode=True)
    _, disp = full.apply(params, img1, img2, None, jax.lax.stop_gradient(init_params))
    assert disp.shape == (B, H, W)


def test_pcvnet_loss_and_grads(setup):
    img1, img2, model, params = setup
    rng = np.random.default_rng(2)
    gt = jnp.asarray(-rng.uniform(1, 30, (B, H, W)).astype(np.float32))
    valid = jnp.ones((B, H, W))

    def f(p):
        out = model.apply(p, img1, img2)
        loss, metrics, m, ok = sequence_loss_pcvnet(out["output_list"], gt, valid)
        return loss, (metrics, ok)

    (loss, (metrics, ok)), grads = jax.value_and_grad(f, has_aux=True)(params)
    assert np.isfinite(float(loss)) and bool(ok)
    assert float(metrics["epe_final"]) > 0
    norms = [float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["params"])]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.3
