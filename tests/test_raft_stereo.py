"""RAFT-Stereo model: shapes, scan behavior, loss, gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig, get_model
from dkt_stereo_tpu.losses import sequence_loss_raft

CFG = RAFTStereoConfig(mixed_precision=False, context_norm="instance")
B, H, W = 1, 64, 96


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(1)
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    return img1, img2


def test_registry():
    model_cls, cfg_cls, loss_fn = get_model("RAFTStereo")
    assert model_cls is RAFTStereo and cfg_cls is RAFTStereoConfig


def test_train_forward_shapes(images):
    img1, img2 = images
    model = RAFTStereo(CFG, iters=3, test_mode=False)
    params = model.init(jax.random.PRNGKey(0), img1, img2)
    out = model.apply(params, img1, img2)
    assert out["disp_preds"].shape == (3, B, H, W)
    assert np.isfinite(np.asarray(out["disp_preds"])).all()


def test_test_mode_matches_last_train_pred(images):
    img1, img2 = images
    train_model = RAFTStereo(CFG, iters=3, test_mode=False)
    params = train_model.init(jax.random.PRNGKey(0), img1, img2)
    train_out = train_model.apply(params, img1, img2)

    test_model = RAFTStereo(CFG, iters=3, test_mode=True)
    coarse, disp_up = test_model.apply(params, img1, img2)
    assert coarse.shape == (B, H // 4, W // 4, 1)
    assert disp_up.shape == (B, H, W)
    np.testing.assert_allclose(
        np.asarray(disp_up), np.asarray(train_out["disp_preds"][-1]), atol=1e-4
    )


def test_flow_init_changes_result(images):
    img1, img2 = images
    model = RAFTStereo(CFG, iters=2, test_mode=True)
    params = model.init(jax.random.PRNGKey(0), img1, img2)
    _, d0 = model.apply(params, img1, img2)
    init = -2.0 * jnp.ones((B, H // 4, W // 4, 1))
    _, d1 = model.apply(params, img1, img2, init)
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_loss_and_grads(images):
    img1, img2 = images
    model = RAFTStereo(CFG, iters=2, test_mode=False)
    params = model.init(jax.random.PRNGKey(0), img1, img2)
    rng = np.random.default_rng(2)
    flow_gt = jnp.asarray(-rng.uniform(0, 30, (B, H, W)).astype(np.float32))
    valid = jnp.ones((B, H, W), jnp.float32)

    def loss_fn(p):
        out = model.apply(p, img1, img2)
        loss, metrics, m, ok = sequence_loss_raft(out["disp_preds"], flow_gt, valid)
        return loss, (metrics, ok)

    (loss, (metrics, ok)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss)) and bool(ok)
    assert float(metrics["epe"]) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    norms = [float(jnp.abs(g).sum()) for g in leaves]
    assert all(np.isfinite(norms))
    assert sum(n > 0 for n in norms) > len(norms) * 0.5


def test_loss_gamma_weights_match_reference():
    # vs loss.py:25-29 formula on synthetic preds
    n, b, h, w = 4, 1, 4, 5
    rng = np.random.default_rng(3)
    preds = rng.standard_normal((n, b, h, w)).astype(np.float32)
    gt = rng.standard_normal((b, h, w)).astype(np.float32)
    valid = np.ones((b, h, w), np.float32)
    loss, metrics, m, ok = sequence_loss_raft(
        jnp.asarray(preds), jnp.asarray(gt), jnp.asarray(valid)
    )
    gamma_adj = 0.9 ** (15 / (n - 1))
    want = sum(
        gamma_adj ** (n - 1 - i) * np.abs(preds[i] - gt).mean() for i in range(n)
    )
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_loss_nan_pred_flags_not_ok():
    preds = jnp.full((2, 1, 4, 5), jnp.nan)
    gt = jnp.zeros((1, 4, 5))
    valid = jnp.ones((1, 4, 5))
    loss, _, _, ok = sequence_loss_raft(preds, gt, valid)
    assert not bool(ok)
    assert float(loss) == 0.0


def test_alt_corr_matches_reg(images):
    # "alt" (on-the-fly recompute) must equal "reg" (materialized volume):
    # avg pooling is linear in fmap2, so the two formulations coincide
    img1, img2 = images
    cfg_reg = RAFTStereoConfig(mixed_precision=False, context_norm="instance",
                               corr_dtype="float32")
    cfg_alt = RAFTStereoConfig(mixed_precision=False, context_norm="instance",
                               corr_dtype="float32", corr_implementation="alt")
    m_reg = RAFTStereo(cfg_reg, iters=2, test_mode=True)
    m_alt = RAFTStereo(cfg_alt, iters=2, test_mode=True)
    params = m_reg.init(jax.random.PRNGKey(0), img1, img2)
    _, d_reg = m_reg.apply(params, img1, img2)
    _, d_alt = m_alt.apply(params, img1, img2)
    np.testing.assert_allclose(np.asarray(d_alt), np.asarray(d_reg), atol=1e-3)


def test_mix_corr_runs(images):
    img1, img2 = images
    cfg = RAFTStereoConfig(mixed_precision=False, context_norm="instance",
                           corr_implementation="mix_fmap_image")
    model = RAFTStereo(cfg, iters=2, test_mode=False)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mix": jax.random.PRNGKey(1)}, img1, img2
    )
    out = model.apply(params, img1, img2, rngs={"mix": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(out["disp_preds"])).all()
    # different mix keys -> different volumes -> different outputs
    out2 = model.apply(params, img1, img2, rngs={"mix": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(out["disp_preds"]), np.asarray(out2["disp_preds"]))


def test_scan_unroll_identical(rng):
    # scan_unroll fuses k iterations per scan step with shared params —
    # must be numerically identical in both modes (pure loop restructure)
    import dataclasses

    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig

    B, H, W = 1, 32, 64
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    cfg1 = RAFTStereoConfig(mixed_precision=False, context_norm="instance",
                            corr_dtype="float32")
    cfg2 = dataclasses.replace(cfg1, scan_unroll=2)
    m1 = RAFTStereo(cfg1, iters=4, test_mode=True)
    m2 = RAFTStereo(cfg2, iters=4, test_mode=True)
    params = m1.init(jax.random.PRNGKey(0), img1, img2)
    _, d1 = m1.apply(params, img1, img2)
    _, d2 = m2.apply(params, img1, img2)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))

    t1 = RAFTStereo(cfg1, iters=4, test_mode=False)
    t2 = RAFTStereo(cfg2, iters=4, test_mode=False)
    o1 = t1.apply(params, img1, img2)["disp_preds"]
    o2 = t2.apply(params, img1, img2)["disp_preds"]
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_mix_corr_consumes_rng(rng):
    """mix_fmap_image blends image/feature volumes with a per-forward random
    weight (raft_stereo/corr.py:225-228); the 'mix' rng must actually change
    the output (regression: with no rng supplied the blend silently froze at
    0.5 — the DKT step now threads one per forward)."""
    import jax

    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig

    cfg = RAFTStereoConfig(
        mixed_precision=False, context_norm="instance",
        corr_implementation="mix_fmap_image",
    )
    model = RAFTStereo(cfg, iters=2, test_mode=False)
    r = np.random.default_rng(0)
    img1 = jnp.asarray(r.uniform(0, 255, (1, 32, 64, 3)).astype(np.float32))
    img2 = jnp.asarray(r.uniform(0, 255, (1, 32, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), img1, img2)

    o1 = model.apply(params, img1, img2, rngs={"mix": jax.random.PRNGKey(1)})
    o2 = model.apply(params, img1, img2, rngs={"mix": jax.random.PRNGKey(2)})
    o3 = model.apply(params, img1, img2, rngs={"mix": jax.random.PRNGKey(1)})
    a1, a2, a3 = (np.asarray(o["disp_preds"]) for o in (o1, o2, o3))
    assert not np.allclose(a1, a2)  # different keys -> different blend
    np.testing.assert_array_equal(a1, a3)  # same key -> deterministic
