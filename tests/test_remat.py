"""remat_iters (activation checkpointing of the scanned refinement step).

The TPU memory lever the reference doesn't have: a training step's
activation footprint is dominated by the per-iteration GRU/FDM activations
stacked across the scan; ``remat_iters=True`` wraps the step module in
``nn.remat`` so the backward pass recomputes them instead of storing them.
These tests pin the contract: loss AND gradients are numerically identical
with the flag on and off for every iterative model family.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _grad_fingerprint(model_cls, cfg_off, cfg_on, images, init_key=0):
    img1, img2 = images

    def build(cfg):
        model = model_cls(cfg, iters=2, test_mode=False)
        variables = model.init(jax.random.PRNGKey(init_key), img1, img2)
        rest = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            out = model.apply({**rest, "params": p}, img1, img2)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.mean(l.astype(jnp.float32) ** 2) for l in leaves)

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        return loss, grads, variables

    loss_off, g_off, v_off = build(cfg_off)
    loss_on, g_on, v_on = build(cfg_on)
    # same init → same params; the flag must not alter the param tree
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v_off["params"],
        v_on["params"],
    )
    np.testing.assert_allclose(np.asarray(loss_off), np.asarray(loss_on), rtol=1e-6)
    flat_off = jax.tree_util.tree_leaves_with_path(g_off)
    flat_on = dict(jax.tree_util.tree_leaves_with_path(g_on))
    assert len(flat_off) == len(flat_on)
    # Tolerance is normalized by the GLOBAL gradient magnitude: remat
    # recomputes the forward inside the backward, so XLA fuses/accumulates
    # in a different order; leaves whose true gradient cancels to ~0 (e.g.
    # a conv bias feeding an InstanceNorm) carry only reassociation noise
    # proportional to the magnitudes summed, not to their own near-zero
    # value. The loss comparison above is the exact-forward check.
    gmax = max(float(np.max(np.abs(np.asarray(a)))) for _, a in flat_off)
    tol = 2e-6 * (1.0 + gmax)
    for path, a in flat_off:
        b = flat_on[path]
        d = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        assert d <= tol, (jax.tree_util.keystr(path), d, tol)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(7)
    img1 = jnp.asarray(rng.uniform(0, 255, (1, 32, 64, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (1, 32, 64, 3)).astype(np.float32))
    return img1, img2


def test_raft_remat_grads_identical(images):
    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig

    cfg = dict(mixed_precision=False, context_norm="instance", corr_dtype="float32")
    _grad_fingerprint(
        RAFTStereo,
        RAFTStereoConfig(**cfg),
        RAFTStereoConfig(remat_iters=True, **cfg),
        images,
    )


def test_igev_remat_grads_identical(images):
    from dkt_stereo_tpu.models import IGEVStereo, IGEVStereoConfig

    cfg = dict(max_disp=32, mixed_precision=False)
    _grad_fingerprint(
        IGEVStereo,
        IGEVStereoConfig(**cfg),
        IGEVStereoConfig(remat_iters=True, **cfg),
        images,
    )


def test_pcv_remat_grads_identical(images):
    from dkt_stereo_tpu.models import PCVNet, PCVNetConfig

    cfg = dict(mixed_precision=False)
    _grad_fingerprint(
        PCVNet,
        PCVNetConfig(**cfg),
        PCVNetConfig(remat_iters=True, **cfg),
        images,
    )


def test_remat_composes_with_sharded_dkt_step():
    """remat inside nn.scan inside the jitted sharded DKT train step on the
    8-device virtual mesh — the full production composition."""
    import numpy as np

    from dkt_stereo_tpu.models import get_model
    from dkt_stereo_tpu.models.registry import make_loss_adapter
    from dkt_stereo_tpu.parallel import make_mesh, replicate, shard_batch
    from dkt_stereo_tpu.train import (
        DKTHyperParams,
        create_dkt_state,
        make_dkt_train_step,
    )

    hyper = DKTHyperParams(train_iters=2, teacher_iters=2, num_steps=100)
    mesh = make_mesh(8)
    B, H, W = 8, 32, 64
    rng = np.random.default_rng(0)
    batch = shard_batch(
        {
            "img1": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
            "img2": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
            "img1_clean": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
            "img2_clean": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
            "flow": -rng.uniform(0, 20, (B, H, W)).astype(np.float32),
            "valid": np.ones((B, H, W), np.float32),
        },
        mesh,
    )
    model_cls, cfg_cls, _ = get_model("RAFTStereo")
    cfg = cfg_cls(mixed_precision=False, remat_iters=True)
    state = replicate(
        create_dkt_state(cfg, hyper, jax.random.PRNGKey(0), (B, H, W), model_cls=model_cls),
        mesh,
    )
    step_fn = make_dkt_train_step(
        cfg, hyper, model_cls=model_cls,
        loss_adapter=make_loss_adapter("RAFTStereo", cfg),
    )
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))


def test_train_cli_flag_reaches_config(tmp_path):
    """--remat flips remat_iters in the parsed model config; unknown-key
    filtering keeps it harmless for the non-iterative families."""
    from dkt_stereo_tpu.cli.config import load_model_config
    from dkt_stereo_tpu.models import get_model

    config = load_model_config("configs/raft_stereo/base.json")
    config["remat_iters"] = True
    _, cfg_cls, _ = get_model(config["model"])
    assert cfg_cls.from_dict(config).remat_iters is True

    config = load_model_config("configs/gwcnet/base_g.json")
    config["remat_iters"] = True
    _, cfg_cls, _ = get_model(config["model"])
    cfg_cls.from_dict(config)  # must not raise
