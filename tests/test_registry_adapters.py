"""Loss adapters give every model a uniform DKT interface."""

import numpy as np
import jax
import jax.numpy as jnp

from dkt_stereo_tpu.models.registry import make_loss_adapter, get_model


def test_adapters_for_all_models(rng):
    gt = jnp.asarray(-rng.uniform(1, 20, (1, 8, 8)).astype(np.float32))
    valid = jnp.ones((1, 8, 8))

    cases = {
        "RAFTStereo": {"disp_preds": jnp.asarray(-rng.uniform(0, 20, (2, 1, 8, 8)).astype(np.float32))},
        "IGEVStereo": {
            "disp_preds": jnp.asarray(-rng.uniform(0, 20, (2, 1, 8, 8)).astype(np.float32)),
            "init_disp": jnp.asarray(-rng.uniform(0, 20, (1, 8, 8)).astype(np.float32)),
        },
        "GWCNet": {"disp_preds": jnp.asarray(-rng.uniform(0, 20, (4, 1, 8, 8)).astype(np.float32))},
        "CGI_Stereo": {"disp_preds": [
            jnp.asarray(-rng.uniform(0, 20, (1, 2, 2)).astype(np.float32)),
            jnp.asarray(-rng.uniform(0, 20, (1, 8, 8)).astype(np.float32)),
        ]},
        "PCVNet": {"output_list": (
            jnp.asarray(rng.uniform(0, 20, (1, 8, 8)).astype(np.float32)),
            jnp.asarray(rng.uniform(0, 20, (2, 1, 8, 8)).astype(np.float32)),
            jnp.asarray(rng.uniform(0, 20, (2, 1, 8, 8, 4)).astype(np.float32)),
            jnp.asarray(rng.uniform(0, 1, (2, 1, 8, 8, 4)).astype(np.float32)),
            jnp.asarray(rng.uniform(0.5, 4, (2, 1, 8, 8, 4)).astype(np.float32)),
        )},
    }
    for name, outputs in cases.items():
        _, cfg_cls, _ = get_model(name)
        adapter = make_loss_adapter(name, cfg_cls())
        loss, metrics, m, ok = adapter(outputs, gt, valid)
        assert np.isfinite(float(loss)) and bool(ok), name
        assert float(metrics["epe"]) >= 0, name


def test_collate_mixed(rng):
    from dkt_stereo_tpu.data.triplet import collate_mixed

    bi = {
        "img1": rng.uniform(0, 255, (8, 8, 3)).astype(np.float32),
        "img2": rng.uniform(0, 255, (8, 8, 3)).astype(np.float32),
        "flow": -rng.uniform(0, 20, (8, 8)).astype(np.float32),
        "valid": np.ones((8, 8), np.float32),
    }
    tri = {
        "im1_forward": rng.uniform(0, 255, (8, 8, 3)).astype(np.float32),
        "im2_forward": rng.uniform(0, 255, (8, 8, 3)).astype(np.float32),
        "flow": -rng.uniform(0, 20, (8, 8)).astype(np.float32),
        "conf": rng.uniform(0, 1, (8, 8)).astype(np.float32),
        "im0": rng.uniform(0, 255, (8, 8, 3)).astype(np.float32),
        "im1": rng.uniform(0, 255, (8, 8, 3)).astype(np.float32),
        "im2": rng.uniform(0, 255, (8, 8, 3)).astype(np.float32),
    }
    data, nb, nt = collate_mixed([bi, tri, dict(bi)])
    assert (nb, nt) == (2, 1)
    assert data["im1_forward"].shape == (3, 8, 8, 3)
    assert data["bi"]["flow"].shape == (2, 8, 8)
    assert data["tri"]["conf"].shape == (1, 8, 8)


def test_all_shipped_configs_resolve():
    """Every configs/**/*.json names a registered model whose config class
    accepts it and whose model constructs (catches shipped-config typos the
    CLIs would only hit after minutes of compile)."""
    import argparse
    import glob
    import os

    from dkt_stereo_tpu.cli.config import load_model_config, merge_config
    from dkt_stereo_tpu.models import get_model

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    paths = sorted(glob.glob(os.path.join(root, "*", "*.json")))
    assert len(paths) >= 8
    for path in paths:
        config = load_model_config(path)
        model_cls, cfg_cls, loss_adapter = get_model(config["model"])
        cfg = cfg_cls.from_dict(config)
        model = model_cls(cfg, iters=2, test_mode=True)
        assert model is not None and loss_adapter is not None, path

    # CLI merge rule: flat union, strict-disjoint (ref tools/ft_dkt.py:347-350)
    args = argparse.Namespace(restore_ckpt="x.pth", valid_iters=32)
    merged = merge_config(args, {"model": "RAFTStereo", "hidden_dims": [128] * 3})
    assert merged.model == "RAFTStereo" and merged.valid_iters == 32
    try:
        merge_config(args, {"valid_iters": 16})
        raise AssertionError("clashing key must raise")
    except ValueError as e:
        assert "valid_iters" in str(e)
