"""IGEV-Stereo end-to-end numerical parity vs the reference (timm faked)."""

import os
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "meta_arch")), reason="reference not mounted"
)


def _load_ref_igev():
    import importlib
    import importlib.util

    from tests import fake_timm

    sys.modules["timm"] = fake_timm  # reference imports timm at module level
    if REF not in sys.path:
        sys.path.insert(0, REF)
    pkg_dir = os.path.join(REF, "meta_arch", "igev_stereo")
    name = "ref_igev_pkg"
    if name not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(pkg_dir, "__init__.py"),
            submodule_search_locations=[pkg_dir],
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    return importlib.import_module(f"{name}.igev_stereo").IGEVStereo


class _Args:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def test_igev_matches_reference(rng):
    TorchIGEV = _load_ref_igev()
    args = _Args(
        corr_levels=2, corr_radius=4, n_downsample=2, slow_fast_gru=False,
        n_gru_layers=3, hidden_dims=[128, 128, 128], max_disp=64,
        mixed_precision=False,
    )
    torch.manual_seed(0)
    tmodel = TorchIGEV(args)
    tmodel.eval()

    from dkt_stereo_tpu.models import IGEVStereo, IGEVStereoConfig
    from dkt_stereo_tpu.train.checkpoint import import_reference_pth

    cfg = IGEVStereoConfig(max_disp=64, mixed_precision=False)
    B, H, W = 1, 64, 128
    img1 = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)

    # train-mode template so the spx init-upsample path params exist
    train_model = IGEVStereo(cfg, iters=2, test_mode=False)
    template = train_model.init(jax.random.PRNGKey(0), jnp.asarray(img1), jnp.asarray(img2))
    variables = import_reference_pth(tmodel.state_dict(), template)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    model = IGEVStereo(cfg, iters=2, test_mode=True)
    _, ours = model.apply(variables, jnp.asarray(img1), jnp.asarray(img2))
    ours = np.asarray(ours)

    with torch.no_grad():
        t1 = torch.from_numpy(img1).permute(0, 3, 1, 2)
        t2 = torch.from_numpy(img2).permute(0, 3, 1, 2)
        _, theirs = tmodel(t1, t2, iters=2, test_mode=True)
    theirs = theirs.squeeze(1).numpy()

    # Measured across seeds 0-2: max ~1.1e-5, mean ~1.8e-6 (pure fp noise).
    diff = np.abs(ours - theirs)
    assert diff.max() < 1e-4, f"max {diff.max()} mean {diff.mean()}"
    assert diff.mean() < 1e-5
