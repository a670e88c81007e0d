"""End-to-end numerical parity vs the reference PyTorch implementation.

Loads the reference model from /root/reference (read-only oracle, skipped when
unavailable), randomly initializes it, exports its ``state_dict`` through our
``.pth`` importer, and checks both frameworks produce the same disparities on
the same input. This validates the whole chain: checkpoint mapping, NHWC
convs, norms, correlation pyramid + lookup, GRU update, convex upsampling.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "meta_arch")), reason="reference not mounted"
)


class _Args:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _load_reference_raft():
    """Import meta_arch/raft_stereo as a standalone package — the reference's
    meta_arch/__init__ is itself broken (imports nonexistent
    ``loss_gwcnet_ptrans``; CGI pulls absent ``timm``)."""
    import importlib.util

    if REF not in sys.path:
        sys.path.insert(0, REF)  # for the absolute `core.*` imports
    pkg_dir = os.path.join(REF, "meta_arch", "raft_stereo")
    name = "ref_raft_pkg"
    if name not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            name,
            os.path.join(pkg_dir, "__init__.py"),
            submodule_search_locations=[pkg_dir],
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    import importlib

    return importlib.import_module(f"{name}.raft_stereo").RAFTStereo


def _build_torch_model():
    import torch

    TorchRAFT = _load_reference_raft()

    args = _Args(
        backbone_type="default",
        corr_implementation="reg",
        shared_backbone=False,
        corr_levels=4,
        corr_radius=4,
        n_downsample=2,
        context_norm="batch",
        slow_fast_gru=False,
        n_gru_layers=3,
        hidden_dims=[128, 128, 128],
        mixed_precision=False,
    )
    torch.manual_seed(0)
    model = TorchRAFT(args)
    model.eval()
    return model


@pytest.mark.parametrize("iters", [1, 4])
def test_raft_stereo_matches_reference(iters, rng):
    import torch

    torch_model = _build_torch_model()

    import jax
    import jax.numpy as jnp

    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig
    from dkt_stereo_tpu.train.checkpoint import import_reference_pth

    cfg = RAFTStereoConfig(mixed_precision=False, corr_dtype="float32")
    B, H, W = 1, 64, 96
    img1 = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)

    model = RAFTStereo(cfg, iters=iters, test_mode=True)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(img1), jnp.asarray(img2))
    variables = import_reference_pth(torch_model.state_dict(), template)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    _, ours = model.apply(variables, jnp.asarray(img1), jnp.asarray(img2))
    ours = np.asarray(ours)  # (B, H, W)

    with torch.no_grad():
        t1 = torch.from_numpy(img1).permute(0, 3, 1, 2)
        t2 = torch.from_numpy(img2).permute(0, 3, 1, 2)
        _, theirs = torch_model(t1, t2, iters=iters, test_mode=True)
    theirs = theirs.squeeze(1).numpy()

    diff = np.abs(ours - theirs)
    assert diff.max() < 5e-2, f"max {diff.max()}, mean {diff.mean()}"
    assert diff.mean() < 5e-3


def test_train_mode_preds_match_reference(rng):
    import torch

    torch_model = _build_torch_model()
    torch_model.train()
    torch_model.freeze_bn()

    import jax
    import jax.numpy as jnp

    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig
    from dkt_stereo_tpu.train.checkpoint import import_reference_pth

    cfg = RAFTStereoConfig(mixed_precision=False, corr_dtype="float32")
    B, H, W = 1, 64, 96
    img1 = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)

    model = RAFTStereo(cfg, iters=3, test_mode=False)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(img1), jnp.asarray(img2))
    variables = import_reference_pth(torch_model.state_dict(), template)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    ours = np.asarray(model.apply(variables, jnp.asarray(img1), jnp.asarray(img2))["disp_preds"])

    with torch.no_grad():
        t1 = torch.from_numpy(img1).permute(0, 3, 1, 2)
        t2 = torch.from_numpy(img2).permute(0, 3, 1, 2)
        res = torch_model(t1, t2, iters=3, test_mode=False)
    theirs = np.stack([p.squeeze(1).numpy() for p in res["disp_preds"]])

    diff = np.abs(ours - theirs)
    assert diff.max() < 5e-2, f"max {diff.max()}"
