"""CGI-Stereo end-to-end numerical parity vs the reference (timm faked)."""

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


def _load_ref_cgi():
    import importlib
    import importlib.util

    from tests import fake_timm

    sys.modules["timm"] = fake_timm
    if REF not in sys.path:
        sys.path.insert(0, REF)
    pkg_dir = os.path.join(REF, "meta_arch", "cgi")
    name = "ref_cgi_pkg"
    if name not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(pkg_dir, "__init__.py"),
            submodule_search_locations=[pkg_dir],
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    return importlib.import_module(f"{name}.CGI_Stereo").CGI_Stereo


class _Args:
    maxdisp = 64


def test_cgi_matches_reference(rng):
    TorchCGI = _load_ref_cgi()
    torch.manual_seed(0)
    tmodel = TorchCGI(_Args())
    tmodel.eval()

    from dkt_stereo_tpu.models import CGIStereo, CGIStereoConfig
    from dkt_stereo_tpu.train.checkpoint import import_reference_pth

    cfg = CGIStereoConfig(maxdisp=64, mixed_precision=False)
    B, H, W = 1, 64, 128
    img1 = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)

    model = CGIStereo(cfg, test_mode=True)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(img1), jnp.asarray(img2))
    variables = import_reference_pth(tmodel.state_dict(), template)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    _, ours = model.apply(variables, jnp.asarray(img1), jnp.asarray(img2))
    ours = np.asarray(ours)

    with torch.no_grad():
        t1 = torch.from_numpy(img1).permute(0, 3, 1, 2)
        t2 = torch.from_numpy(img2).permute(0, 3, 1, 2)
        _, theirs = tmodel(t1, t2, test_mode=True)
    theirs = theirs.squeeze(1).numpy()

    diff = np.abs(ours - theirs)
    # CGI regresses over only the top-2 cost entries (regression_topk); with
    # random weights the cost surface is nearly flat, so torch ``sort`` and
    # ``lax.top_k`` break near-ties differently at a small fraction of pixels
    # (~1.8% here), shifting the selected disparity pair by one bin. The rest
    # match exactly: assert distributional parity.
    assert np.percentile(diff, 90) < 1e-4, f"p90 {np.percentile(diff, 90)}"
    assert (diff > 0.05).mean() < 0.05, f"frac {float((diff > 0.05).mean())}"
    assert diff.max() < 1.5 * 4 / 4, f"max {diff.max()}"  # ≤ one bin at output scale
