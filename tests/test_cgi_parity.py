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
    (_, ours), inter = model.apply(
        variables, jnp.asarray(img1), jnp.asarray(img2), mutable=["intermediates"]
    )
    ours = np.asarray(ours)
    our_cost = np.asarray(inter["intermediates"]["cost_volume"][0])  # (B,H4,W4,D4)

    ref_cost = {}
    tmodel.hourglass_fusion.register_forward_hook(
        lambda m, i, o: ref_cost.__setitem__("v", o.detach())
    )
    with torch.no_grad():
        t1 = torch.from_numpy(img1).permute(0, 3, 1, 2)
        t2 = torch.from_numpy(img2).permute(0, 3, 1, 2)
        _, theirs = tmodel(t1, t2, test_mode=True)
    theirs = theirs.squeeze(1).numpy()
    # (B,1,D4,H4,W4) -> (B,H4,W4,D4)
    t_cost = ref_cost["v"].squeeze(1).permute(0, 2, 3, 1).numpy()

    # 1. HARD bound on the pre-regression cost volume: everything up to the
    #    top-2 selection matches tightly (CGI_Stereo.py:249).
    cd = np.abs(our_cost - t_cost)
    assert cd.max() < 5e-4, f"cost max-abs {cd.max()}"

    # 2. Downstream of the cost, the only nondeterminism is WHICH two bins
    #    win lax.top_k vs torch.sort when costs tie within fp noise — and a
    #    random-init cost surface ties nearly everywhere (top-2 margins
    #    < 1e-3 at 100% of pixels here), an fp-accumulation-order artifact
    #    that no tolerance can exclude pixel-wise. The downstream ops are
    #    pinned by their own torch goldens instead: regression_topk
    #    (tests/test_ops_corr.py::test_disparity_regression_and_topk, 1e-5)
    #    and context_upsample (tests/test_ops_upsample.py). A tie flip moves
    #    the selected pair by at most one 4px bin:
    diff = np.abs(ours - theirs)[0]
    assert diff.max() < 4.0 + 1e-3, f"max {diff.max()}"
    assert np.percentile(diff, 90) < 1e-4, f"p90 {np.percentile(diff, 90)}"
