"""Checkpoint interchange both directions: export_reference_pth must invert
import_reference_pth bit-exactly for every model family.

A reference torch model's ``state_dict`` is imported into flax variables and
exported back; the result must equal the original tensor-for-tensor
(dtype-exact, including ``num_batches_tracked`` counters and the BN params
the reference creates but never runs). That transitively proves the
reference's own tools (tools/evaluate_stereo.py:366-371 strict
``load_state_dict``) can consume a checkpoint fine-tuned in this framework.
"""

import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "meta_arch")), reason="reference not mounted"
)


def _roundtrip(state, template):
    from dkt_stereo_tpu.train.checkpoint import (
        export_reference_pth,
        import_reference_pth,
    )

    variables = import_reference_pth(state, template)
    out = export_reference_pth(variables, state)
    src = state["state_dict"] if "state_dict" in state else state
    dst = out["state_dict"] if "state_dict" in out else out
    assert set(dst) == set(src)
    for k in src:
        a = src[k].detach().cpu().numpy() if hasattr(src[k], "detach") else np.asarray(src[k])
        b = dst[k].detach().cpu().numpy() if hasattr(dst[k], "detach") else np.asarray(dst[k])
        assert a.dtype == b.dtype, k
        np.testing.assert_array_equal(a, b, err_msg=k)
    return out


def test_export_roundtrip_raft(rng):
    from tests.test_reference_parity import _build_torch_model

    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig

    tmodel = _build_torch_model()
    cfg = RAFTStereoConfig(mixed_precision=False)
    model = RAFTStereo(cfg, iters=2, test_mode=False)
    z = jnp.zeros((1, 64, 128, 3))
    template = model.init(jax.random.PRNGKey(0), z, z)
    _roundtrip(tmodel.state_dict(), template)


def test_export_roundtrip_raft_dataparallel_wrapper(rng):
    """DataParallel ``module.`` prefixes and the {state_dict, total_steps,
    ...} wrapper (tools/ft_dkt.py:276-278) survive the round trip."""
    from tests.test_reference_parity import _build_torch_model

    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig
    from dkt_stereo_tpu.train.checkpoint import export_reference_pth, import_reference_pth

    tmodel = _build_torch_model()
    wrapped = {
        "total_steps": 7,
        "state_dict": {f"module.{k}": v for k, v in tmodel.state_dict().items()},
    }
    cfg = RAFTStereoConfig(mixed_precision=False)
    model = RAFTStereo(cfg, iters=2, test_mode=False)
    z = jnp.zeros((1, 64, 128, 3))
    template = model.init(jax.random.PRNGKey(0), z, z)

    variables = import_reference_pth(wrapped, template)
    out = export_reference_pth(variables, wrapped)
    assert out["total_steps"] == 7
    assert set(out["state_dict"]) == set(wrapped["state_dict"])
    for k, v in wrapped["state_dict"].items():
        np.testing.assert_array_equal(
            v.detach().cpu().numpy(), out["state_dict"][k].detach().cpu().numpy(), err_msg=k
        )


def test_export_roundtrip_igev(rng):
    from tests.test_igev_parity import _Args, _load_ref_igev

    from dkt_stereo_tpu.models import IGEVStereo, IGEVStereoConfig

    TorchIGEV = _load_ref_igev()
    args = _Args(
        corr_levels=2, corr_radius=4, n_downsample=2, slow_fast_gru=False,
        n_gru_layers=3, hidden_dims=[128, 128, 128], max_disp=64,
        mixed_precision=False,
    )
    torch.manual_seed(0)
    tmodel = TorchIGEV(args)

    cfg = IGEVStereoConfig(max_disp=64, mixed_precision=False)
    model = IGEVStereo(cfg, iters=2, test_mode=False)
    z = jnp.zeros((1, 64, 128, 3))
    template = model.init(jax.random.PRNGKey(0), z, z)
    _roundtrip(tmodel.state_dict(), template)


def test_export_roundtrip_gwcnet(rng):
    # inline loader (mirrors tests/test_gwcnet.py: gwc_main's relative
    # `from .submodules import *` flattened)
    import importlib.util

    if REF not in sys.path:
        sys.path.insert(0, REF)
    pkg_dir = os.path.join(REF, "meta_arch", "gwcnet")
    if "ref_gwc_pkg" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "ref_gwc_pkg", os.path.join(pkg_dir, "submodules.py")
        )
        sub = importlib.util.module_from_spec(spec)
        sys.modules["ref_gwc_pkg"] = sub
        spec.loader.exec_module(sub)
    if "ref_gwc_main" not in sys.modules:
        spec2 = importlib.util.spec_from_file_location(
            "ref_gwc_main", os.path.join(pkg_dir, "gwc_main.py")
        )
        main = importlib.util.module_from_spec(spec2)
        src = open(os.path.join(pkg_dir, "gwc_main.py")).read().replace(
            "from .submodules import *", "from ref_gwc_pkg import *"
        )
        sys.modules["ref_gwc_main"] = main
        exec(compile(src, spec2.origin, "exec"), main.__dict__)
    TorchGWC = sys.modules["ref_gwc_main"].GWCNet

    from dkt_stereo_tpu.models import GWCNet, GWCNetConfig

    class A:
        maxdisp = 32
        use_concat_volume = True
        mixed_precision = False

    torch.manual_seed(0)
    tmodel = TorchGWC(A())

    cfg = GWCNetConfig(maxdisp=32, use_concat_volume=True, mixed_precision=False)
    model = GWCNet(cfg, test_mode=False)
    z = jnp.zeros((1, 32, 64, 3))
    template = model.init(jax.random.PRNGKey(0), z, z)
    _roundtrip(tmodel.state_dict(), template)


def test_export_roundtrip_cgi(rng):
    from tests.test_cgi_parity import _load_ref_cgi

    from dkt_stereo_tpu.models import CGIStereo, CGIStereoConfig

    class A:
        maxdisp = 64

    TorchCGI = _load_ref_cgi()
    torch.manual_seed(0)
    tmodel = TorchCGI(A())

    cfg = CGIStereoConfig(maxdisp=64, mixed_precision=False)
    model = CGIStereo(cfg, test_mode=True)
    z = jnp.zeros((1, 64, 128, 3))
    template = model.init(jax.random.PRNGKey(0), z, z)
    _roundtrip(tmodel.state_dict(), template)


def test_export_roundtrip_pcvnet(rng):
    from tests.test_pcv_parity import _Args, _load_ref_pcv

    from dkt_stereo_tpu.models import PCVNet, PCVNetConfig

    TorchPCV = _load_ref_pcv()
    args = _Args(
        corr_levels=3, corr_radius=4, n_downsample=2, context_norm="batch",
        slow_fast_gru=True, n_gru_layers=3, hidden_dims=[128, 128, 128, 128],
        gauss_num=4, sample_num=9, init_sigma=32, init_mu=[0, 64, 128, 192],
        mixed_precision=False, valid_iters=3,
    )
    torch.manual_seed(0)
    tmodel = TorchPCV(args)

    cfg = PCVNetConfig(mixed_precision=False, valid_iters=3)
    model = PCVNet(cfg, iters=3, test_mode=True)
    z = jnp.zeros((1, 64, 256, 3))
    template = model.init(jax.random.PRNGKey(0), z, z)
    _roundtrip(tmodel.state_dict(), template)


def test_export_cli_orbax_roundtrip(tmp_path, rng):
    """cli.export: Orbax checkpoint (bare variables AND full train-state
    layout) → reference .pth equal to the original state dict."""
    from tests.test_reference_parity import _build_torch_model

    from dkt_stereo_tpu.cli.export import main
    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig
    from dkt_stereo_tpu.train.checkpoint import import_reference_pth, save_checkpoint

    tmodel = _build_torch_model()
    state = tmodel.state_dict()
    tpl_pth = tmp_path / "ref.pth"
    torch.save(state, tpl_pth)

    cfg = RAFTStereoConfig(mixed_precision=False)
    model = RAFTStereo(cfg, iters=2, test_mode=False)
    z = jnp.zeros((1, 64, 128, 3))
    template = model.init(jax.random.PRNGKey(0), z, z)
    variables = import_reference_pth(state, template)

    def check(out_path):
        out = torch.load(out_path, map_location="cpu", weights_only=True)
        assert set(out) == set(state)
        for k in state:
            np.testing.assert_array_equal(
                state[k].numpy(), out[k].numpy(), err_msg=k
            )

    # bare-variables checkpoint
    ck = save_checkpoint(str(tmp_path / "bare"), variables, step=0)
    main(["--restore_ckpt", ck, "--template", str(tpl_pth),
          "--out", str(tmp_path / "bare.pth")])
    check(tmp_path / "bare.pth")

    # full train-state layout: --which selects the ema branch
    bumped = jax.tree_util.tree_map(lambda x: np.asarray(x) + 1.0, variables)
    full = {"step": 0, "params": bumped, "ema_params": variables,
            "teacher_params": bumped, "opt_state": {}}
    ck2 = save_checkpoint(str(tmp_path / "full"), full, step=1)
    main(["--restore_ckpt", ck2, "--template", str(tpl_pth),
          "--out", str(tmp_path / "ema.pth"), "--which", "ema"])
    check(tmp_path / "ema.pth")


def test_export_rejects_uncovered_leaves(rng):
    """A template whose key set doesn't span the variables tree must raise
    (two-sided strictness, mirroring the importer)."""
    from tests.test_reference_parity import _build_torch_model

    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig
    from dkt_stereo_tpu.train.checkpoint import export_reference_pth, import_reference_pth

    tmodel = _build_torch_model()
    state = tmodel.state_dict()
    cfg = RAFTStereoConfig(mixed_precision=False)
    model = RAFTStereo(cfg, iters=2, test_mode=False)
    z = jnp.zeros((1, 64, 128, 3))
    template = model.init(jax.random.PRNGKey(0), z, z)
    variables = import_reference_pth(state, template)

    truncated = {k: v for i, (k, v) in enumerate(state.items()) if i > 0}
    with pytest.raises(ValueError, match="not covered"):
        export_reference_pth(variables, truncated)
