"""RESULTS.md oracle: reference validate_kitti vs cli.eval on identical frames.

Runs three comparisons on the verify-recipe fixture tree
(/tmp/vfx/data/KITTI, see .claude/skills/verify/SKILL.md):

  1. RAFT-Stereo — reference `tools/evaluate_stereo.py::validate_kitti`
     (CPU-patched) vs our `eval.validate_kitti`, same .pth weights.
  2. GWCNet-gc — same.
  3. PCVNet — both models' disparity maps compared under the reference's
     own metric computation (the reference's validate loop has a
     sign-convention bug for PCVNet; see RESULTS.md).

Prints one JSON line per row. Everything runs on CPU — safe while the chip
is busy. Fixture checkpoints are created on demand from the actual
reference torch models (random init; agreement is the measurement).
"""

from __future__ import annotations

import importlib
import importlib.util
import json
import os
import sys
import types

import numpy as np

REF = "/root/reference"
VFX = "/tmp/vfx"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _stub(name):
    m = types.ModuleType(name)
    m.__path__ = []
    m.__getattr__ = lambda attr: type(attr, (), {})
    sys.modules[name] = m
    return m


def _setup_reference_imports():
    import torch

    for n in (
        "skimage", "skimage.color", "skimage.io",
        "torchvision", "torchvision.transforms",
        "torchvision.transforms.functional", "torchvision.utils",
    ):
        if n not in sys.modules:
            _stub(n)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REPO)
    from tests import fake_timm

    sys.modules["timm"] = fake_timm
    if REF not in sys.path:
        sys.path.insert(0, REF)


def _load_pkg(name, init_path, search):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, init_path, submodule_search_locations=search
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _ref_eval_module():
    # meta_arch/__init__ is broken in the reference (loss_gwcnet_ptrans
    # missing); validate_* never touch the registry, only main() does.
    if "ref_eval" in sys.modules:
        return sys.modules["ref_eval"]
    ma = types.ModuleType("meta_arch")
    ma.__models__ = {}
    ma.__losses__ = {}
    sys.modules["meta_arch"] = ma
    spec = importlib.util.spec_from_file_location(
        "ref_eval", os.path.join(REF, "tools/evaluate_stereo.py")
    )
    ev = importlib.util.module_from_spec(spec)
    sys.modules["ref_eval"] = ev
    spec.loader.exec_module(ev)
    return ev


class _Args:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _ref_raft(pth):
    import torch

    pkg = os.path.join(REF, "meta_arch", "raft_stereo")
    _load_pkg("ref_raft_pkg", os.path.join(pkg, "__init__.py"), [pkg])
    cls = importlib.import_module("ref_raft_pkg.raft_stereo").RAFTStereo
    a = _Args(backbone_type="default", corr_implementation="reg",
              shared_backbone=False, corr_levels=4, corr_radius=4,
              n_downsample=2, context_norm="batch", slow_fast_gru=False,
              n_gru_layers=3, hidden_dims=[128, 128, 128],
              mixed_precision=False)
    if not os.path.exists(pth):
        torch.manual_seed(7)
        m = cls(a)
        torch.save({"state_dict": {f"module.{k}": v for k, v in m.state_dict().items()}}, pth)
    m = cls(a)
    sd = torch.load(pth, map_location="cpu")["state_dict"]
    m.load_state_dict({k[len("module."):]: v for k, v in sd.items()})
    return m.eval()


def _ref_gwc(pth):
    import torch

    pkg = os.path.join(REF, "meta_arch", "gwcnet")
    if "ref_gwc_main" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "ref_gwc_pkg", os.path.join(pkg, "submodules.py"))
        sub = importlib.util.module_from_spec(spec)
        sys.modules["ref_gwc_pkg"] = sub
        spec.loader.exec_module(sub)
        main = types.ModuleType("ref_gwc_main")
        src = open(os.path.join(pkg, "gwc_main.py")).read().replace(
            "from .submodules import *", "from ref_gwc_pkg import *")
        sys.modules["ref_gwc_main"] = main
        exec(compile(src, os.path.join(pkg, "gwc_main.py"), "exec"), main.__dict__)
    cls = sys.modules["ref_gwc_main"].GWCNet
    a = _Args(maxdisp=192, use_concat_volume=True, mixed_precision=False)
    if not os.path.exists(pth):
        torch.manual_seed(11)
        m = cls(a)
        torch.save({"state_dict": {f"module.{k}": v for k, v in m.state_dict().items()}}, pth)
    m = cls(a)
    sd = torch.load(pth, map_location="cpu")["state_dict"]
    m.load_state_dict({k[len("module."):]: v for k, v in sd.items()})
    return m.eval()


def _ref_igev(pth):
    import torch

    pkg = os.path.join(REF, "meta_arch", "igev_stereo")
    _load_pkg("ref_igev_pkg", os.path.join(pkg, "__init__.py"), [pkg])
    cls = importlib.import_module("ref_igev_pkg.igev_stereo").IGEVStereo
    a = _Args(corr_levels=2, corr_radius=4, n_downsample=2,
              slow_fast_gru=False, n_gru_layers=3, hidden_dims=[128, 128, 128],
              max_disp=192, mixed_precision=False)
    if not os.path.exists(pth):
        torch.manual_seed(3)
        m = cls(a)
        torch.save({"state_dict": {f"module.{k}": v for k, v in m.state_dict().items()}}, pth)
    m = cls(a)
    sd = torch.load(pth, map_location="cpu")
    sd = sd.get("state_dict", sd)
    m.load_state_dict({k.removeprefix("module."): v for k, v in sd.items()})
    return m.eval()


def _ref_cgi(pth):
    import torch

    pkg = os.path.join(REF, "meta_arch", "cgi")
    _load_pkg("ref_cgi_pkg", os.path.join(pkg, "__init__.py"), [pkg])
    cls = importlib.import_module("ref_cgi_pkg.CGI_Stereo").CGI_Stereo
    a = _Args(maxdisp=192, mixed_precision=False)
    if not os.path.exists(pth):
        torch.manual_seed(5)
        m = cls(a)
        torch.save({"state_dict": {f"module.{k}": v for k, v in m.state_dict().items()}}, pth)
    m = cls(a)
    sd = torch.load(pth, map_location="cpu")["state_dict"]
    m.load_state_dict({k[len("module."):]: v for k, v in sd.items()})
    return m.eval()


def _ref_pcv(pth, valid_iters):
    import torch

    pkg = os.path.join(REF, "meta_arch", "pcvnet")
    _load_pkg("ref_pcv_pkg", os.path.join(pkg, "__init__.py"), [pkg])
    cls = importlib.import_module("ref_pcv_pkg.model").PCVNet
    a = _Args(corr_levels=3, corr_radius=4, n_downsample=2,
              context_norm="batch", slow_fast_gru=True, n_gru_layers=3,
              hidden_dims=[128, 128, 128, 128], gauss_num=4, sample_num=9,
              init_sigma=32, init_mu=[0, 64, 128, 192],
              mixed_precision=False, valid_iters=valid_iters)
    if not os.path.exists(pth):
        torch.manual_seed(1)
        m = cls(a)
        torch.save({"state_dict": {f"module.{k}": v for k, v in m.state_dict().items()}}, pth)
    m = cls(a)
    sd = torch.load(pth, map_location="cpu")["state_dict"]
    m.load_state_dict({k[len("module."):]: v for k, v in sd.items()})
    return m.eval()


def _ours_eval(config_path, pth, iters):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dkt_stereo_tpu.cli.config import load_model_config
    from dkt_stereo_tpu.eval import make_forward_fn
    from dkt_stereo_tpu.eval.validate import validate_kitti
    from dkt_stereo_tpu.models import get_model
    from dkt_stereo_tpu.train.checkpoint import import_reference_pth

    config = load_model_config(os.path.join(REPO, config_path))
    model_cls, cfg_cls, _ = get_model(config["model"])
    cfg = dataclasses.replace(cfg_cls.from_dict(config), mixed_precision=False)
    train_model = model_cls(cfg, iters=iters, test_mode=False)
    dummy = jnp.zeros((1, 64, 64, 3))
    template = train_model.init(jax.random.PRNGKey(0), dummy, dummy)
    params = jax.tree_util.tree_map(
        jnp.asarray, import_reference_pth(pth, template))
    fwd = make_forward_fn(model_cls, cfg, params, iters=iters)
    return validate_kitti(fwd, "2015", f"{VFX}/data/KITTI", divide_factor=32)


def _pcv_ref_metric(tmodel, jmodel_fn):
    """Both disparity maps under the reference's (sign-bugged) metric."""
    import cv2
    import torch
    from PIL import Image

    root = f"{VFX}/data/KITTI/KITTI_2015/training"
    py0, px0 = 4, 8  # sintel pad 120x240 -> 128x256

    def pad(im):
        return np.pad(im, ((py0, 4), (px0, 8), (0, 0)), mode="edge")

    epes_t, epes_j, maxd = [], [], 0.0
    for i in range(3):
        img1 = np.asarray(Image.open(f"{root}/image_2/{i:06d}_10.png")).astype(np.float32)
        img2 = np.asarray(Image.open(f"{root}/image_3/{i:06d}_10.png")).astype(np.float32)
        disp = cv2.imread(f"{root}/disp_occ_0/{i:06d}_10.png", cv2.IMREAD_ANYDEPTH).astype(np.float32) / 256.0
        flow_gt = -disp
        val = (disp > 0) & (flow_gt > -192) & (flow_gt < 0)
        p1, p2 = pad(img1)[None], pad(img2)[None]
        with torch.no_grad():
            t1 = torch.from_numpy(p1).permute(0, 3, 1, 2)
            t2 = torch.from_numpy(p2).permute(0, 3, 1, 2)
            _, theirs = tmodel(t1, t2, iters=4, test_mode=True)
        theirs = theirs.squeeze(0).squeeze(0).numpy()[py0:py0 + 120, px0:px0 + 240]
        ours = jmodel_fn(p1, p2)[py0:py0 + 120, px0:px0 + 240]
        maxd = max(maxd, float(np.abs(ours - -theirs).max()))  # ours is negative-convention
        # the reference's computation: |pred - flow_gt| with pred POSITIVE
        epes_t.append(np.abs(theirs - flow_gt)[val].mean())
        epes_j.append(np.abs(-ours - flow_gt)[val].mean())
    return float(np.mean(epes_t)), float(np.mean(epes_j)), maxd


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    _setup_reference_imports()
    ev = _ref_eval_module()
    os.makedirs(VFX, exist_ok=True)
    os.chdir(VFX)  # reference datasets.KITTI uses the relative root 'data/KITTI'

    rows = []

    m = _ref_raft(f"{VFX}/ref_random.pth")
    with torch.no_grad():
        ref = ev.validate_kitti(m, iters=8, split="2015", divide_factor=32)
    ours = _ours_eval("configs/raft_stereo/base.json", f"{VFX}/ref_random.pth", 8)
    rows.append({"model": "raft_stereo", "ref": ref, "ours": ours})
    print(json.dumps(rows[-1]), flush=True)

    m = _ref_gwc(f"{VFX}/gwc_random.pth")
    with torch.no_grad():
        ref = ev.validate_kitti(m, iters=4, split="2015", divide_factor=32)
    ours = _ours_eval("configs/gwcnet/base_gc.json", f"{VFX}/gwc_random.pth", 4)
    rows.append({"model": "gwcnet", "ref": ref, "ours": ours})
    print(json.dumps(rows[-1]), flush=True)

    # IGEV/CGI: MobileNetV2 trunk from tests/fake_timm (the reference's timm
    # import faked identically on both sides; trunk weights travel in the
    # .pth so the comparison is still identical-weights).
    m = _ref_igev(f"{VFX}/igev_random.pth")
    with torch.no_grad():
        ref = ev.validate_kitti(m, iters=8, split="2015", divide_factor=32)
    ours = _ours_eval("configs/igev_stereo/base.json", f"{VFX}/igev_random.pth", 8)
    rows.append({"model": "igev_stereo", "ref": ref, "ours": ours})
    print(json.dumps(rows[-1]), flush=True)

    m = _ref_cgi(f"{VFX}/cgi_random.pth")
    with torch.no_grad():
        ref = ev.validate_kitti(m, iters=4, split="2015", divide_factor=32)
    ours = _ours_eval("configs/cgi/base.json", f"{VFX}/cgi_random.pth", 4)
    rows.append({"model": "cgi_stereo", "ref": ref, "ours": ours})
    print(json.dumps(rows[-1]), flush=True)

    # PCVNet: compare the MAPS under the reference's metric (its validate
    # loop is sign-bugged for this model; RESULTS.md explains).
    import dataclasses

    import jax.numpy as jnp

    from dkt_stereo_tpu.models import PCVNet, PCVNetConfig
    from dkt_stereo_tpu.train.checkpoint import import_reference_pth

    tmodel = _ref_pcv(f"{VFX}/pcv_random.pth", valid_iters=4)
    cfg = PCVNetConfig(mixed_precision=False, valid_iters=4)
    jmodel = PCVNet(cfg, iters=4, test_mode=True)
    state = {}

    def jfn(p1, p2):
        if "vars" not in state:
            template = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(p1), jnp.asarray(p2))
            sd = torch.load(f"{VFX}/pcv_random.pth", map_location="cpu")["state_dict"]
            sd = {k[len("module."):]: v for k, v in sd.items()}
            state["vars"] = jax.tree_util.tree_map(
                jnp.asarray, import_reference_pth(sd, template))
        _, out = jmodel.apply(state["vars"], jnp.asarray(p1), jnp.asarray(p2))
        return np.asarray(out)[0]

    epe_t, epe_j, maxd = _pcv_ref_metric(tmodel, jfn)
    rows.append({"model": "pcvnet", "ref_metric_ref": epe_t,
                 "ref_metric_ours": epe_j, "map_max_abs_px": maxd})
    print(json.dumps(rows[-1]), flush=True)
    return rows


if __name__ == "__main__":
    main()
