"""GWCNet: 3D conv primitives vs torch, model shapes, reference parity."""

import os
import sys

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dkt_stereo_tpu.models import GWCNet, GWCNetConfig
from dkt_stereo_tpu.losses.gwc import loss_gwcnet
from dkt_stereo_tpu.nn.conv3d import ConvTranspose3DTorch
from dkt_stereo_tpu.ops.resize import interp_bilinear_halfpix, interp_trilinear_halfpix


def test_conv_transpose3d_matches_torch(rng):
    Ci, Co, D, H, W = 4, 6, 3, 5, 7
    x = rng.standard_normal((1, D, H, W, Ci)).astype(np.float32)
    m = ConvTranspose3DTorch(Co, 3, 2, 1, 1, use_bias=False)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(m.apply(params, jnp.asarray(x)))

    tm = tnn.ConvTranspose3d(Ci, Co, 3, stride=2, padding=1, output_padding=1, bias=False)
    # our param layout (k,k,k,O,I) = torch (I,O,k,k,k).transpose(2,3,4,1,0)
    w = np.asarray(params["params"]["kernel"])  # (k,k,k,O,I)
    with torch.no_grad():
        tm.weight.copy_(torch.from_numpy(w.transpose(4, 3, 0, 1, 2)))
        theirs = tm(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
    theirs = theirs.permute(0, 2, 3, 4, 1).numpy()
    assert ours.shape == theirs.shape == (1, 2 * D, 2 * H, 2 * W, Co)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_trilinear_halfpix_matches_torch(rng):
    x = rng.standard_normal((1, 4, 5, 6, 1)).astype(np.float32)
    ours = np.asarray(interp_trilinear_halfpix(jnp.asarray(x), (16, 20, 24)))
    t = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    theirs = F.interpolate(t, scale_factor=4, mode="trilinear", align_corners=False)
    theirs = theirs.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_bilinear_halfpix_matches_torch(rng):
    x = rng.standard_normal((1, 6, 9, 3)).astype(np.float32)
    ours = np.asarray(interp_bilinear_halfpix(jnp.asarray(x), (13, 17)))
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    theirs = F.interpolate(t, (13, 17), mode="bilinear", align_corners=False)
    np.testing.assert_allclose(ours, theirs.permute(0, 2, 3, 1).numpy(), atol=1e-5)


CFG = GWCNetConfig(maxdisp=32, mixed_precision=False)


def test_gwcnet_forward_shapes(rng):
    B, H, W = 1, 32, 64
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    model = GWCNet(CFG, test_mode=False)
    params = model.init(jax.random.PRNGKey(0), img1, img2)
    out = model.apply(params, img1, img2)
    assert out["disp_preds"].shape == (4, B, H, W)
    assert (np.asarray(out["disp_preds"]) <= 0).all()  # negated soft-argmin

    test_model = GWCNet(CFG, test_mode=True)
    _, disp = test_model.apply(params, img1, img2)
    np.testing.assert_allclose(
        np.asarray(disp), np.asarray(out["disp_preds"][-1]), atol=1e-5
    )


def test_gwcnet_loss_and_grads(rng):
    # train_bn=True: the reference runs GWCNet BN in train mode (its
    # freeze_bn is a no-op) — with frozen unit-variance stats at random init
    # the 22-block trunk saturates the softmax and gradients vanish.
    cfg = GWCNetConfig(maxdisp=32, mixed_precision=False, train_bn=True)
    B, H, W = 1, 32, 32
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    model = GWCNet(cfg, test_mode=False)
    variables = model.init(jax.random.PRNGKey(0), img1, img2)
    gt = jnp.asarray(-rng.uniform(1, 20, (B, H, W)).astype(np.float32))
    valid = jnp.ones((B, H, W))

    def f(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            img1, img2, mutable=["batch_stats"],
        )
        loss, metrics, m, ok = loss_gwcnet(out["disp_preds"], gt, valid, cfg.maxdisp)
        return loss, ok

    (loss, ok), grads = jax.value_and_grad(f, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss)) and bool(ok)
    gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gsum) and gsum > 0


REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "meta_arch")), reason="no reference")
@pytest.mark.parametrize("use_concat", [False, True])
def test_gwcnet_matches_reference(use_concat, rng):
    import importlib
    import importlib.util

    if REF not in sys.path:
        sys.path.insert(0, REF)
    pkg_dir = os.path.join(REF, "meta_arch", "gwcnet")
    name = "ref_gwc_pkg"
    if name not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(pkg_dir, "submodules.py")
        )
        sub = importlib.util.module_from_spec(spec)
        sys.modules[name] = sub
        spec.loader.exec_module(sub)
        # gwc_main does `from .submodules import *`; emulate flat import
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

    class A:
        maxdisp = 32
        use_concat_volume = use_concat
        mixed_precision = False

    torch.manual_seed(0)
    tmodel = TorchGWC(A())
    tmodel.eval()

    from dkt_stereo_tpu.train.checkpoint import import_reference_pth

    cfg = GWCNetConfig(maxdisp=32, use_concat_volume=use_concat, mixed_precision=False)
    B, H, W = 1, 32, 64
    img1 = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    # init via the train-mode model so all 4 classifier heads exist in the
    # template (the reference state dict always contains them)
    train_model = GWCNet(cfg, test_mode=False)
    template = train_model.init(jax.random.PRNGKey(0), jnp.asarray(img1), jnp.asarray(img2))
    variables = import_reference_pth(tmodel.state_dict(), template)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    model = GWCNet(cfg, test_mode=True)
    _, ours = model.apply(variables, jnp.asarray(img1), jnp.asarray(img2))

    with torch.no_grad():
        t1 = torch.from_numpy(img1).permute(0, 3, 1, 2)
        t2 = torch.from_numpy(img2).permute(0, 3, 1, 2)
        _, theirs = tmodel(t1, t2, test_mode=True)
    theirs = theirs.squeeze(1).numpy()
    diff = np.abs(np.asarray(ours) - theirs)
    assert diff.max() < 5e-2, f"max {diff.max()} mean {diff.mean()}"


def test_gwcnet_ptrans_head(rng):
    cfg = GWCNetConfig(maxdisp=32, mixed_precision=False, ptrans=True)
    B, H, W = 1, 32, 32
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    augp1 = jnp.asarray(rng.uniform(0, 255, (B, 2, 2, 32, 32, 3)).astype(np.float32))
    augp2 = jnp.asarray(rng.uniform(0, 255, (B, 2, 2, 32, 32, 3)).astype(np.float32))
    model = GWCNet(cfg, test_mode=False)
    params = model.init(jax.random.PRNGKey(0), img1, img2, None, augp1, augp2)
    out = model.apply(params, img1, img2, None, augp1, augp2)
    assert out["z_ps"].shape == (B, 2, 4, 256)
    norms = np.linalg.norm(np.asarray(out["z_ps"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
