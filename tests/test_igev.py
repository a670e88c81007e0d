"""IGEV-Stereo: geometry lookup goldens, model shapes/grads, reference parity."""

import os
import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dkt_stereo_tpu.models import IGEVStereo, IGEVStereoConfig
from dkt_stereo_tpu.ops.geometry import CombinedGeoEncodingVolume

CFG = IGEVStereoConfig(max_disp=32, mixed_precision=False)
B, H, W = 1, 32, 64


def torch_geo_lookup(fmap1, fmap2, geo_volume, disp, coords, num_levels=2, radius=4):
    """geometry.py:6-58 recomputed in torch as golden."""
    Bt, Dc, Ht, Wt = fmap1.shape
    corr = torch.einsum("aijk,aijh->ajkh", fmap1, fmap2).reshape(Bt, Ht, Wt, 1, Wt)
    init_corr = corr.reshape(Bt * Ht * Wt, 1, 1, Wt)
    b, c, d, h, w = geo_volume.shape
    geo = geo_volume.permute(0, 3, 4, 1, 2).reshape(b * h * w, c, 1, d)
    geo_pyr, corr_pyr = [geo], [init_corr]
    for _ in range(num_levels - 1):
        geo = F.avg_pool2d(geo, [1, 2], stride=[1, 2])
        geo_pyr.append(geo)
    for _ in range(num_levels - 1):
        init_corr = F.avg_pool2d(init_corr, [1, 2], stride=[1, 2])
        corr_pyr.append(init_corr)

    r = radius
    out = []
    for i in range(num_levels):
        g = geo_pyr[i]
        dx = torch.linspace(-r, r, 2 * r + 1).view(1, 1, 2 * r + 1, 1)
        x0 = dx + disp.reshape(b * h * w, 1, 1, 1) / 2**i
        S = g.shape[-1]
        xg = 2 * x0 / (S - 1) - 1
        grid = torch.cat([xg, torch.zeros_like(x0)], dim=-1)
        gs = F.grid_sample(g, grid, align_corners=True).view(b, h, w, -1)
        out.append(gs)

        ic = corr_pyr[i]
        x0c = coords.reshape(b * h * w, 1, 1, 1) / 2**i - disp.reshape(b * h * w, 1, 1, 1) / 2**i + dx
        S = ic.shape[-1]
        xg = 2 * x0c / (S - 1) - 1
        grid = torch.cat([xg, torch.zeros_like(x0c)], dim=-1)
        cs = F.grid_sample(ic, grid, align_corners=True).view(b, h, w, -1)
        out.append(cs)
    return torch.cat(out, dim=-1)  # (b,h,w,K)


def test_geo_lookup_matches_reference(rng):
    b, h, w, dd, c = 1, 4, 16, 8, 8
    f1 = rng.standard_normal((b, h, w, 16)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, 16)).astype(np.float32)
    geo = rng.standard_normal((b, dd, h, w, c)).astype(np.float32)
    disp = rng.uniform(0, dd, (b, h, w, 1)).astype(np.float32)
    coords = np.broadcast_to(np.arange(w, dtype=np.float32)[None, None, :, None], (b, h, w, 1)).copy()

    fn = CombinedGeoEncodingVolume(jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(geo))
    ours = np.asarray(fn(jnp.asarray(disp), jnp.asarray(coords)))

    theirs = torch_geo_lookup(
        torch.from_numpy(f1).permute(0, 3, 1, 2),
        torch.from_numpy(f2).permute(0, 3, 1, 2),
        torch.from_numpy(geo).permute(0, 4, 1, 2, 3),
        torch.from_numpy(disp[..., 0]).unsqueeze(1),
        torch.from_numpy(coords[..., 0]).unsqueeze(1),
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(5)
    return (
        jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
    )


def test_igev_forward_shapes(images):
    img1, img2 = images
    model = IGEVStereo(CFG, iters=2, test_mode=False)
    params = model.init(jax.random.PRNGKey(0), img1, img2)
    out = model.apply(params, img1, img2)
    assert out["disp_preds"].shape == (2, B, H, W)
    assert out["init_disp"].shape == (B, H, W)
    assert np.isfinite(np.asarray(out["disp_preds"])).all()

    test_model = IGEVStereo(CFG, iters=2, test_mode=True)
    _, disp = test_model.apply(params, img1, img2)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(out["disp_preds"][-1]), atol=1e-4)


def test_igev_grads_flow_but_not_into_frozen_trunk(images):
    img1, img2 = images
    model = IGEVStereo(CFG, iters=1, test_mode=False)
    params = model.init(jax.random.PRNGKey(0), img1, img2)

    def f(p):
        out = model.apply(p, img1, img2)
        return jnp.abs(out["disp_preds"]).mean()

    grads = jax.grad(f)(params)
    gp = grads["params"]
    trunk = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(gp["feature"]))
    update = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(gp["step"]))
    cnet = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(gp["cnet"]))
    assert trunk == 0.0  # frozen backbone (torch.no_grad parity)
    assert update > 0 and cnet > 0
    assert all(np.isfinite(float(jnp.abs(g).sum())) for g in jax.tree_util.tree_leaves(gp))


def test_igev_loss_trains_init_branch(images):
    """The IGEV loss's init_disp term is the ONLY gradient path into the 3D
    classifier / cost-aggregation / init-spx branch (every scan iteration
    stop-grads the incoming disparity); the plain RAFT sequence loss leaves
    those params at exactly zero gradient — the regression this pins."""
    from dkt_stereo_tpu.losses.sequence import sequence_loss_igev, sequence_loss_raft
    from dkt_stereo_tpu.models.registry import make_loss_adapter

    img1, img2 = images
    model = IGEVStereo(CFG, iters=1, test_mode=False)
    params = model.init(jax.random.PRNGKey(0), img1, img2)
    rng = np.random.default_rng(0)
    gt = jnp.asarray(-rng.uniform(1, 20, (B, H, W)).astype(np.float32))
    valid = jnp.ones((B, H, W), jnp.float32)
    adapter = make_loss_adapter("IGEVStereo", CFG)

    def total(tree):
        return sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(tree))

    def f_igev(p):
        out = model.apply(p, img1, img2)
        return adapter(out, gt, valid)[0]

    def f_raft(p):
        out = model.apply(p, img1, img2)
        return sequence_loss_raft(out["disp_preds"], gt, valid)[0]

    g = jax.grad(f_igev)(params)["params"]
    assert total(g["classifier"]) > 0
    assert total(g["spx_4_0"]) > 0
    assert total(g["cost_agg"]) > 0

    g0 = jax.grad(f_raft)(params)["params"]
    assert total(g0["classifier"]) == 0.0
    assert total(g0["spx_4_0"]) == 0.0

    # direct loss sanity: ok flips on non-finite init
    loss, metrics, m, ok = sequence_loss_igev(
        -jnp.ones((2, B, H, W)), jnp.full((B, H, W), jnp.nan), gt, valid
    )
    assert not bool(ok) and float(loss) == 0.0
