"""NeRF-Stereo triplet pipeline + ns_loss + PTrans."""

import numpy as np
import jax
import jax.numpy as jnp

from dkt_stereo_tpu.data.triplet import TripletFlowAugmentor
from dkt_stereo_tpu.data.ptrans import PTrans
from dkt_stereo_tpu.losses.nerf import ns_loss, photometric_loss


def test_triplet_augmentor_shapes(rng):
    H, W = 200, 300
    ims = [rng.integers(0, 255, (H, W, 3), dtype=np.uint8) for _ in range(3)]
    gt = rng.uniform(0, 50, (H, W)).astype(np.float32)
    conf = rng.uniform(0, 1, (H, W)).astype(np.float32)
    aug = TripletFlowAugmentor(crop_size=(96, 160), rng=np.random.default_rng(0))
    out = aug(*ims, gt, conf)
    for k in ("im0", "im1", "im2", "im0_aug", "im1_aug", "im2_aug"):
        assert out[k].shape == (96, 160, 3), k
    assert out["disp"].shape == (96, 160)
    assert out["conf"].shape == (96, 160)


def test_ns_loss_runs_and_masks(rng):
    N, B, H, W = 3, 1, 32, 48
    preds = jnp.asarray(-rng.uniform(0, 20, (N, B, H, W)).astype(np.float32))
    target = jnp.asarray(-rng.uniform(0, 20, (B, H, W)).astype(np.float32))
    conf = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
    ims = [jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)) for _ in range(3)]
    loss, metrics, m, ok = ns_loss(preds, target, conf, *ims)
    assert np.isfinite(float(loss)) and bool(ok)
    assert float(metrics["epe"]) >= 0
    # gradient flows to predictions
    g = jax.grad(lambda p: ns_loss(p, target, conf, *ims)[0])(preds)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0

    # confidence masking, pinned: with conf == 0 the disparity-supervision
    # term must vanish — the loss becomes invariant to the pseudo-label
    zero_conf = jnp.zeros_like(conf)
    l1 = float(ns_loss(preds, target, zero_conf, *ims)[0])
    l2 = float(ns_loss(preds, target + 7.0, zero_conf, *ims)[0])
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    # ... and with conf == 1 it must NOT be (the supervision term is live)
    one_conf = jnp.ones_like(conf)
    l3 = float(ns_loss(preds, target, one_conf, *ims)[0])
    l4 = float(ns_loss(preds, target + 7.0, one_conf, *ims)[0])
    assert abs(l3 - l4) > 1e-3, (l3, l4)


def test_ptrans_shapes(rng):
    H, W = 200, 320
    img1 = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    img2 = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    disp = rng.uniform(0, 40, (H, W)).astype(np.float32)
    pt = PTrans(num_patch=8, patch_r=16, num_view=2, cropscale=32, rng=np.random.default_rng(1))
    lp, rp, a1, a2 = pt(img1, img2, disp)
    assert lp.shape == (8, 33, 33, 3)
    assert rp.shape == (8, 33, 33, 3)
    assert a1.shape == (8, 2, 32, 32, 3)
    assert a2.shape == (8, 2, 32, 32, 3)
