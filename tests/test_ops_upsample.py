"""Golden tests: convex upsampling / context upsample vs torch reference math."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from dkt_stereo_tpu.ops import convex_upsample, context_upsample


def torch_upsample_flow(flow, mask, factor):
    """meta_arch/raft_stereo/raft_stereo.py:70-82 recomputed."""
    N, D, H, W = flow.shape
    mask = mask.view(N, 1, 9, factor, factor, H, W)
    mask = torch.softmax(mask, dim=2)
    up_flow = F.unfold(factor * flow, [3, 3], padding=1)
    up_flow = up_flow.view(N, D, 9, 1, 1, H, W)
    up_flow = torch.sum(mask * up_flow, dim=2)
    up_flow = up_flow.permute(0, 1, 4, 2, 5, 3)
    return up_flow.reshape(N, D, factor * H, factor * W)


def test_convex_upsample_matches_torch(rng):
    for factor in (4, 8):
        B, H, W, D = 2, 5, 7, 2
        flow = rng.standard_normal((B, H, W, D)).astype(np.float32)
        mask = rng.standard_normal((B, H, W, 9 * factor * factor)).astype(np.float32)

        ours = np.asarray(convex_upsample(jnp.asarray(flow), jnp.asarray(mask), factor))

        t_flow = torch.from_numpy(flow).permute(0, 3, 1, 2)
        t_mask = torch.from_numpy(mask).permute(0, 3, 1, 2)
        theirs = torch_upsample_flow(t_flow, t_mask, factor).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_context_upsample_matches_torch(rng):
    B, H, W = 1, 4, 6
    disp = rng.standard_normal((B, H, W, 1)).astype(np.float32)
    w9 = rng.uniform(0, 1, (B, 4 * H, 4 * W, 9)).astype(np.float32)

    ours = np.asarray(context_upsample(jnp.asarray(disp), jnp.asarray(w9)))

    t_disp = torch.from_numpy(disp).permute(0, 3, 1, 2)
    t_w = torch.from_numpy(w9).permute(0, 3, 1, 2)
    unfold = F.unfold(t_disp, 3, 1, 1).reshape(B, -1, H, W)
    unfold = F.interpolate(unfold, (H * 4, W * 4), mode="nearest").reshape(B, 9, H * 4, W * 4)
    theirs = (unfold * t_w).sum(1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_gauss_blur_matches_torch(rng):
    from dkt_stereo_tpu.ops.misc import gauss_blur

    B, H, W, C = 1, 9, 11, 3
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    ours = np.asarray(gauss_blur(jnp.asarray(x), N=5, std=1.0))

    # reference semantics (core/utils/utils.py:87-94): per-channel 2D gaussian
    # conv, window normalized by clamped sum, 'same' zero padding
    g1 = np.arange(5, dtype=np.float64) - 2
    gx, gy = np.meshgrid(g1, g1, indexing="ij")
    w = np.exp(-(gx**2 + gy**2) / 2.0)
    w = (w / max(w.sum(), 1e-4)).astype(np.float32)
    t_x = torch.from_numpy(x).permute(0, 3, 1, 2)
    t_w = torch.from_numpy(w)[None, None].repeat(C, 1, 1, 1)
    theirs = F.conv2d(t_x, t_w, padding=2, groups=C).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
    # blur preserves the mean away from borders
    np.testing.assert_allclose(ours[:, 4, 5].mean(), x[:, 2:7, 3:8].mean(), atol=0.5)


def test_forward_interpolate_roundtrip():
    from dkt_stereo_tpu.ops.misc import forward_interpolate

    H, W = 8, 10
    flow = np.zeros((2, H, W), np.float32)
    flow[0] = 2.0  # uniform shift right
    out = forward_interpolate(flow)
    assert out.shape == (2, H, W)
    # splatting a uniform flow then nearest-filling reproduces it everywhere
    np.testing.assert_allclose(out[0], 2.0, atol=1e-5)
    np.testing.assert_allclose(out[1], 0.0, atol=1e-5)
