"""Golden tests: sampling ops vs torch grid_sample / interpolate semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from dkt_stereo_tpu.ops import (
    bilinear_sampler,
    interp_bilinear_align,
    pad_input,
    pool2x,
    sample_row_1d,
    unpad_input,
    upflow,
)
from dkt_stereo_tpu.ops.warp import disp_warp, grid_sample_2d, ssim


def torch_grid_sample_pixel(img_nchw, coords_xy, align=True):
    """Reference path: pixel coords -> normalized -> grid_sample (zeros pad)."""
    H, W = img_nchw.shape[-2:]
    x = coords_xy[..., 0]
    y = coords_xy[..., 1]
    xg = 2 * x / (W - 1) - 1
    yg = 2 * y / (H - 1) - 1 if H > 1 else y
    grid = torch.stack([xg, yg], dim=-1)
    return F.grid_sample(img_nchw, grid, align_corners=align)


def test_bilinear_sampler_matches_torch(rng):
    B, H, W, C = 2, 13, 17, 5
    img = rng.standard_normal((B, H, W, C)).astype(np.float32)
    # coords including out-of-bounds and exact-integer positions
    coords = np.stack(
        [
            rng.uniform(-3, W + 2, (B, 7, 11)),
            rng.uniform(-3, H + 2, (B, 7, 11)),
        ],
        axis=-1,
    ).astype(np.float32)
    coords[0, 0, 0] = [4.0, 5.0]

    ours = np.asarray(bilinear_sampler(jnp.asarray(img), jnp.asarray(coords)))

    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_out = torch_grid_sample_pixel(t_img, torch.from_numpy(coords))
    theirs = t_out.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_sample_row_1d_matches_grid_sample(rng):
    # the 1-row volume case of core/corr.py:134-141
    N, S, K = 6, 40, 9
    rows = rng.standard_normal((N, S)).astype(np.float32)
    x = rng.uniform(-5, S + 4, (N, K)).astype(np.float32)

    ours = np.asarray(sample_row_1d(jnp.asarray(rows), jnp.asarray(x)))

    img = torch.from_numpy(rows).view(N, 1, 1, S)
    coords = torch.stack(
        [torch.from_numpy(x).view(N, K, 1), torch.zeros(N, K, 1)], dim=-1
    )
    xg = 2 * coords[..., 0] / (S - 1) - 1
    grid = torch.stack([xg, coords[..., 1]], dim=-1)
    theirs = F.grid_sample(img, grid, align_corners=True).view(N, K).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_interp_align_matches_torch(rng):
    x = rng.standard_normal((2, 10, 14, 3)).astype(np.float32)
    ours = np.asarray(interp_bilinear_align(jnp.asarray(x), (23, 9)))
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    theirs = (
        F.interpolate(t, (23, 9), mode="bilinear", align_corners=True)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_upflow_matches_torch(rng):
    flow = rng.standard_normal((2, 6, 8, 2)).astype(np.float32)
    ours = np.asarray(upflow(jnp.asarray(flow), 8))
    t = torch.from_numpy(flow).permute(0, 3, 1, 2)
    theirs = (
        (8 * F.interpolate(t, (48, 64), mode="bilinear", align_corners=True))
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_pool2x_matches_torch(rng):
    x = rng.standard_normal((2, 11, 15, 4)).astype(np.float32)
    ours = np.asarray(pool2x(jnp.asarray(x)))
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    theirs = F.avg_pool2d(t, 3, stride=2, padding=1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("mode", ["sintel", "kitti"])
def test_pad_unpad_roundtrip(rng, mode):
    x = rng.standard_normal((1, 375, 1242, 3)).astype(np.float32)
    padded, spec = pad_input(jnp.asarray(x), divis_by=32, mode=mode)
    assert padded.shape[1] % 32 == 0 and padded.shape[2] % 32 == 0
    back = np.asarray(unpad_input(padded, spec))
    np.testing.assert_array_equal(back, x)
    # replicate-pad parity with torch F.pad
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    (pt, pb), (pl, pr) = spec
    theirs = F.pad(t, [pl, pr, pt, pb], mode="replicate").permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(np.asarray(padded), theirs)


def test_grid_sample_align_false_border_matches_torch(rng):
    B, H, W, C = 2, 9, 12, 3
    img = rng.standard_normal((B, H, W, C)).astype(np.float32)
    grid = rng.uniform(-1.4, 1.4, (B, 5, 7, 2)).astype(np.float32)
    for pad in ["zeros", "border"]:
        ours = np.asarray(
            grid_sample_2d(jnp.asarray(img), jnp.asarray(grid), align_corners=False, padding_mode=pad)
        )
        t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
        theirs = (
            F.grid_sample(t_img, torch.from_numpy(grid), padding_mode=pad, align_corners=False)
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5, err_msg=pad)


def test_disp_warp_matches_torch_reference(rng):
    # vs meta_arch/nerf_stereo/loss.py:73-84 math recomputed in torch.
    # NB the reference builds an align_corners=True grid but samples with the
    # torch default align_corners=False — so zero-disparity warp is NOT the
    # identity; we reproduce that behavior bit-for-bit rather than "fix" it.
    B, H, W, C = 1, 8, 10, 3
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    disp = rng.uniform(0, 3, (B, H, W, 1)).astype(np.float32)
    warped, mask = disp_warp(jnp.asarray(x), jnp.asarray(disp))

    t_x = torch.from_numpy(x).permute(0, 3, 1, 2)
    t_disp = torch.from_numpy(disp).permute(0, 3, 1, 2)
    xb = torch.arange(0, W).repeat(B, H, 1).float()
    yb = torch.arange(0, H).repeat(B, W, 1).transpose(1, 2).float()
    gx = xb - t_disp[:, 0]
    xn = 2 * gx / (W - 1) - 1
    yn = 2 * yb / (H - 1) - 1
    grid = torch.stack([xn, yn], -1)
    t_warp = F.grid_sample(t_x, grid, padding_mode="border", align_corners=False)
    t_mask = F.grid_sample(torch.ones_like(t_x), grid, align_corners=False)
    np.testing.assert_allclose(
        np.asarray(warped), t_warp.permute(0, 2, 3, 1).numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mask), t_mask.permute(0, 2, 3, 1).numpy(), atol=1e-5
    )


def test_ssim_matches_torch_reference(rng):
    # vs meta_arch/nerf_stereo/loss.py:5-27 formula, recomputed in torch here
    x = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    y = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    ours = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y), md=3))

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    ty = torch.from_numpy(y).permute(0, 3, 1, 2)
    refl = torch.nn.ReflectionPad2d(3)
    pool = torch.nn.AvgPool2d(7, 1, 0)
    tx, ty = refl(tx), refl(ty)
    mu_x, mu_y = pool(tx), pool(ty)
    sigma_x = pool(tx * tx) - mu_x**2
    sigma_y = pool(ty * ty) - mu_y**2
    sigma_xy = pool(tx * ty) - mu_x * mu_y
    C1, C2 = 0.01**2, 0.03**2
    s = ((2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)) / (
        (mu_x**2 + mu_y**2 + C1) * (sigma_x + sigma_y + C2)
    )
    theirs = torch.clamp((1 - s) / 2, 0, 1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
