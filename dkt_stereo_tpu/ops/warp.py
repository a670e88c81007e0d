"""Disparity warping and SSIM for photometric losses / confidence tools.

Reproduces the sampling semantics of the reference photometric stack, which —
unlike the correlation lookup — uses torch ``grid_sample`` **defaults**
(``align_corners=False``) with border padding:
  - ``disp_warp`` meta_arch/nerf_stereo/loss.py:73-84 (border pad, default
    align_corners=False, plus a zero-pad-sampled validity mask),
  - ``warp_disp`` utils/confidence.py:67-84 (same semantics, [0,1] grid),
  - SSIM (avg-pool, reflection pad, (1-ssim)/2 clamped) from
    meta_arch/nerf_stereo/loss.py:5-27.
"""

from __future__ import annotations

import jax.numpy as jnp

from dkt_stereo_tpu.ops.resize import avg_pool2d


def grid_sample_2d(
    img: jnp.ndarray,
    coords: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """torch-parity grid_sample over NHWC with *normalized* coords.

    ``img``: (B,H,W,C); ``coords``: (B,Ho,Wo,2) in [-1,1] (x, y) order.
    """
    B, H, W, C = img.shape
    xn, yn = coords[..., 0], coords[..., 1]
    if align_corners:
        x = (xn + 1) * 0.5 * (W - 1)
        y = (yn + 1) * 0.5 * (H - 1)
    else:
        x = ((xn + 1) * W - 1) * 0.5
        y = ((yn + 1) * H - 1) * 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None].astype(img.dtype)
    wy = (y - y0)[..., None].astype(img.dtype)

    def tap(ix, iy):
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        flat = (iyc * W + ixc).reshape(B, -1, 1)
        vals = jnp.take_along_axis(img.reshape(B, H * W, C), flat, axis=1)
        vals = vals.reshape(*ix.shape, C)
        if padding_mode == "zeros":
            inb = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
            vals = vals * inb[..., None].astype(img.dtype)
        return vals

    out = (
        tap(x0, y0) * (1 - wx) * (1 - wy)
        + tap(x0 + 1, y0) * wx * (1 - wy)
        + tap(x0, y0 + 1) * (1 - wx) * wy
        + tap(x0 + 1, y0 + 1) * wx * wy
    )
    return out


def disp_warp(x: jnp.ndarray, disp: jnp.ndarray, r2l: bool = False, pad: str = "border"):
    """Warp ``x`` (B,H,W,C) by positive disparity ``disp`` (B,H,W,1).

    Left-to-right reconstruction samples x at (w - disp) (r2l samples w + disp).
    Returns (warped, mask) exactly as meta_arch/nerf_stereo/loss.py:73-84:
    warp with border padding, mask = ones warped with zero padding."""
    B, H, W, _ = x.shape
    offset = 1.0 if r2l else -1.0
    gx = jnp.arange(W, dtype=disp.dtype)[None, None, :, None] + offset * disp
    gy = jnp.broadcast_to(jnp.arange(H, dtype=disp.dtype)[None, :, None, None], gx.shape)
    xn = 2.0 * gx / (W - 1) - 1.0
    yn = 2.0 * gy / (H - 1) - 1.0
    grid = jnp.concatenate([xn, yn], axis=-1)
    warped = grid_sample_2d(x, grid, align_corners=False, padding_mode=pad)
    mask = grid_sample_2d(jnp.ones_like(x), grid, align_corners=False, padding_mode="zeros")
    return warped, mask


def ssim(x: jnp.ndarray, y: jnp.ndarray, md: int = 3) -> jnp.ndarray:
    """SSIM distance (1-SSIM)/2 ∈ [0,1], NHWC (nerf_stereo/loss.py:5-27):
    reflection-pad by md, (2md+1)² average pooling, C1=1e-4 C2=9e-4."""
    patch = 2 * md + 1
    C1, C2 = 0.01**2, 0.03**2
    xp = jnp.pad(x, ((0, 0), (md, md), (md, md), (0, 0)), mode="reflect")
    yp = jnp.pad(y, ((0, 0), (md, md), (md, md), (0, 0)), mode="reflect")

    def pool(v):
        return avg_pool2d(v, (patch, patch), (1, 1), (0, 0))

    mu_x, mu_y = pool(xp), pool(yp)
    sigma_x = pool(xp * xp) - mu_x**2
    sigma_y = pool(yp * yp) - mu_y**2
    sigma_xy = pool(xp * yp) - mu_x * mu_y
    num = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    den = (mu_x**2 + mu_y**2 + C1) * (sigma_x + sigma_y + C2)
    return jnp.clip((1 - num / den) / 2, 0.0, 1.0)
