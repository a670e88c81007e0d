"""Confidence toolbox (rebuild of utils/confidence.py).

Available-but-unwired tools in the reference's DKT loop (SURVEY.md §2.5):
gaussian-window SSIM (:23-60), disparity-warp reprojection error (:67-103),
left-right uniqueness (:113-166), neighborhood agreement (:129-188).

``uniqueness`` is a scatter over right-image hit coordinates; implemented
with a segment-max (jit-friendly, matching the numpy variant's
first-hit-wins-on-sorted-unique semantics via min-index reduction).
``agreement`` counts neighbors within ``tau`` over a (2r+1)² window —
pure stacked shifts. Both vectorize on the VPU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dkt_stereo_tpu.ops.warp import disp_warp


def gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """utils/confidence.py:23-31 1D gaussian outer product, normalized."""
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim_gaussian(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Gaussian-window SSIM map (utils/confidence.py:33-60), NHWC,
    per-channel depthwise filtering, 'same' zero padding."""
    C = img1.shape[-1]
    w = jnp.asarray(gaussian_window(window_size))[:, :, None, None]
    w = jnp.tile(w, (1, 1, 1, C))
    p = window_size // 2

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
        )

    mu1, mu2 = filt(img1), filt(img2)
    s1 = filt(img1 * img1) - mu1**2
    s2 = filt(img2 * img2) - mu2**2
    s12 = filt(img1 * img2) - mu1 * mu2
    C1, C2 = 0.01**2, 0.03**2
    return ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / ((mu1**2 + mu2**2 + C1) * (s1 + s2 + C2))


def reprojection_error(img_left, img_right, disp=None, valid_mask=None):
    """utils/confidence.py:86-103: warp right by −disp (``disp`` in this
    repo's negative-flow convention), 0.15·L1 + 0.85·(1−SSIM)/2 with the
    GAUSSIAN-window SSIM (the reference's ``ssim``, :43-60 — not the NeRF
    loss's uniform-window SSIM distance). Documented divergence: the warp is
    the shared ``ops.warp.disp_warp`` ((W−1) grid normalization, the
    reference's own norm_grid, nerf_stereo/loss.py:29-35) rather than the
    MonoDepth-quirk warp of utils/confidence.py:74-78 which scales the shift
    by (W−1)/W — a sub-pixel difference of |d|/W px."""
    if disp is not None:
        warped, _ = disp_warp(img_right, -disp)
    else:
        warped = img_right
    if valid_mask is None:
        valid_mask = jnp.ones_like(img_left[..., :1])
    l1 = jnp.abs(warped * valid_mask - img_left * valid_mask).mean()
    s = (valid_mask * (1.0 - ssim_gaussian(img_left, warped)) / 2.0).mean(axis=-1)
    return 0.15 * l1 + 0.85 * s


def uniqueness(disparity: jnp.ndarray) -> jnp.ndarray:
    """Left-right uniqueness (utils/confidence.py:113-127): pixel (y,x) is
    confident iff it is the first (in unique-coordinate order) left pixel
    landing on its right-image coordinate x − d."""
    d = disparity.astype(jnp.int32)
    B, H, W = d.shape
    base = (
        jnp.arange(B)[:, None, None] * H * W
        + jnp.arange(H)[None, :, None] * W
        + jnp.arange(W)[None, None, :]
    )
    coords = (base - d).reshape(-1)
    n = coords.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    # winner per landing coordinate = min source index (np.unique return_index
    # marks the first occurrence of every distinct value, negatives included —
    # shift by W so border-negative coordinates keep distinct slots)
    coords_s = coords + W
    winner = jnp.full((n + W,), n, jnp.int32).at[coords_s].min(idx)
    out = winner[coords_s] == idx
    return out.reshape(B, H, W).astype(jnp.float32)


def agreement(disparity: jnp.ndarray, r: int, tau: float = 1.0) -> jnp.ndarray:
    """Neighborhood agreement count (utils/confidence.py:129-143): number of
    pixels in the (2r+1)² window (excluding center) within ``tau``."""
    d = disparity.astype(jnp.float32)
    B, H, W = d.shape
    p = jnp.pad(d, ((0, 0), (r, r), (r, r)))
    wind = 2 * r + 1
    count = jnp.zeros((B, H, W), jnp.float32)
    for k in range(wind * wind):
        if k == wind * wind // 2:
            continue
        nb = p[:, k // wind : k // wind + H, k % wind : k % wind + W]
        count = count + (jnp.abs(d - nb) < tau).astype(jnp.float32)
    return count
