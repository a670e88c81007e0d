"""Bilinear sampling with exact ``grid_sample(align_corners=True)`` semantics.

This is the single most parity-critical op in the framework (SURVEY.md §7
"hard parts"): the reference samples correlation pyramids, geometry volumes
and photometric warps through ``bilinear_sampler`` (``core/utils/utils.py:59-74``),
which wraps torch ``F.grid_sample(..., align_corners=True)`` with default
zero padding. Semantics reproduced here:

  - coords are *pixel* coordinates (x, y); align_corners=True means pixel i
    sits exactly at coordinate i (no half-pixel shift);
  - out-of-bounds taps contribute 0 (zero padding): each of the 4 corner taps
    is weighted by its bilinear weight, and taps outside [0, S-1] are dropped.

XLA notes: the gather is expressed as ``take_along_axis`` over a flattened
spatial axis — one gather op, fuses with the surrounding arithmetic. For the
hot correlation-lookup path use :func:`sample_row_1d` (specialized 1D form)
or the Pallas kernel in ``ops/pallas/corr_lookup.py``.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sampler(img: jnp.ndarray, coords: jnp.ndarray, mask: bool = False):
    """Sample ``img`` (B, H, W, C) at ``coords`` (B, Ho, Wo, 2) [(x, y) pixels].

    Matches torch ``grid_sample(align_corners=True, padding_mode='zeros')``
    after the pixel→[-1,1] normalization of core/utils/utils.py:62-65.

    If ``mask`` is True additionally returns the strictly-in-bounds mask
    (coords strictly inside the image, matching ``:71-72``'s ``>-1 & <1``
    on normalized coords).
    """
    B, H, W, C = img.shape
    x, y = coords[..., 0], coords[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(ix, iy):
        inb = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        flat = iyc * W + ixc  # (B, Ho, Wo)
        src = img.reshape(B, H * W, C)
        idx = flat.reshape(B, -1, 1)
        vals = jnp.take_along_axis(src, idx, axis=1)
        vals = vals.reshape(*flat.shape, C)
        return vals * inb[..., None].astype(img.dtype)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)

    wx = wx[..., None].astype(img.dtype)
    wy = wy[..., None].astype(img.dtype)
    out = (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
    if mask:
        # Reference mask is on normalized coords strictly inside (-1, 1)
        # (core/utils/utils.py:71). With H == 1 y is left unnormalized there;
        # replicate that quirk: y-mask trivially true for H == 1.
        xn = 2 * x / (W - 1) - 1 if W > 1 else x
        yn = 2 * y / (H - 1) - 1 if H > 1 else y
        m = (xn > -1) & (xn < 1) & (yn > -1) & (yn < 1)
        return out, m.astype(img.dtype)
    return out


def sample_row_1d(rows: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """1D bilinear sample along the last axis with zero padding.

    ``rows``: (..., S) values; ``x``: (..., K) pixel positions broadcastable
    against rows' leading dims. Returns (..., K).

    This is the 1-row specialization of grid_sample used by the correlation
    pyramid lookup (core/corr.py:127-146, where the volume rows have height 1
    so the y-tap is trivial).
    """
    S = rows.shape[-1]
    x = x.astype(jnp.float32)
    x0 = jnp.floor(x)
    w = x - x0

    def tap(ix):
        inb = (ix >= 0) & (ix <= S - 1)
        ixc = jnp.clip(ix, 0, S - 1).astype(jnp.int32)
        vals = jnp.take_along_axis(rows, ixc, axis=-1)
        # interpolation always in fp32 (rows may be a bf16 volume)
        return vals.astype(jnp.float32) * inb.astype(jnp.float32)

    return tap(x0) * (1 - w) + tap(x0 + 1) * w


def coords_grid_x(batch: int, ht: int, wd: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B, H, W, 1) grid of x-coordinates.

    The stereo-only analogue of ``coords_grid`` (core/utils/utils.py:77-80):
    the reference tracks a 2-channel (x, y) grid but zeroes every vertical
    update (raft_stereo.py:164), so the y channel is constant; we keep only x.
    """
    x = jnp.arange(wd, dtype=dtype)
    g = jnp.broadcast_to(x[None, None, :, None], (batch, ht, wd, 1))
    return g
