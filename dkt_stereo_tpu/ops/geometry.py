"""Combined geometry-encoding volume lookup (IGEV).

Rebuild of meta_arch/igev_stereo/geometry.py:6-58: a dual pyramid —
(a) the aggregated 8-channel geo volume sampled at ``disp/2^i ± r`` along the
disparity axis, (b) the all-pairs init correlation sampled at
``(coords − disp)/2^i ± r`` along the right-image width — concatenated per
level as [geo (8·(2r+1)) ch, corr ((2r+1)) ch] → (B, H, W, L·(2r+1)·9).

Pure-XLA formulation using the same zero-padded 1D linear interpolation as
ops.corr; the channel ordering matches the reference's
``(bhw, C, 1, K).view(b, h, w, -1)`` (C-major, taps fast).
"""

from __future__ import annotations

import jax.numpy as jnp

from dkt_stereo_tpu.ops.corr import corr_pyramid_fused
from dkt_stereo_tpu.ops.sampler import sample_row_1d


def _sample_channel_rows(rows: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """rows (B,H,W,D,C), x (B,H,W,K) → (B,H,W,C·K) with C-major ordering."""
    B, H, W, D, C = rows.shape
    K = x.shape[-1]
    # move channels in front of D: (B,H,W,C,D) then sample along D
    r = rows.transpose(0, 1, 2, 4, 3)
    out = sample_row_1d(r, x[:, :, :, None, :])  # (B,H,W,C,K)
    return out.reshape(B, H, W, C * K)


def geo_lookup(
    geo_pyramid,
    init_corr_pyramid,
    disp: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int,
) -> jnp.ndarray:
    """Pure per-iteration sampling over explicit pyramids.

    geo_pyramid: per-level (B,H,W,Disp,C); init_corr_pyramid: per-level
    (B,H,W,W2); disp, coords: (B,H,W,1) → (B,H,W, L·(2r+1)·(C+1)) fp32.
    Takes the pyramids explicitly so scan bodies can call it on carried
    constants (no object construction inside traced code)."""
    dx = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    out = []
    for i, (geo, ic) in enumerate(zip(geo_pyramid, init_corr_pyramid)):
        x_geo = disp.astype(jnp.float32) / (2**i) + dx  # (B,H,W,2r+1)
        out.append(_sample_channel_rows(geo, x_geo))
        x_corr = (coords.astype(jnp.float32) - disp.astype(jnp.float32)) / (2**i) + dx
        out.append(sample_row_1d(ic, x_corr))
    return jnp.concatenate(out, axis=-1)


class CombinedGeoEncodingVolume:
    """Functional port: construct once per forward, call per iteration."""

    def __init__(self, fmap1, fmap2, geo_volume, num_levels=2, radius=4,
                 layout="ndhwc"):
        """fmap1/2: (B,H,W,D) descriptors; geo_volume: (B, Disp, H, W, C)
        (this framework's NDHWC volume layout), or (B, H, W, Disp, C) with
        ``layout="nhwdc"`` (the depth-to-lane packed aggregation output —
        already the pyramid's sampling layout, so no major transpose)."""
        self.num_levels = num_levels
        self.radius = radius
        # init correlation (no 1/sqrt(D): geometry.py:62-69 omits the scale);
        # levels built directly as f1 @ pooled(f2) — exact, skips the
        # volume-pool relayout (see ops/corr.py::corr_pyramid_fused)
        self.init_corr_pyramid = corr_pyramid_fused(
            fmap1, fmap2, num_levels, scaled=False
        )

        if layout == "nhwdc":
            g = geo_volume.transpose(0, 1, 2, 4, 3)  # (B,H,W,C,Disp)
        else:
            g = geo_volume.transpose(0, 2, 3, 4, 1)  # (B,H,W,C,Disp)
        self.geo_pyramid = [g.transpose(0, 1, 2, 4, 3)]  # (B,H,W,Disp,C)
        for _ in range(num_levels - 1):
            d = g.shape[-1]
            g = g[..., : (d // 2) * 2].reshape(*g.shape[:-1], d // 2, 2).mean(-1)
            self.geo_pyramid.append(g.transpose(0, 1, 2, 4, 3))

    def __call__(self, disp: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
        """disp, coords: (B,H,W,1) → (B,H,W, L·(2r+1)·(C+1)) fp32."""
        return geo_lookup(
            self.geo_pyramid, self.init_corr_pyramid, disp, coords, self.radius
        )
