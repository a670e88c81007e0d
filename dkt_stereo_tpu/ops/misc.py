"""Misc ops from the reference's utils (completing the SURVEY §2.1 inventory).

``gauss_blur`` (core/utils/utils.py:87-94) and ``forward_interpolate``
(:28-56) — both unused on the reference's main path but part of its public
surface."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def gauss_blur(x: jnp.ndarray, N: int = 5, std: float = 1.0) -> jnp.ndarray:
    """Per-channel gaussian blur over NHWC (core/utils/utils.py:87-94):
    unnormalized gaussian window normalized by its (clamped) sum, 'same'
    zero padding."""
    g1 = np.arange(N, dtype=np.float64) - N // 2
    gx, gy = np.meshgrid(g1, g1, indexing="ij")
    w = np.exp(-(gx**2 + gy**2) / (2 * std**2))
    w = w / max(w.sum(), 1e-4)
    C = x.shape[-1]
    kernel = jnp.asarray(np.tile(w[:, :, None, None], (1, 1, 1, C)), x.dtype)
    p = N // 2
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )


def forward_interpolate(flow: np.ndarray) -> np.ndarray:
    """Forward-splat + nearest-fill of a flow field (core/utils/utils.py:28-56).
    Host-side numpy/scipy (the reference also runs it on host)."""
    from scipy import interpolate

    dx, dy = flow[0], flow[1]
    ht, wd = dx.shape
    x0, y0 = np.meshgrid(np.arange(wd), np.arange(ht))
    x1 = (x0 + dx).reshape(-1)
    y1 = (y0 + dy).reshape(-1)
    dxf = dx.reshape(-1)
    dyf = dy.reshape(-1)
    valid = (x1 > 0) & (x1 < wd) & (y1 > 0) & (y1 < ht)
    x1, y1, dxf, dyf = x1[valid], y1[valid], dxf[valid], dyf[valid]
    flow_x = interpolate.griddata((x1, y1), dxf, (x0, y0), method="nearest", fill_value=0)
    flow_y = interpolate.griddata((x1, y1), dyf, (x0, y0), method="nearest", fill_value=0)
    return np.stack([flow_x, flow_y], axis=0).astype(np.float32)
