"""Dense disparity cost volumes (GWC / concat / norm-correlation) + regression.

TPU-native rebuild of the reference volume builders, which loop over
disparities in Python and in-place-slice a zero tensor
(meta_arch/gwcnet/submodules.py:25-58, meta_arch/igev_stereo/submodule.py:152-218,
meta_arch/cgi/submodule.py:165-180). Here each volume is a ``lax.scan`` over a
*traced* disparity index using roll+mask — a compact compiled graph (no 48-way
Python unroll), all element-wise VPU work, with the group-mean reduction fused.

Volume layout is NDHWC: (B, D, H, W, C) — the layout XLA's 3D convolutions
want on TPU — where the reference uses (B, C, D, H, W).

Disparity axis convention for regression ops here: channels-last (B, H, W, D).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shift_right(fea: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Shift (B,H,W,C) right along W by traced ``d``, zero-filling w < d."""
    W = fea.shape[2]
    rolled = jnp.roll(fea, d, axis=2)
    w_idx = jnp.arange(W)[None, None, :, None]
    return jnp.where(w_idx >= d, rolled, jnp.zeros((), fea.dtype))


def build_gwc_volume(
    fmap1: jnp.ndarray, fmap2: jnp.ndarray, maxdisp: int, num_groups: int,
    layout: str = "ndhwc",
) -> jnp.ndarray:
    """Group-wise correlation volume.

    (B,H,W,C)×2 → (B, D, H, W, G); cost[b,d,h,w,g] = mean over the group's
    channels of f1[w]·f2[w-d], zero where w < d — matching
    meta_arch/igev_stereo/submodule.py:160-170.

    ``layout="nhwdc"`` emits (B, H, W, D, G) — the depth-to-lane packed
    layout of nn/conv3d_packed.py — directly from the scan (one transpose
    either way; no extra relayout for the packed aggregation path).
    """
    B, H, W, C = fmap1.shape
    G = num_groups
    assert C % G == 0
    f1 = fmap1.reshape(B, H, W, G, C // G)

    def step(_, d):
        f2s = _shift_right(fmap2, d).reshape(B, H, W, G, C // G)
        cost = (f1 * f2s).mean(axis=-1)  # (B,H,W,G)
        return None, cost

    _, vol = jax.lax.scan(step, None, jnp.arange(maxdisp))
    # (an 8-disparities-per-step blocked variant was measured SLOWER on chip
    # — 8.8 vs 6.0 ms at IGEV eval geometry — XLA already pipelines the
    # per-step streams; keep the simple scan)
    if layout == "nhwdc":
        return vol.transpose(1, 2, 3, 0, 4)  # (B,H,W,D,G)
    return vol.transpose(1, 0, 2, 3, 4)  # (B,D,H,W,G)


def build_concat_volume(
    fmap1: jnp.ndarray, fmap2: jnp.ndarray, maxdisp: int, mask_ref: bool = True
) -> jnp.ndarray:
    """Concat volume (B, D, H, W, 2C).

    ``mask_ref=True`` zeroes the reference features where w < d
    (gwcnet/submodules.py:29-31 slices ref by ``[..., i:]``);
    ``mask_ref=False`` keeps the full reference (igev_stereo/submodule.py:211,
    cgi variant) — the reference codebase genuinely differs here.
    """
    B, H, W, C = fmap1.shape

    def step(_, d):
        f2s = _shift_right(fmap2, d)
        if mask_ref:
            w_idx = jnp.arange(W)[None, None, :, None]
            f1d = jnp.where(w_idx >= d, fmap1, jnp.zeros((), fmap1.dtype))
        else:
            f1d = fmap1
        return None, jnp.concatenate([f1d, f2s], axis=-1)

    _, vol = jax.lax.scan(step, None, jnp.arange(maxdisp))
    return vol.transpose(1, 0, 2, 3, 4)


def build_norm_correlation_volume(
    fmap1: jnp.ndarray, fmap2: jnp.ndarray, maxdisp: int
) -> jnp.ndarray:
    """Single-channel cosine volume (B, D, H, W, 1)
    (cgi/submodule.py:165-180: features normalized with +1e-5 on the norm)."""
    f1 = fmap1 / (jnp.linalg.norm(fmap1, axis=-1, keepdims=True) + 1e-5)
    f2 = fmap2 / (jnp.linalg.norm(fmap2, axis=-1, keepdims=True) + 1e-5)

    def step(_, d):
        f2s = _shift_right(f2, d)
        return None, (f1 * f2s).mean(axis=-1, keepdims=True)

    _, vol = jax.lax.scan(step, None, jnp.arange(maxdisp))
    return vol.transpose(1, 0, 2, 3, 4)


def disparity_regression(prob: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
    """Soft-argmin: (B,H,W,D) probabilities → (B,H,W,1) expected disparity
    (igev_stereo/submodule.py:220-224)."""
    d = jnp.arange(maxdisp, dtype=prob.dtype)
    return jnp.sum(prob * d, axis=-1, keepdims=True)


def regression_topk(cost: jnp.ndarray, disparity_samples: jnp.ndarray, k: int) -> jnp.ndarray:
    """Top-k soft-argmin (cgi/submodule.py:220-228): softmax over only the k
    largest cost entries. ``cost``/``disparity_samples``: (B,H,W,D) → (B,H,W,1)."""
    topv, topi = jax.lax.top_k(cost, k)
    prob = jax.nn.softmax(topv, axis=-1)
    samp = jnp.take_along_axis(disparity_samples, topi, axis=-1)
    return jnp.sum(samp * prob, axis=-1, keepdims=True)
