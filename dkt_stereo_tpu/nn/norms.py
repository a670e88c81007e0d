"""Normalization layers with torch-parity semantics.

The reference selects norms by string ('group'/'batch'/'instance'/'none')
throughout core/extractor.py. Torch defaults reproduced here:

  - GroupNorm: eps 1e-5, affine.
  - BatchNorm2d: eps 1e-5, momentum 0.1 (torch meaning), affine, running
    stats. The DKT fine-tune loop always runs BN in eval mode (``freeze_bn``
    raft_stereo.py:56-59; ft_dkt.py:155-167), so the default here is frozen
    stats; pass ``use_running_average=False`` only for from-scratch
    pre-training.
  - InstanceNorm2d: eps 1e-5, **no affine**, no running stats (torch default).
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

# --- cross-band instance-norm statistics (exact banded eval) ---------------
#
# eval/tiled.py::banded_forward_exact runs the model under shard_map with one
# horizontal band per device. Inside that trace, this context makes every
# InstanceNorm compute its statistics over ONLY the band's interior rows
# (mask), psum the partial sums across the band axis, and normalize with the
# resulting GLOBAL mean/var — numerically the full-image statistics, since
# the band interiors tile the padded image exactly. The context is read at
# TRACE time (callers must trace inside the with-block).
_BAND_STATS: Optional[dict] = None


@contextlib.contextmanager
def cross_band_stats(axis_name: str, tensor_h: int, halo: int, band_h: int, full_h: int):
    """All heights at stride 1 (input resolution) and multiples of 32 so the
    interior row ranges stay integral at every encoder stride."""
    global _BAND_STATS
    prev = _BAND_STATS
    _BAND_STATS = dict(axis=axis_name, th=tensor_h, halo=halo, bh=band_h, fh=full_h)
    try:
        yield
    finally:
        _BAND_STATS = prev


def _banded_instance_stats(x, ctx, epsilon):
    """Masked-interior mean/var psum'd over the band axis; returns the
    normalized tensor. Exactly reproduces the full-image statistics because
    interiors tile [0, full_h) and halo/padding rows are masked out."""
    axis, th, halo, bh, fh = ctx["axis"], ctx["th"], ctx["halo"], ctx["bh"], ctx["fh"]
    h = x.shape[1]
    s = th // h  # feature stride vs input resolution
    k = jax.lax.axis_index(axis)
    win0 = jnp.clip(k * bh - halo, 0, fh - th)  # window start (matches tiled.py)
    off = k * bh - win0  # interior offset inside the window
    ilen = jnp.clip(fh - k * bh, 0, bh)  # interior rows (last band may be short)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    m = ((rows >= off // s) & (rows < off // s + ilen // s)).astype(jnp.float32)

    xf = x.astype(jnp.float32) * m
    cnt = jax.lax.psum(jnp.sum(m) * x.shape[2], axis)
    mean = jax.lax.psum(jnp.sum(xf, axis=(1, 2), keepdims=True), axis) / cnt
    var = jax.lax.psum(jnp.sum(xf * xf, axis=(1, 2), keepdims=True), axis) / cnt - mean**2
    scale = jax.lax.rsqrt(var + epsilon).astype(x.dtype)
    return (x - mean.astype(x.dtype)) * scale


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over all spatial dims (no
    affine) — torch InstanceNorm2d for (B,H,W,C), InstanceNorm3d for
    (B,D,H,W,C).

    Statistics accumulate in fp32 but the elementwise math stays in the
    input dtype — avoids materializing fp32 copies of full-resolution
    bf16 activations (2× HBM traffic in the fnet stem otherwise)."""

    epsilon: float = 1e-5
    # stats_stride > 1 estimates mean/var on an HxW subsample (stride² fewer
    # samples; ~59k pixels still at stride 4 on 736x1280) — shrinks the
    # full-tensor reduction that serializes against the surrounding convs.
    # Perf mode only; exact parity keeps stride 1.
    stats_stride: int = 1

    @nn.compact
    def __call__(self, x):
        if _BAND_STATS is not None:
            # exact banded eval: global (cross-band) statistics, always
            # stride-1 (the subsampled fast path would sample a band-shifted
            # grid and break cross-band equality)
            assert x.ndim == 4, (
                "cross-band instance-norm statistics are defined for 2D "
                f"feature maps (B,H,W,C); got rank {x.ndim}"
            )
            return _banded_instance_stats(x, _BAND_STATS, self.epsilon)
        if x.ndim == 5:
            # 3D volumes (InstanceNorm3d): joint fp32 reduce; volumes are
            # never full-resolution so the single-pass reduce is fine
            m = jnp.mean(x, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
            c = x - m.astype(x.dtype)
            v = jnp.mean(c * c, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
            return c * jax.lax.rsqrt(v + self.epsilon).astype(x.dtype)
        s = self.stats_stride

        # Large tensors: reductions one axis at a time — XLA fuses the
        # elementwise multiply/convert chain into a single-axis reduce, so
        # no fp32 copy of the activations is materialized. Both the joint
        # `jnp.mean(..., axis=(1,2), dtype=f32)` formulation and a
        # dot_general/einsum contraction allocated multi-GB relayout temps
        # at full-resolution Middlebury sizes and OOM'd the chip. Small
        # (train/eval-size) tensors keep the joint reduce — it is a single
        # fused pass and measurably faster there.
        def _stats(t):
            n = t.shape[1] * t.shape[2]
            if t.size < (1 << 26):
                m = jnp.mean(t, axis=(1, 2), keepdims=True, dtype=jnp.float32)
                c = t - m.astype(t.dtype)
                v = jnp.mean(c * c, axis=(1, 2), keepdims=True, dtype=jnp.float32)
                return m, v
            m = jnp.sum(jnp.sum(t, axis=2, dtype=jnp.float32), axis=1) / n
            c = t - m[:, None, None, :].astype(t.dtype)
            v = jnp.sum(jnp.sum(c * c, axis=2, dtype=jnp.float32), axis=1) / n
            return m[:, None, None, :], v[:, None, None, :]

        if s > 1:
            mean, var = _stats(x[:, ::s, ::s])
            centered = x - mean.astype(x.dtype)
        else:
            mean, var = _stats(x)
            centered = x - mean.astype(x.dtype)
        scale = jax.lax.rsqrt(var + self.epsilon).astype(x.dtype)
        return centered * scale


class Norm(nn.Module):
    """String-dispatched norm. ``num_groups`` only for 'group'."""

    norm_fn: str
    num_groups: Optional[int] = None
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.norm_fn == "group":
            return nn.GroupNorm(
                num_groups=self.num_groups, epsilon=1e-5, dtype=self.dtype
            )(x)
        if self.norm_fn == "batch":
            return nn.BatchNorm(
                use_running_average=self.use_running_average,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
            )(x)
        if self.norm_fn == "instance":
            return InstanceNorm()(x)
        if self.norm_fn == "instance_fast":
            return InstanceNorm(stats_stride=4)(x)
        if self.norm_fn == "none":
            return x
        raise ValueError(f"unknown norm_fn {self.norm_fn!r}")
