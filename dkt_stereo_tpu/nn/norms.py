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
def cross_band_stats(axis_name: str, tensor_h: int, halo: int, band_h: int,
                     full_h: int, n_bands: int = 0):
    """All heights at stride 1 (input resolution) and multiples of 32 so the
    interior row ranges stay integral at every encoder stride. ``n_bands``
    (the static band-axis size) enables :func:`band_refresh` halo exchange."""
    global _BAND_STATS
    prev = _BAND_STATS
    _BAND_STATS = dict(
        axis=axis_name, th=tensor_h, halo=halo, bh=band_h, fh=full_h, n=n_bands
    )
    try:
        yield
    finally:
        _BAND_STATS = prev


def band_refresh(x):
    """Halo exchange for exact banded eval: replace each band's top/bottom
    ``halo`` rows with the neighbors' EXACT values for the same global rows
    (``jax.lax.ppermute`` along the band axis), resetting cross-band conv
    contamination to zero.

    Why this makes banding exact: band windows overlap by 2·halo rows
    (eval/tiled.py window geometry), so every halo row of band k is an
    interior-adjacent row of a neighbor, at distance ≥ min(band_h, halo)
    from that neighbor's window edge. As long as the cumulative conv
    receptive reach since the previous refresh is below that distance, the
    received rows are bit-identical to the full-image computation — calling
    this between encoder stages (nn/blocks.py) and once per GRU iteration
    (models/raft_stereo.py) keeps every segment's reach ≤ halo and makes
    the 3-GRU-layer config's banded output match the unbanded forward to fp
    noise (tests/test_parallel.py pins < 1e-3 at halo=128, the bound the
    1/16-scale context branch previously broke at ~4.6%).

    No-op outside the banded context (``_BAND_STATS is None``), when the
    image collapsed to a single band (halo == 0), or when the tensor is too
    short to carry a halo margin. Works for any (B, H_band, W, C) tensor
    whose stride divides the context heights (all multiples of 32)."""
    ctx = _BAND_STATS
    if ctx is None or ctx["halo"] == 0 or ctx.get("n", 0) <= 1 or x.ndim != 4:
        return x
    axis, th, halo, bh, fh, n = (
        ctx["axis"], ctx["th"], ctx["halo"], ctx["bh"], ctx["fh"], ctx["n"]
    )
    h = x.shape[1]
    if th % h:
        return x  # not a band-height tensor (e.g. pooled to odd size)
    s = th // h
    hs = halo // s
    if hs < 1 or h < 2 * hs + 1:
        return x

    k = jax.lax.axis_index(axis)

    def win0(i):
        return jnp.clip(i * bh - halo, 0, fh - th)

    w_k = win0(k)
    # rows the LOWER neighbor needs for its top halo: global
    # [win0(k+1), win0(k+1)+halo) at local offset (win0(k+1) − win0(k))/s
    send_down_off = jnp.clip((win0(k + 1) - w_k) // s, 0, h - hs)
    down = jax.lax.dynamic_slice_in_dim(x, send_down_off, hs, axis=1)
    recv_top = jax.lax.ppermute(down, axis, [(i, i + 1) for i in range(n - 1)])
    # rows the UPPER neighbor needs for its bottom halo: global
    # [win0(k−1)+th−halo, win0(k−1)+th) at local (…−win0(k))/s
    send_up_off = jnp.clip((win0(k - 1) + th - halo - w_k) // s, 0, h - hs)
    up = jax.lax.dynamic_slice_in_dim(x, send_up_off, hs, axis=1)
    recv_bot = jax.lax.ppermute(up, axis, [(i, i - 1) for i in range(1, n)])

    # band 0's top / band n−1's bottom edges ARE the image edges — exact
    # SAME-padding behavior, keep the local rows there
    top = jnp.where(k > 0, recv_top, x[:, :hs])
    bot = jnp.where(k < n - 1, recv_bot, x[:, h - hs:])
    return jnp.concatenate([top, x[:, hs : h - hs], bot], axis=1)


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
            if t.dtype == jnp.bfloat16:
                # single-pass sum/sumsq (var = E[x²] − m²), the same stats
                # formulation as the banded path above and the fused w2d
                # encoder (encoder_conv.py::in_affine). The two-pass E[(x−m)²]
                # form forces the centered tensor to MATERIALIZE (it feeds
                # both the var reduce and the output), costing two extra HBM
                # passes per norm — measured 17 ms of the fnet layer2/3
                # tail's 29 at eval geometry, ~3x less with this form. The
                # squares convert to fp32 inside the fused reduce (no fp32
                # copy); cancellation is benign at bf16 tolerances. fp32
                # inputs (parity mode) keep the exact centered form below.
                sm = jnp.sum(jnp.sum(t, axis=2, dtype=jnp.float32), axis=1) / n
                sq = (
                    jnp.sum(jnp.sum(jnp.square(t.astype(jnp.float32)), axis=2), axis=1)
                    / n
                )
                v = sq - sm * sm
                return sm[:, None, None, :], v[:, None, None, :]
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
