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

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over H, W (no affine).

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
        s = self.stats_stride
        xs = x[:, ::s, ::s] if s > 1 else x
        mean = jnp.mean(xs, axis=(1, 2), keepdims=True, dtype=jnp.float32)
        if s > 1:
            var = jnp.mean(
                (xs - mean.astype(xs.dtype)) ** 2, axis=(1, 2), keepdims=True, dtype=jnp.float32
            )
            centered = x - mean.astype(x.dtype)
        else:
            centered = x - mean.astype(x.dtype)
            var = jnp.mean(centered * centered, axis=(1, 2), keepdims=True, dtype=jnp.float32)
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
