"""Residual feature/context encoders (NHWC, bf16-capable).

Rebuild of core/extractor.py: ``ResidualBlock`` (:6-60), ``BottleneckBlock``
(:64-120), ``BasicEncoder`` (:122-197), ``MultiBasicEncoder`` (:199-300).
Weight init is kaiming-normal fan-out (``:155-162``). Parameter tree names
mirror the torch attribute names for checkpoint import.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from dkt_stereo_tpu.nn.norms import Norm

# torch kaiming_normal_(mode='fan_out', nonlinearity='relu')
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def conv(features, kernel, stride=1, padding=0, dtype=jnp.float32, name=None, use_bias=True):
    return nn.Conv(
        features,
        (kernel, kernel) if isinstance(kernel, int) else kernel,
        strides=(stride, stride),
        padding=padding if isinstance(padding, str) else [(padding, padding)] * 2
        if isinstance(padding, int)
        else padding,
        use_bias=use_bias,
        kernel_init=kaiming_out,
        dtype=dtype,
        name=name,
    )


class ResidualBlock(nn.Module):
    """core/extractor.py:6-60. Two 3×3 convs + optional 1×1 downsample."""

    in_planes: int
    planes: int
    norm_fn: str = "group"
    stride: int = 1
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ng = self.planes // 8
        ura = self.use_running_average
        y = conv(self.planes, 3, self.stride, 1, self.dtype, name="conv1")(x)
        y = Norm(self.norm_fn, ng, ura, self.dtype, name="norm1")(y)
        y = nn.relu(y)
        y = conv(self.planes, 3, 1, 1, self.dtype, name="conv2")(y)
        y = Norm(self.norm_fn, ng, ura, self.dtype, name="norm2")(y)
        y = nn.relu(y)

        if not (self.stride == 1 and self.in_planes == self.planes):
            x = conv(self.planes, 1, self.stride, 0, self.dtype, name="downsample_conv")(x)
            x = Norm(self.norm_fn, ng, ura, self.dtype, name="norm3")(x)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    """core/extractor.py:64-120 (1×1 → 3×3 → 1×1, quarter-width middle)."""

    in_planes: int
    planes: int
    norm_fn: str = "group"
    stride: int = 1
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ng = self.planes // 8
        ura = self.use_running_average
        y = conv(self.planes // 4, 1, 1, 0, self.dtype, name="conv1")(x)
        y = nn.relu(Norm(self.norm_fn, ng, ura, self.dtype, name="norm1")(y))
        y = conv(self.planes // 4, 3, self.stride, 1, self.dtype, name="conv2")(y)
        y = nn.relu(Norm(self.norm_fn, ng, ura, self.dtype, name="norm2")(y))
        y = conv(self.planes, 1, 1, 0, self.dtype, name="conv3")(y)
        y = nn.relu(Norm(self.norm_fn, ng, ura, self.dtype, name="norm3")(y))

        if self.stride != 1:
            x = conv(self.planes, 1, self.stride, 0, self.dtype, name="downsample_conv")(x)
            x = Norm(self.norm_fn, ng, ura, self.dtype, name="norm4")(x)
        return nn.relu(x + y)


def _res_pair(in_planes, dim, norm_fn, stride, ura, dtype, name):
    """A two-ResidualBlock stage (core/extractor.py:164-170)."""

    class _Stage(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = ResidualBlock(in_planes, dim, norm_fn, stride, ura, dtype, name="0")(x)
            x = ResidualBlock(dim, dim, norm_fn, 1, ura, dtype, name="1")(x)
            return x

    return _Stage(name=name)


class BasicEncoder(nn.Module):
    """Feature encoder (core/extractor.py:122-197): 7×7 stem + 3 stages
    (64, 96, 128) + 1×1 head. With downsample=2 (RAFT base config) output is
    1/4 resolution; downsample=3 gives 1/8."""

    output_dim: int = 128
    norm_fn: str = "batch"
    downsample: int = 3
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d, ura = self.downsample, self.use_running_average
        x = conv(64, 7, 1 + (d > 2), 3, self.dtype, name="conv1")(x)
        x = Norm(self.norm_fn, 8, ura, self.dtype, name="norm1")(x)
        x = nn.relu(x)
        x = _res_pair(64, 64, self.norm_fn, 1, ura, self.dtype, "layer1")(x)
        x = _res_pair(64, 96, self.norm_fn, 1 + (d > 1), ura, self.dtype, "layer2")(x)
        x = _res_pair(96, 128, self.norm_fn, 1 + (d > 0), ura, self.dtype, "layer3")(x)
        x = conv(self.output_dim, 1, 1, 0, self.dtype, name="conv2")(x)
        return x


class _ConvOut(nn.Module):
    """ResidualBlock + 3×3 conv output head (core/extractor.py:229-231)."""

    dim: int
    norm_fn: str
    use_running_average: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        x = ResidualBlock(128, 128, self.norm_fn, 1, self.use_running_average, self.dtype, name="res")(x)
        return conv(self.dim, 3, 1, 1, self.dtype, name="conv")(x)


class MultiBasicEncoder(nn.Module):
    """Multi-scale context encoder (core/extractor.py:199-300).

    Returns a tuple over scales (fine → coarse: 1/4, 1/8, 1/16 at
    downsample=2) of ``[head_0(x), head_1(x), ...]`` — one head per entry in
    ``output_dim`` (RAFT passes [hidden_dims, context_dims]). Head channel
    indexing follows the reference: finest scale uses dim[2], coarsest dim[0].

    ``dual_inp=True`` additionally returns the full-batch layer3 features
    (used by the shared-backbone path, raft_stereo.py:97-99), with the heads
    applied to the first half of the batch only.
    """

    output_dim: Sequence[Sequence[int]] = ((128, 128, 128),)
    norm_fn: str = "batch"
    downsample: int = 3
    num_layers: int = 3
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, dual_inp: bool = False):
        d, ura, dt = self.downsample, self.use_running_average, self.dtype
        x = conv(64, 7, 1 + (d > 2), 3, dt, name="conv1")(x)
        x = Norm(self.norm_fn, 8, ura, dt, name="norm1")(x)
        x = nn.relu(x)
        x = _res_pair(64, 64, self.norm_fn, 1, ura, dt, "layer1")(x)
        x = _res_pair(64, 96, self.norm_fn, 1 + (d > 1), ura, dt, "layer2")(x)
        x = _res_pair(96, 128, self.norm_fn, 1 + (d > 0), ura, dt, "layer3")(x)

        v = None
        if dual_inp:
            v = x
            x = x[: x.shape[0] // 2]

        outputs08 = [
            _ConvOut(dim[2], self.norm_fn, ura, dt, name=f"outputs08_{i}")(x)
            for i, dim in enumerate(self.output_dim)
        ]
        if self.num_layers == 1:
            return (outputs08, v) if dual_inp else (outputs08,)

        y = _res_pair(128, 128, self.norm_fn, 2, ura, dt, "layer4")(x)
        outputs16 = [
            _ConvOut(dim[1], self.norm_fn, ura, dt, name=f"outputs16_{i}")(y)
            for i, dim in enumerate(self.output_dim)
        ]
        if self.num_layers == 2:
            return (outputs08, outputs16, v) if dual_inp else (outputs08, outputs16)

        z = _res_pair(128, 128, self.norm_fn, 2, ura, dt, "layer5")(y)
        outputs32 = [
            conv(dim[0], 3, 1, 1, dt, name=f"outputs32_{i}")(z)
            for i, dim in enumerate(self.output_dim)
        ]
        return (
            (outputs08, outputs16, outputs32, v)
            if dual_inp
            else (outputs08, outputs16, outputs32)
        )
