"""PSMNet-style 2D feature extraction for GWCNet.

Rebuild of meta_arch/gwcnet/gwc_main.py:40-115 / submodules.py:6-9,60-83:
``convbn`` (bias-free conv + BN, padding=dilation when dilated), dilated
``BasicBlock`` residuals, and the 4-stage trunk whose l2∥l3∥l4 concat gives
the 320-channel group-wise correlation features at 1/4 resolution.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from dkt_stereo_tpu.nn.norms import Norm

he_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class ConvBN(nn.Module):
    """convbn (gwcnet/submodules.py:6-9)."""

    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        padding = self.dilation if self.dilation > 1 else self.pad
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(padding, padding)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            kernel_init=he_out,
            dtype=self.dtype,
            name="conv",
        )(x)
        return Norm("batch", None, self.use_running_average, self.dtype, name="bn")(x)


class PSMBasicBlock(nn.Module):
    """BasicBlock (gwcnet/submodules.py:60-83). NB: no ReLU after the add."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ura, dt = self.use_running_average, self.dtype
        out = nn.relu(ConvBN(self.planes, 3, self.stride, 1, self.dilation, ura, dt, name="conv1")(x))
        out = ConvBN(self.planes, 3, 1, 1, self.dilation, ura, dt, name="conv2")(out)
        if self.has_downsample:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, kernel_init=he_out, dtype=dt, name="downsample_conv")(x)
            x = Norm("batch", None, ura, dt, name="downsample_bn")(x)
        return out + x


class FeatureExtractionPSM(nn.Module):
    """gwc_main.py:59-115. Returns dict(gwc_feature[, concat_feature])."""

    concat_feature: bool = False
    concat_feature_channel: int = 12
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    def _layer(self, x, planes, blocks, stride, dilation, in_planes, name):
        has_ds = stride != 1 or in_planes != planes
        x = PSMBasicBlock(planes, stride, dilation, has_ds,
                          self.use_running_average, self.dtype, name=f"{name}_0")(x)
        for i in range(1, blocks):
            x = PSMBasicBlock(planes, 1, dilation, False,
                              self.use_running_average, self.dtype, name=f"{name}_{i}")(x)
        return x

    @nn.compact
    def __call__(self, x):
        ura, dt = self.use_running_average, self.dtype
        for i in range(3):
            x = nn.relu(ConvBN(32, 3, 2 if i == 0 else 1, 1, 1, ura, dt, name=f"firstconv_{i}")(x))
        x = self._layer(x, 32, 3, 1, 1, 32, "layer1")
        l2 = self._layer(x, 64, 16, 2, 1, 32, "layer2")
        l3 = self._layer(l2, 128, 3, 1, 1, 64, "layer3")
        l4 = self._layer(l3, 128, 3, 1, 2, 128, "layer4")
        gwc = jnp.concatenate([l2, l3, l4], axis=-1)  # 320 ch @ 1/4
        out = {"gwc_feature": gwc}
        if self.concat_feature:
            y = nn.relu(ConvBN(128, 3, 1, 1, 1, ura, dt, name="lastconv_0")(gwc))
            y = nn.Conv(self.concat_feature_channel, (1, 1), use_bias=False,
                        kernel_init=he_out, dtype=dt, name="lastconv_1")(y)
            out["concat_feature"] = y
        return out
