"""MobileNetV2-100 feature trunk (flax), as consumed by IGEV/CGI.

The reference taps timm ``mobilenetv2_100(features_only=True)`` blocks
[1,2,3,5,6] (meta_arch/igev_stereo/extractor.py:327-343), i.e. stages at
1/2 (16ch), 1/4 (24), 1/8 (32), 1/16 (96, stages 3+4 fused), 1/32 (160).
Rebuilt here with timm's module naming (conv_stem/bn1, blocks i.j with
conv_pw/conv_dw/conv_pwl) so pretrained timm weights can be mapped by the
.pth importer; without a checkpoint the trunk trains from scratch
(SURVEY.md §7 "hard parts": pretrained backbone port or retrain).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from dkt_stereo_tpu.nn.norms import Norm

he_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


def _conv(feat, k, s, name, dtype, groups=1):
    return nn.Conv(
        feat,
        (k, k),
        strides=(s, s),
        padding=[(k // 2, k // 2)] * 2,
        use_bias=False,
        feature_group_count=groups,
        kernel_init=he_out,
        dtype=dtype,
        name=name,
    )


class DepthwiseSeparable(nn.Module):
    """timm DepthwiseSeparableConv (first MNV2 stage, expansion 1)."""

    out_ch: int
    stride: int = 1
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ura, dt = self.use_running_average, self.dtype
        c = x.shape[-1]
        y = _conv(c, 3, self.stride, "conv_dw", dt, groups=c)(x)
        y = relu6(Norm("batch", None, ura, dt, name="bn1")(y))
        y = _conv(self.out_ch, 1, 1, "conv_pw", dt)(y)
        y = Norm("batch", None, ura, dt, name="bn2")(y)
        if self.stride == 1 and c == self.out_ch:
            y = y + x
        return y


class InvertedResidual(nn.Module):
    """timm InvertedResidual: pw-expand → dw → pw-linear, residual when
    stride 1 and channels match."""

    out_ch: int
    stride: int = 1
    expand: int = 6
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ura, dt = self.use_running_average, self.dtype
        c = x.shape[-1]
        mid = c * self.expand
        y = _conv(mid, 1, 1, "conv_pw", dt)(x)
        y = relu6(Norm("batch", None, ura, dt, name="bn1")(y))
        y = _conv(mid, 3, self.stride, "conv_dw", dt, groups=mid)(y)
        y = relu6(Norm("batch", None, ura, dt, name="bn2")(y))
        y = _conv(self.out_ch, 1, 1, "conv_pwl", dt)(y)
        y = Norm("batch", None, ura, dt, name="bn3")(y)
        if self.stride == 1 and c == self.out_ch:
            y = y + x
        return y


# (expansion, channels, repeats, first-stride) for mobilenetv2_100 stages 0-5
_MNV2_STAGES: Sequence[tuple] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
)


class MobileNetV2Trunk(nn.Module):
    """Stem + stages 0..5; returns [x2, x4, x8, x16, x32] feature maps with
    channels [16, 24, 32, 96, 160] (IGEV's tap points)."""

    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ura, dt = self.use_running_average, self.dtype
        x = _conv(32, 3, 2, "conv_stem", dt)(x)
        x = relu6(Norm("batch", None, ura, dt, name="bn1")(x))

        taps = []
        for si, (t, c, n, s) in enumerate(_MNV2_STAGES):
            for bi in range(n):
                stride = s if bi == 0 else 1
                name = f"blocks_{si}_{bi}"
                if t == 1:
                    x = DepthwiseSeparable(c, stride, ura, dt, name=name)(x)
                else:
                    x = InvertedResidual(c, stride, t, ura, dt, name=name)(x)
            if si in (0, 1, 2, 4, 5):  # x2, x4, x8, x16(after stage4), x32
                taps.append(x)
        return taps  # [x2(16), x4(24), x8(32), x16(96), x32(160)]
