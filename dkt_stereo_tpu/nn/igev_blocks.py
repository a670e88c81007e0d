"""IGEV building blocks (rebuild of meta_arch/igev_stereo/submodule.py +
extractor.py Feature fusion + igev_stereo.py hourglass).

BasicConv / BasicConv_IN (submodule.py:10-36, 84-107): conv or torch-parity
deconv (2D/3D), BatchNorm or InstanceNorm, LeakyReLU(0.01).
Conv2x / Conv2x_IN (:39-80, 110-150): stride-2 (de)conv + concat/add fusion.
FeatureAtt (submodule.py:227-240): sigmoid channel attention over the cost
volume broadcast along D. HourglassIGEV (igev_stereo.py:22-89).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from dkt_stereo_tpu.nn.blocks import kaiming_out
from dkt_stereo_tpu.nn.norms import InstanceNorm, Norm
from dkt_stereo_tpu.ops.resize import interp_nearest


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=0.01)


class ConvTransposeTorch(nn.Module):
    """torch ConvTranspose{2,3}d clone (input-dilated conv with flipped,
    IO-swapped kernel). ``dims``: 2 or 3. Kernel stored (k..., O, I) so the
    importer's uniform transpose applies."""

    features: int
    dims: int = 2
    kernel: tuple | int = 4
    stride: tuple | int = 2
    padding: tuple | int = 1
    output_padding: int = 0
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nd = self.dims
        k = (self.kernel,) * nd if isinstance(self.kernel, int) else tuple(self.kernel)
        s = (self.stride,) * nd if isinstance(self.stride, int) else tuple(self.stride)
        p = (self.padding,) * nd if isinstance(self.padding, int) else tuple(self.padding)
        in_ch = x.shape[-1]
        w = self.param("kernel", kaiming_out, (*k, self.features, in_ch), jnp.float32)
        w_flip = jnp.flip(w, axis=tuple(range(nd)))
        w_conv = jnp.swapaxes(w_flip, -1, -2)
        pad = [(ki - 1 - pi, ki - 1 - pi + self.output_padding) for ki, pi in zip(k, p)]
        dn = ("NHWC", "HWIO", "NHWC") if nd == 2 else ("NDHWC", "DHWIO", "NDHWC")
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w_conv.astype(self.dtype),
            window_strides=(1,) * nd,
            padding=pad,
            lhs_dilation=s,
            dimension_numbers=dn,
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32).astype(self.dtype)
        return y


class _RawKernelParam(nn.Module):
    """Bare conv kernel parameter with an nn.Conv/ConvTransposeTorch scope
    path ({name}/kernel) — lets the d2l-packed conv path below keep the
    exact parameter tree of the direct path (checkpoint interchange)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", kaiming_out, self.shape, jnp.float32)


class BasicConvIGEV(nn.Module):
    """BasicConv / BasicConv_IN unified: norm in {"batch", "instance", None}.

    ``packed=True`` (dims==3 only): input/output volumes are depth-to-lane
    packed (B,H,W,D,C) and the conv runs as ONE full-lane 2D conv
    (nn/conv3d_packed.py) — same parameter tree, same math."""

    features: int
    deconv: bool = False
    dims: int = 2
    norm: str | None = "batch"
    relu: bool = True
    kernel: tuple | int = 3
    stride: tuple | int = 1
    padding: tuple | int = 1
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x):
        nd = self.dims
        if self.packed and nd == 3:
            from dkt_stereo_tpu.nn.conv3d_packed import conv3d_packed, deconv3d_packed

            k = (self.kernel,) * 3 if isinstance(self.kernel, int) else tuple(self.kernel)
            s = (self.stride,) * 3 if isinstance(self.stride, int) else tuple(self.stride)
            p = (self.padding,) * 3 if isinstance(self.padding, int) else tuple(self.padding)
            if self.deconv:
                w = _RawKernelParam((*k, self.features, x.shape[-1]), name="conv")()
                x = deconv3d_packed(x, w, s, p, dtype=self.dtype)
            else:
                w = _RawKernelParam((*k, x.shape[-1], self.features), name="conv")()
                x = conv3d_packed(x, w, s, p, dtype=self.dtype)
        elif self.deconv:
            x = ConvTransposeTorch(
                self.features, nd, self.kernel, self.stride, self.padding,
                0, False, self.dtype, name="conv",
            )(x)
        else:
            k = (self.kernel,) * nd if isinstance(self.kernel, int) else tuple(self.kernel)
            s = (self.stride,) * nd if isinstance(self.stride, int) else tuple(self.stride)
            p = (self.padding,) * nd if isinstance(self.padding, int) else tuple(self.padding)
            x = nn.Conv(
                self.features, k, strides=s, padding=[(pi, pi) for pi in p],
                use_bias=False, kernel_init=kaiming_out, dtype=self.dtype, name="conv",
            )(x)
        if self.norm == "batch":
            x = Norm("batch", None, self.use_running_average, self.dtype, name="bn")(x)
        elif self.norm == "instance":
            # torch InstanceNorm2d/3d via the shared module so the banded
            # eval's cross_band_stats context hooks these norms too
            # (eval/tiled.py::banded_forward_exact)
            x = InstanceNorm()(x)
        if self.relu:
            x = leaky_relu(x)
        return x


class Conv2xIGEV(nn.Module):
    """Conv2x / Conv2x_IN: stride-2 (de)conv then concat(+conv) with skip."""

    features: int
    deconv: bool = False
    dims: int = 2
    concat: bool = True
    keep_concat: bool = True
    norm: str | None = "batch"
    relu: bool = True
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rem):
        kernel = 4 if self.deconv else 3
        x = BasicConvIGEV(
            self.features, self.deconv, self.dims, self.norm if self.norm else "batch",
            True, kernel, 2, 1, self.use_running_average, self.dtype, name="conv1",
        )(x)
        if x.shape[1:-1] != rem.shape[1:-1]:
            assert self.dims == 2
            x = interp_nearest(x, rem.shape[1:3])
        if self.concat:
            x = jnp.concatenate([x, rem], axis=-1)
            mul = 2 if self.keep_concat else 1
            out_ch = self.features * mul
        else:
            x = x + rem
            out_ch = self.features
        return BasicConvIGEV(
            out_ch, False, self.dims, self.norm, self.relu, 3, 1, 1,
            self.use_running_average, self.dtype, name="conv2",
        )(x)


class FeatureAtt(nn.Module):
    """submodule.py:227-240: cv ← sigmoid(att(feat)) ⊙ cv (broadcast over D).

    ``packed=True``: cv arrives depth-to-lane packed (B,H,W,D,C); the
    attention map broadcasts over axis 3 instead of axis 1."""

    cv_chan: int
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, cv, feat):
        feat_ch = feat.shape[-1]
        a = BasicConvIGEV(feat_ch // 2, False, 2, "batch", True, 1, 1, 0,
                          self.use_running_average, self.dtype, name="feat_att_0")(feat)
        a = nn.Conv(self.cv_chan, (1, 1), use_bias=True, kernel_init=kaiming_out,
                    dtype=self.dtype, name="feat_att_1")(a)
        if self.packed:
            return nn.sigmoid(a)[:, :, :, None] * cv  # (B,H,W,1,C) ⊙ (B,H,W,D,C)
        return nn.sigmoid(a)[:, None] * cv  # (B,1,H,W,C) ⊙ (B,D,H,W,C)


class HourglassIGEV(nn.Module):
    """igev_stereo.py:22-89: 3-level 3D encoder-decoder with FeatureAtt at
    every scale; ``features``: [x4, x8, x16, x32] 2D maps.

    ``packed=True``: the volume flows depth-to-lane packed (B,H,W,D,C)
    end-to-end — the concats/attention broadcasts are layout-agnostic on
    the trailing C axis, so only the conv primitive changes."""

    in_channels: int
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x, features):
        c, ura, dt, pk = self.in_channels, self.use_running_average, self.dtype, self.packed

        def bc(feat, name, deconv=False, kernel=3, stride=1, pad=1, norm="batch", relu=True):
            return BasicConvIGEV(feat, deconv, 3, norm, relu, kernel, stride, pad, ura, dt, pk, name=name)

        conv1 = bc(c * 2, "conv1_0", stride=2)(x)
        conv1 = bc(c * 2, "conv1_1")(conv1)
        conv1 = FeatureAtt(c * 2, ura, dt, pk, name="feature_att_8")(conv1, features[1])

        conv2 = bc(c * 4, "conv2_0", stride=2)(conv1)
        conv2 = bc(c * 4, "conv2_1")(conv2)
        conv2 = FeatureAtt(c * 4, ura, dt, pk, name="feature_att_16")(conv2, features[2])

        conv3 = bc(c * 6, "conv3_0", stride=2)(conv2)
        conv3 = bc(c * 6, "conv3_1")(conv3)
        conv3 = FeatureAtt(c * 6, ura, dt, pk, name="feature_att_32")(conv3, features[3])

        conv3_up = bc(c * 4, "conv3_up", deconv=True, kernel=4, stride=2, pad=1)(conv3)
        conv2 = jnp.concatenate([conv3_up, conv2], axis=-1)
        conv2 = bc(c * 4, "agg_0_0", kernel=1, pad=0)(conv2)
        conv2 = bc(c * 4, "agg_0_1")(conv2)
        conv2 = bc(c * 4, "agg_0_2")(conv2)
        conv2 = FeatureAtt(c * 4, ura, dt, pk, name="feature_att_up_16")(conv2, features[2])

        conv2_up = bc(c * 2, "conv2_up", deconv=True, kernel=4, stride=2, pad=1)(conv2)
        conv1 = jnp.concatenate([conv2_up, conv1], axis=-1)
        conv1 = bc(c * 2, "agg_1_0", kernel=1, pad=0)(conv1)
        conv1 = bc(c * 2, "agg_1_1")(conv1)
        conv1 = bc(c * 2, "agg_1_2")(conv1)
        conv1 = FeatureAtt(c * 2, ura, dt, pk, name="feature_att_up_8")(conv1, features[1])

        # final up: 8 channels, no bn/relu (igev_stereo.py:48-49)
        return BasicConvIGEV(8, True, 3, None, False, 4, 2, 1, ura, dt, pk, name="conv1_up")(conv1)


class IGEVFeature(nn.Module):
    """extractor.py:326-361: MobileNetV2 taps + U-Net style deconv fusion
    (instance-norm Conv2x). Returns [x4(48), x8(64), x16(192), x32(160)]."""

    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from dkt_stereo_tpu.nn.mobilenetv2 import MobileNetV2Trunk

        ura, dt = self.use_running_average, self.dtype
        x2, x4, x8, x16, x32 = MobileNetV2Trunk(ura, dt, name="trunk")(x)
        x16 = Conv2xIGEV(96, True, 2, True, True, "instance", True, ura, dt, name="deconv32_16")(x32, x16)
        x8 = Conv2xIGEV(32, True, 2, True, True, "instance", True, ura, dt, name="deconv16_8")(x16, x8)
        x4 = Conv2xIGEV(24, True, 2, True, True, "instance", True, ura, dt, name="deconv8_4")(x8, x4)
        x4 = BasicConvIGEV(48, False, 2, "instance", True, 3, 1, 1, ura, dt, name="conv4")(x4)
        return [x4, x8, x16, x32]
