"""3D convolution primitives over NDHWC volumes.

The reference's 3D aggregation stacks (GWCNet/IGEV hourglasses) use
``convbn_3d`` (gwcnet/submodules.py:12-15) and ``ConvTranspose3d(k=3, s=2,
p=1, output_padding=1)`` (gwc_main.py:130-136). XLA maps NDHWC conv3d onto
the MXU directly; the transposed conv is expressed as an input-dilated
forward conv with a spatially-flipped, IO-swapped kernel — numerically
identical to torch's (unit-tested in tests/test_conv3d.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from dkt_stereo_tpu.nn.norms import Norm

he_3d = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def Conv3D(features, kernel=3, stride=1, padding=1, use_bias=True, dtype=jnp.float32, name=None):
    """nn.Conv configured for NDHWC 3D convolution (no extra scope level —
    parameter paths stay flat for the .pth importer)."""
    k = (kernel,) * 3 if isinstance(kernel, int) else kernel
    s = (stride,) * 3 if isinstance(stride, int) else stride
    p = (padding,) * 3 if isinstance(padding, int) else padding
    return nn.Conv(
        features,
        k,
        strides=s,
        padding=[(pi, pi) for pi in p],
        use_bias=use_bias,
        kernel_init=he_3d,
        dtype=dtype,
        name=name,
    )


class RawConv3DParams(nn.Module):
    """Raw 3D conv parameters with nn.Conv's tree layout (kernel DHWIO
    [+ bias]) so :func:`thin_conv3d` call sites keep .pth-importable paths."""

    shape: tuple  # (kd, kh, kw, cin, cout)
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        k = self.param("kernel", he_3d, self.shape, jnp.float32)
        b = (
            self.param("bias", nn.initializers.zeros, (self.shape[-1],), jnp.float32)
            if self.use_bias
            else None
        )
        return k, b


def thin_conv3d(x, kernel, bias, dtype):
    """3×3×3 same-pad conv with FEW output channels as a full-lane matmul
    plus 27 shifted adds (3D analogue of nn/gru.py::thin_conv3x3).

    The disparity classifiers end in a (32→1)-channel conv3d over the full
    cost volume; a direct conv pads the output to a 128-lane MXU tile —
    ~6 ms/head at GWCNet eval geometry for ~5 real GFLOP. Here the MXU sees
    (B·D·H·W, cin) @ (cin, 27·cout) and the tap planes reduce with shifted
    adds on the VPU.
    """
    kd, kh, kw, cin, cout = kernel.shape
    B, D, H, W, _ = x.shape
    w = kernel.reshape(kd * kh * kw, cin, cout).transpose(1, 0, 2).reshape(cin, -1)
    z = jnp.einsum(
        "bdhwc,ck->bdhwk", x.astype(dtype), w.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    zp = jnp.pad(
        z, ((0, 0), (kd // 2, kd // 2), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0))
    )
    out = jnp.zeros((B, D, H, W, cout), jnp.float32)
    for i3 in range(kd):
        for i2 in range(kh):
            for i1 in range(kw):
                k = (i3 * kh + i2) * kw + i1
                out = out + jax.lax.slice(
                    zp,
                    (0, i3, i2, i1, k * cout),
                    (B, i3 + D, i2 + H, i1 + W, (k + 1) * cout),
                )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


class ConvBN3D(nn.Module):
    """convbn_3d: bias-free conv3d + BatchNorm (gwcnet/submodules.py:12-15)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv3D(self.features, self.kernel, self.stride, self.padding, False, self.dtype, name="conv")(x)
        return Norm("batch", None, self.use_running_average, self.dtype, name="bn")(x)


class ConvTranspose3DTorch(nn.Module):
    """torch ``ConvTranspose3d(k, stride, padding, output_padding)`` clone.

    y = conv(x up-dilated by stride, kernel flipped+IO-swapped) with per-side
    padding (k−1−p, k−1−p+output_padding). Weight stored in torch layout
    convention mapped to (k,k,k,O,I) so the .pth importer's HWIO transpose
    applies uniformly; flipped at call time."""

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s, p, op = self.kernel, self.stride, self.padding, self.output_padding
        in_ch = x.shape[-1]
        # stored as (k,k,k, out, in): torch (in,out,k,k,k).transpose(2,3,4,1,0)
        w = self.param("kernel", he_3d, (k, k, k, self.features, in_ch), jnp.float32)
        w_flip = jnp.flip(w, axis=(0, 1, 2))  # (k,k,k,O,I)
        w_conv = jnp.swapaxes(w_flip, -1, -2)  # → (k,k,k,I,O) for DHWIO
        pad = [(k - 1 - p, k - 1 - p + op)] * 3
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w_conv.astype(self.dtype),
            window_strides=(1, 1, 1),
            padding=pad,
            lhs_dilation=(s, s, s),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32).astype(self.dtype)
        return y


class Hourglass3D(nn.Module):
    """GWCNet 3D hourglass (gwc_main.py:116-152): two stride-2 encoders, two
    transposed-conv decoders with BN, redir skip connections."""

    channels: int
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c, ura, dt = self.channels, self.use_running_average, self.dtype
        conv1 = nn.relu(ConvBN3D(c * 2, 3, 2, 1, ura, dt, name="conv1")(x))
        conv2 = nn.relu(ConvBN3D(c * 2, 3, 1, 1, ura, dt, name="conv2")(conv1))
        conv3 = nn.relu(ConvBN3D(c * 4, 3, 2, 1, ura, dt, name="conv3")(conv2))
        conv4 = nn.relu(ConvBN3D(c * 4, 3, 1, 1, ura, dt, name="conv4")(conv3))
        up5 = ConvTranspose3DTorch(c * 2, 3, 2, 1, 1, False, dt, name="conv5_deconv")(conv4)
        up5 = Norm("batch", None, ura, dt, name="conv5_bn")(up5)
        redir2 = ConvBN3D(c * 2, 1, 1, 0, ura, dt, name="redir2")(conv2)
        conv5 = nn.relu(up5 + redir2)
        up6 = ConvTranspose3DTorch(c, 3, 2, 1, 1, False, dt, name="conv6_deconv")(conv5)
        up6 = Norm("batch", None, ura, dt, name="conv6_bn")(up6)
        redir1 = ConvBN3D(c, 1, 1, 0, ura, dt, name="redir1")(x)
        return nn.relu(up6 + redir1)
