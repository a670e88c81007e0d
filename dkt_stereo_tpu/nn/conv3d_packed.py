"""Depth-to-lane ("d2l") packed 3D convolution for cost-volume aggregation.

The IGEV/GWCNet aggregation stacks run 3D convs with 8-48 channels over
(B, D, H, W, C) volumes (meta_arch/igev_stereo/igev_stereo.py:22-89,
submodule.py:10-36). On TPU a direct NDHWC conv3d with C=8 fills 8/128 of
the MXU lanes — measured ~1 TF/s against the chip's 135 (IGEV_PROF_r05:
corr_stem 12.6 ms for ~10 GFLOP). This module folds the ENTIRE disparity
axis into the lane dimension instead:

  volume      (B, H, W, D, C)  — reshape-free view (B, H, W, D*C)
  conv3d      ONE 2D conv whose (kh, kw, D_in*Ci, D_out*Co) kernel carries
              the D-axis band structure: kernel2d[(di,ci),(do,co)] =
              k3d[di-do*sd+pd, ci, co] where defined, 0 elsewhere.

D*C is 288-768 lanes for every IGEV hourglass level, so the MXU runs full.
The dense matmul multiplies the structural zeros too (a D_out/kd-fold FLOP
overhead), but a full-lane conv at ~100 TF/s beats a 6%-occupancy one at
~1 TF/s by an order of magnitude; measured on chip the packed stack is
~5-8x faster per stage (docs/PERF.md round 5).

Because the D axis lives in the channel matrix, ANY D-axis stride /
transpose / padding is just a different static 0/1 selection tensor —
stride-2 downsampling and the 4x4x4 stride-2 transposed convs of the
hourglass need no special casing. H/W keep ordinary conv stride /
lhs_dilation semantics.

Exactness: the packed kernel is the 3D kernel scattered into zeros, so the
conv computes the same sums plus exact-zero terms — bit-differences vs the
NDHWC path are accumulation-order only (unit-tested: tests/test_igev_packed.py).
Parameter trees are untouched: call sites pass the same (kd,kh,kw,Ci,Co)
kernels (nn.Conv layout) or (kd,kh,kw,O,I) (ConvTransposeTorch layout), so
.pth checkpoint import is unaffected.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _sel_conv(d_in: int, kd: int, stride: int, pad: int) -> np.ndarray:
    """(kd, D_in, D_out) 0/1 selector for a strided, zero-padded conv."""
    d_out = (d_in + 2 * pad - kd) // stride + 1
    sel = np.zeros((kd, d_in, d_out), np.float32)
    for do in range(d_out):
        for dd in range(kd):
            di = do * stride + dd - pad
            if 0 <= di < d_in:
                sel[dd, di, do] = 1.0
    return sel


@functools.lru_cache(maxsize=None)
def _sel_deconv(d_in: int, kd: int, stride: int, pad: int, output_padding: int) -> np.ndarray:
    """(kd, D_in, D_out) selector for torch ConvTranspose semantics:
    out[do] += in[di] * k[dd] where do = di*stride - pad + dd."""
    d_out = (d_in - 1) * stride - 2 * pad + kd + output_padding
    sel = np.zeros((kd, d_in, d_out), np.float32)
    for di in range(d_in):
        for dd in range(kd):
            do = di * stride + dd - pad
            if 0 <= do < d_out:
                sel[dd, di, do] = 1.0
    return sel


def _banded_kernel(sel: np.ndarray, k3d: jnp.ndarray) -> jnp.ndarray:
    """sel (kd,Din,Dout), k3d (kd,kh,kw,Ci,Co) → (kh,kw,Din*Ci,Dout*Co).

    Built in fp32 (exact: sel is 0/1) each apply — a ~1 MFLOP einsum,
    negligible next to the conv, and differentiable back to k3d."""
    kd, kh, kw, ci, co = k3d.shape
    _, d_in, d_out = sel.shape
    k2d = jnp.einsum("dio,dhwcf->hwicof", jnp.asarray(sel), k3d.astype(jnp.float32))
    return k2d.reshape(kh, kw, d_in * ci, d_out * co)


def conv3d_packed(x, kernel, stride=(1, 1, 1), padding=(1, 1, 1), dtype=jnp.float32):
    """x (B,H,W,D,Ci), kernel (kd,kh,kw,Ci,Co) [nn.Conv DHWIO layout]
    → (B,Ho,Wo,Dout,Co). Bias-free (the aggregation stacks never use one)."""
    kd, kh, kw, ci, co = kernel.shape
    sd, sh, sw = stride
    pd, ph, pw = padding
    B, H, W, D, _ = x.shape
    sel = _sel_conv(D, kd, sd, pd)
    k2d = _banded_kernel(sel, kernel)
    y = jax.lax.conv_general_dilated(
        x.reshape(B, H, W, D * ci).astype(dtype),
        k2d.astype(dtype),
        window_strides=(sh, sw),
        padding=[(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    d_out = sel.shape[-1]
    return y.reshape(*y.shape[:3], d_out, co)


def thin_conv3d_packed(x, kernel, stride_d=1, pad_d=1, dtype=jnp.float32):
    """3×3×3 conv with Co=1 on a packed volume → (B,H,W,Dout).

    The banded 2D kernel has only D_out=48 output lanes — a direct conv
    underfills N (measured 6.2 ms for the IGEV init classifier). Routing it
    through nn/gru.py::thin_conv3x3 instead (z = x @ W(D·Ci, 9·D_out), one
    full-lane matmul, then 9 shifted VPU adds) runs the same math at full
    MXU occupancy."""
    from dkt_stereo_tpu.nn.gru import thin_conv3x3

    kd, kh, kw, ci, co = kernel.shape
    assert co == 1
    B, H, W, D, _ = x.shape
    sel = _sel_conv(D, kd, stride_d, pad_d)
    k2d = _banded_kernel(sel, kernel)  # (kh, kw, D*Ci, Dout)
    d_out = sel.shape[-1]
    zero_b = jnp.zeros((d_out,), jnp.float32)
    return thin_conv3x3(x.reshape(B, H, W, D * ci), k2d, zero_b, dtype)


def deconv3d_packed(
    x, kernel, stride=(2, 2, 2), padding=(1, 1, 1), output_padding=(0, 0, 0),
    dtype=jnp.float32,
):
    """Torch ConvTranspose3d on a packed volume. x (B,H,W,D,Ci), kernel
    (kd,kh,kw,O,I) [ConvTransposeTorch storage layout] → (B,Ho,Wo,Dout,O).

    H/W run as a gather conv (spatially flipped kernel + lhs_dilation, as
    nn/conv3d.py::ConvTranspose3DTorch); the D axis uses the scatter
    relation directly in the selector (no flip)."""
    kd, kh, kw, o_ch, i_ch = kernel.shape
    sd, sh, sw = stride
    pd, ph, pw = padding
    opd, oph, opw = output_padding
    B, H, W, D, _ = x.shape
    sel = _sel_deconv(D, kd, sd, pd, opd)
    kf = jnp.swapaxes(jnp.flip(kernel, axis=(1, 2)), -1, -2)  # (kd,kh,kw,I,O)
    k2d = _banded_kernel(sel, kf)
    y = jax.lax.conv_general_dilated(
        x.reshape(B, H, W, D * i_ch).astype(dtype),
        k2d.astype(dtype),
        window_strides=(1, 1),
        padding=[(kh - 1 - ph, kh - 1 - ph + oph), (kw - 1 - pw, kw - 1 - pw + opw)],
        lhs_dilation=(sh, sw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    d_out = sel.shape[-1]
    return y.reshape(*y.shape[:3], d_out, o_ch)
