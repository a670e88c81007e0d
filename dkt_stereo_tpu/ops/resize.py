"""Resizing / pooling ops with torch-parity semantics, MXU-friendly.

``interp_bilinear_align`` reproduces ``F.interpolate(mode='bilinear',
align_corners=True)`` (used by the update block's cross-scale exchange,
core/update.py:93-95, and ``upflow8`` core/utils/utils.py:83-85). Instead of a
gather, it is expressed as two small dense matmuls (separable interpolation):
``out = R @ img @ C^T`` with static (dst, src) weight matrices — this runs on
the MXU and needs no dynamic indexing at all.

``avg_pool2d`` matches torch ``F.avg_pool2d`` with
``count_include_pad=True`` (the torch default, used by ``pool2x``
core/update.py:87-88 and the corr pyramid's [1,2] pooling core/corr.py:124).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _linear_interp_matrix(dst: int, src: int, dtype=np.float32) -> np.ndarray:
    """(dst, src) row-stochastic matrix for 1D align_corners=True resize."""
    if src == 1:
        return np.ones((dst, 1), dtype=dtype)
    if dst == 1:
        m = np.zeros((1, src), dtype=dtype)
        m[0, 0] = 1.0
        return m
    pos = np.arange(dst, dtype=np.float64) * (src - 1) / (dst - 1)
    lo = np.floor(pos).astype(np.int64)
    lo = np.minimum(lo, src - 2)
    w = pos - lo
    m = np.zeros((dst, src), dtype=dtype)
    m[np.arange(dst), lo] = (1.0 - w).astype(dtype)
    m[np.arange(dst), lo + 1] = w.astype(dtype)
    return m


def _interp_rows_banded(x, Ho, ctx):
    """align_corners row interpolation under exact banded eval: the
    full-image grid positions restricted to this band's rows.

    align_corners maps output row o → o·(Hin−1)/(Hout−1) where Hin/Hout are
    the WHOLE image's heights — a height-dependent, non-band-local map, so
    applying the per-band matrix would diverge from the full-image forward
    everywhere (not just at band edges). Here global row indices come from
    the band's window offset (traced via the band axis index) and the
    gather stays inside the band because the ×2 cross-scale exchanges move
    source positions by well under the halo."""
    th, halo, bh, fh = ctx["th"], ctx["halo"], ctx["bh"], ctx["fh"]
    H = x.shape[1]
    s_in, s_out = th // H, th // Ho
    k = jax.lax.axis_index(ctx["axis"])
    win0 = jnp.clip(k * bh - halo, 0, fh - th)
    hin_g, hout_g = fh // s_in, fh // s_out
    o = jnp.arange(Ho, dtype=jnp.float32) + (win0 // s_out).astype(jnp.float32)
    p = o * (hin_g - 1) / max(hout_g - 1, 1) - (win0 // s_in).astype(jnp.float32)
    p0 = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, H - 2)
    w = (p - p0.astype(jnp.float32)).astype(x.dtype)[None, :, None, None]
    lo = jnp.take(x, p0, axis=1)
    hi_ = jnp.take(x, p0 + 1, axis=1)
    return lo * (1 - w) + hi_ * w


def interp_bilinear_align(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear align_corners=True resize of NHWC ``x`` to (Ho, Wo)."""
    from dkt_stereo_tpu.nn import norms as _norms

    _, H, W, _ = x.shape
    Ho, Wo = out_hw
    if (Ho, Wo) == (H, W):
        return x
    ctx = _norms._BAND_STATS
    if (
        ctx is not None
        and H != Ho
        and ctx["th"] % H == 0
        and ctx["th"] % Ho == 0
        and ctx["fh"] % (ctx["th"] // H) == 0
        and ctx["fh"] % (ctx["th"] // Ho) == 0
    ):
        x = _interp_rows_banded(x, Ho, ctx)
        if Wo == W:
            return x
        C = jnp.asarray(_linear_interp_matrix(Wo, W))
        hi = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
        return jnp.einsum("pw,bowc->bopc", C.astype(x.dtype), x, precision=hi)
    R = jnp.asarray(_linear_interp_matrix(Ho, H))
    C = jnp.asarray(_linear_interp_matrix(Wo, W))
    # (B,H,W,C) -> rows: contract H with R^T -> (B,Ho,W,C)
    # HIGHEST for fp32 (parity-critical); bf16 activations (inside the GRU
    # scan) use the native MXU path — HIGHEST on bf16 triggers the expensive
    # multi-pass emulation for no accuracy benefit
    hi = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    y = jnp.einsum("oh,bhwc->bowc", R.astype(x.dtype), x, precision=hi)
    y = jnp.einsum("pw,bowc->bopc", C.astype(x.dtype), y, precision=hi)
    return y


def upflow(flow: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """``upflow8`` (core/utils/utils.py:83-85): bilinear ×factor and scale values."""
    _, H, W, _ = flow.shape
    return factor * interp_bilinear_align(flow, (factor * H, factor * W))


def avg_pool2d(
    x: jnp.ndarray,
    window: tuple[int, int],
    stride: tuple[int, int],
    padding: tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """torch-style average pool over NHWC, count_include_pad=True.

    Implemented as a depthwise convolution with a constant 1/(kh·kw) kernel
    rather than ``lax.reduce_window``: reduce_window's linearization fails
    inside ``lax.scan`` bodies (JAX 0.9 issue hit by our GRU update scan),
    while the conv path differentiates everywhere and maps well to TPU.
    """
    kh, kw = window
    sh, sw = stride
    ph, pw = padding
    C = x.shape[-1]
    kernel = jnp.full((kh, kw, 1, C), 1.0 / (kh * kw), x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def pool2x(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 pad-1 average pool (core/update.py:87-88)."""
    return avg_pool2d(x, (3, 3), (2, 2), (1, 1))


def _halfpix_interp_matrix(dst: int, src: int, dtype=np.float32) -> np.ndarray:
    """(dst, src) matrix for align_corners=False (half-pixel) linear resize —
    torch F.interpolate default semantics (edge-clamped)."""
    if src == 1:
        return np.ones((dst, 1), dtype=dtype)
    scale = src / dst
    pos = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    lo = np.floor(pos).astype(np.int64)
    w = pos - lo
    lo0 = np.clip(lo, 0, src - 1)
    lo1 = np.clip(lo + 1, 0, src - 1)
    m = np.zeros((dst, src), dtype=dtype)
    np.add.at(m, (np.arange(dst), lo0), (1.0 - w).astype(dtype))
    np.add.at(m, (np.arange(dst), lo1), w.astype(dtype))
    return m


def interp_trilinear_halfpix(x: jnp.ndarray, out_dhw: tuple[int, int, int]) -> jnp.ndarray:
    """Trilinear align_corners=False resize of NDHWC ``x`` — matches torch
    ``F.interpolate(mode='trilinear')`` (GWCNet cost upsample,
    gwc_main.py:248-263). Three separable matmuls."""
    _, D, H, W, _ = x.shape
    Do, Ho, Wo = out_dhw
    hi = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    y = x
    if Do != D:
        M = jnp.asarray(_halfpix_interp_matrix(Do, D), x.dtype)
        y = jnp.einsum("od,bdhwc->bohwc", M, y, precision=hi)
    if Ho != H:
        M = jnp.asarray(_halfpix_interp_matrix(Ho, H), x.dtype)
        y = jnp.einsum("oh,bdhwc->bdowc", M, y, precision=hi)
    if Wo != W:
        M = jnp.asarray(_halfpix_interp_matrix(Wo, W), x.dtype)
        y = jnp.einsum("ow,bdhwc->bdhoc", M, y, precision=hi)
    return y


def interp_bilinear_halfpix(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear align_corners=False resize of NHWC ``x`` (torch default)."""
    _, H, W, _ = x.shape
    Ho, Wo = out_hw
    hi = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    y = x
    if Ho != H:
        M = jnp.asarray(_halfpix_interp_matrix(Ho, H), x.dtype)
        y = jnp.einsum("oh,bhwc->bowc", M, y, precision=hi)
    if Wo != W:
        M = jnp.asarray(_halfpix_interp_matrix(Wo, W), x.dtype)
        y = jnp.einsum("ow,bhwc->bhoc", M, y, precision=hi)
    return y


def interp_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize (torch F.interpolate mode='nearest': floor(i*src/dst))."""
    _, H, W, _ = x.shape
    Ho, Wo = out_hw
    ri = (np.arange(Ho) * H // Ho).astype(np.int32)
    ci = (np.arange(Wo) * W // Wo).astype(np.int32)
    return x[:, ri][:, :, ci]


def pool4x(x: jnp.ndarray) -> jnp.ndarray:
    """5x5 stride-4 pad-1 average pool (core/update.py:90-91)."""
    return avg_pool2d(x, (5, 5), (4, 4), (1, 1))
