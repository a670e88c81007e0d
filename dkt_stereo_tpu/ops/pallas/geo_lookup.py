"""Pallas TPU kernel: fused combined geometry-encoding volume lookup (IGEV).

Device-side counterpart of ops/geometry.py (reference:
meta_arch/igev_stereo/geometry.py:34-58): per iteration, sample
  (a) the C-channel geo volume along disparity at ``disp/2^i ± r``,
  (b) the init correlation volume along width at ``(coords−disp)/2^i ± r``.
Channel order matches the XLA path: per level [geo C-major taps-fast
(C·(2r+1)) | corr (2r+1)].

Mosaic-shaped design notes (each constraint was hit in practice):
  - geo rows are processed d-major flattened (W1, D·C): C=8 on the lane axis
    alone pads 16× and blows VMEM; in-kernel shape casts between (W1, D·C)
    and (W1, D, C) are unsupported, so tap weights use flattened d-indices
    (iota // C) and the per-channel reduction / layout permutation are
    constant one-hot matmuls;
  - one pallas_call **per level**, with W1 additionally chunked into
    128-multiple blocks under a byte budget (`_VMEM_BYTES`): at IGEV eval
    geometry (184×320, D=48) the unchunked level-0 blocks cost
    8·320·(384+320)·4·2(double-buffer) ≈ 19MB and Mosaic's 16MB scoped-VMEM
    allocator rejects the kernel — caught compiled-on-chip by
    scripts/validate_kernels.py, invisible in interpret mode;
  - the one-hot matmuls need fp32-faithful products: one operand is fp32
    VALUES (geo·w), and the MXU default rounds fp32 operands to bf16 —
    ~4e-3 relative error vs the XLA path's fp32-correlation policy.
    Precision.HIGHEST fixes that but runs SIX MXU passes — measured
    128 ms/32-iter at eval geometry, 49 ms at DEFAULT (round 4). The
    :func:`_dot_f32` bf16×2 split (hi = bf16(x), lo = x − hi, fp32
    accumulation) runs TWO passes instead: hi and the 0/1 selector side
    are exactly representable, while lo still loses ~8 mantissa bits to
    the MXU's bf16 operand truncation, so the product is reproduced to
    ~2⁻¹⁸ relative — NOT bit-exact fp32. This deliberately relaxes the
    earlier exact-HIGHEST path for near-DEFAULT speed; the ~2⁻¹⁸ bound
    sits far inside the 1e-4 KERNELS_r04 validation bound.

VJP returns gradients for both pyramids (disp/coords are detached each
iteration, igev_stereo.py:201).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dkt_stereo_tpu.ops.pallas.corr_alt import _pick_cols
from dkt_stereo_tpu.ops.pallas.corr_lookup import _pick_rows

# Per-program budget for the big (R, W1c, DC) + (R, W1c, W2) input blocks,
# in BYTES (same rationale as corr_lookup._VMEM_BYTES: double buffering +
# in-kernel fp32 temps must stay under Mosaic's 16MB scoped-VMEM stack).
_VMEM_BYTES = 3_400_000

_HI = jax.lax.Precision.HIGHEST


def _dot_f32(x, m):
    """fp32-faithful ``x @ m`` in two DEFAULT-precision MXU passes.

    hi = bf16(x) is exactly representable (truncation is the identity on
    it), lo = x − hi carries the remaining ~8 mantissa bits; both dots
    accumulate in fp32, so the sum matches Precision.HIGHEST to ~2⁻¹⁸
    relative at a third of its pass count. ``m`` (0/1 one-hots here) is
    exactly representable by construction."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    lo = x - hi
    return jnp.dot(hi, m, preferred_element_type=jnp.float32) + jnp.dot(
        lo, m, preferred_element_type=jnp.float32
    )


def _perm_kc_to_ck(taps: int, C: int) -> jnp.ndarray:
    """(taps*C, C*taps) one-hot permutation: column k*C+c → c*taps+k."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (taps * C, C * taps), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (taps * C, C * taps), 1)
    want = (rows % C) * taps + rows // C
    return (cols == want).astype(jnp.float32)


def _fwd_level_kernel(disp_ref, coords_ref, geo_ref, corr_ref, out_ref,
                      radius: int, level: int, C: int):
    R, W1 = disp_ref.shape
    taps = 2 * radius + 1
    scale = 1.0 / (2**level)

    for r in range(R):
        geo_flat = geo_ref[r].astype(jnp.float32)  # (W1, D*C)
        DC = geo_flat.shape[-1]
        jflat = jax.lax.broadcasted_iota(jnp.int32, (1, DC), 1)
        jd = (jflat // C).astype(jnp.float32)
        sel = (
            (jflat % C)[0][:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)[0][None, :]
        ).astype(jnp.float32)  # (DC, C)
        x = disp_ref[r].astype(jnp.float32) * scale  # (W1,)
        geo_taps = []
        for k in range(taps):
            pos = x[:, None] + (k - radius)
            w = jnp.maximum(1.0 - jnp.abs(jd - pos), 0.0)
            geo_taps.append(_dot_f32(geo_flat * w, sel))
        g_km = jnp.concatenate(geo_taps, axis=-1)  # k-major (W1, taps*C)
        g = _dot_f32(g_km, _perm_kc_to_ck(taps, C))

        corr = corr_ref[r].astype(jnp.float32)  # (W1, W2)
        W2 = corr.shape[-1]
        jc = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1).astype(jnp.float32)
        xc = (coords_ref[r].astype(jnp.float32) - disp_ref[r].astype(jnp.float32)) * scale
        corr_taps = []
        for k in range(taps):
            pos = xc[:, None] + (k - radius)
            w = jnp.maximum(1.0 - jnp.abs(jc - pos), 0.0)
            corr_taps.append(jnp.sum(corr * w, axis=-1))
        c = jnp.stack(corr_taps, axis=-1)
        out_ref[r] = jnp.concatenate([g, c], axis=-1)


def _bwd_geo_kernel(disp_ref, g_ref, dgeo_ref, radius: int, level: int, C: int):
    """dgeo half of the backward. Two Mosaic scoped-VMEM lessons are baked
    into its shape (both caught compiled-on-chip; invisible in interpret
    mode): (1) a combined dgeo+dcorr kernel kept both fp32 accumulators plus
    the unrolled tap-weight temps live at once — 18.2MB of stack at IGEV
    eval geometry; (2) even split, 8 unrolled row iterations held ~2.1MB of
    (W1c, DC) temps EACH (16.9MB) — so the backward runs R=2 row blocks,
    with disp/coords passed as (G, W1, 1) 3-D arrays whose lane dim of 1
    hits the full-dim exception, freeing the leading dim from the 2-D
    block's 8-sublane divisibility rule."""
    R, W1, _ = disp_ref.shape
    taps = 2 * radius + 1
    scale = 1.0 / (2**level)

    for r in range(R):
        g_all = g_ref[r].astype(jnp.float32)  # (W1, C*taps)
        DC = dgeo_ref.shape[-1]
        jflat = jax.lax.broadcasted_iota(jnp.int32, (1, DC), 1)
        jd = (jflat // C).astype(jnp.float32)
        selT = (
            jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)[0][:, None]
            == (jflat % C)[0][None, :]
        ).astype(jnp.float32)  # (C, DC)
        x = disp_ref[r, :, 0].astype(jnp.float32) * scale
        g_km = _dot_f32(g_all, _perm_kc_to_ck(taps, C).T)  # (W1, taps*C) k-major
        acc = jnp.zeros((W1, DC), jnp.float32)
        for k in range(taps):
            pos = x[:, None] + (k - radius)
            w = jnp.maximum(1.0 - jnp.abs(jd - pos), 0.0)
            g_k = g_km[:, k * C : (k + 1) * C]
            acc = acc + w * _dot_f32(g_k, selT)
        dgeo_ref[r] = acc.astype(dgeo_ref.dtype)


def _bwd_corr_kernel(disp_ref, coords_ref, g_ref, dcorr_ref,
                     radius: int, level: int):
    R, W1, _ = disp_ref.shape
    taps = 2 * radius + 1
    scale = 1.0 / (2**level)

    for r in range(R):
        g_corr = g_ref[r].astype(jnp.float32)  # (W1, taps)
        W2 = dcorr_ref.shape[-1]
        jc = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1).astype(jnp.float32)
        xc = (
            coords_ref[r, :, 0].astype(jnp.float32)
            - disp_ref[r, :, 0].astype(jnp.float32)
        ) * scale
        acc_c = jnp.zeros((W1, W2), jnp.float32)
        for k in range(taps):
            pos = xc[:, None] + (k - radius)
            w = jnp.maximum(1.0 - jnp.abs(jc - pos), 0.0)
            acc_c = acc_c + g_corr[:, k : k + 1] * w
        dcorr_ref[r] = acc_c.astype(dcorr_ref.dtype)


def _geo_fwd_impl(geo_pyr, corr_pyr, disp, coords, radius, interpret):
    L = len(geo_pyr)
    B, H, W1, _, C = geo_pyr[0].shape
    G = B * H
    R = _pick_rows(G)
    taps = 2 * radius + 1

    per_level = C * taps + taps
    disp2 = disp.reshape(G, W1)
    coords2 = coords.reshape(G, W1)
    outs = []
    for i in range(L):
        DC = geo_pyr[i].shape[3] * C
        W2 = corr_pyr[i].shape[-1]
        geo = geo_pyr[i].reshape(G, W1, DC)
        corr = corr_pyr[i].reshape(G, W1, W2)
        itemsize = max(geo.dtype.itemsize, corr.dtype.itemsize)
        limit = max(128, _VMEM_BYTES // (R * (DC + W2) * itemsize) // 128 * 128)
        W1p, W1c = _pick_cols(W1, limit)
        d2, c2 = disp2, coords2
        if W1p != W1:
            # pad disp → +1e9 / coords → −1e9: both tap positions land far
            # outside [0, DC) and [0, W2) so every relu weight vanishes and
            # the padded columns contribute exact zeros (sliced off below)
            d2 = jnp.pad(disp2, ((0, 0), (0, W1p - W1)), constant_values=1e9)
            c2 = jnp.pad(coords2, ((0, 0), (0, W1p - W1)), constant_values=-1e9)
            geo = jnp.pad(geo, ((0, 0), (0, W1p - W1), (0, 0)))
            corr = jnp.pad(corr, ((0, 0), (0, W1p - W1), (0, 0)))
        kernel = functools.partial(_fwd_level_kernel, radius=radius, level=i, C=C)
        out = pl.pallas_call(
            kernel,
            grid=(G // R, W1p // W1c),
            in_specs=[
                pl.BlockSpec((R, W1c), lambda g, c: (g, c), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, W1c), lambda g, c: (g, c), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, W1c, DC), lambda g, c: (g, c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, W1c, W2), lambda g, c: (g, c, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (R, W1c, per_level), lambda g, c: (g, c, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((G, W1p, per_level), jnp.float32),
            interpret=interpret,
        )(d2, c2, geo, corr)
        outs.append(out[:, :W1])
    return jnp.concatenate(outs, axis=-1).reshape(B, H, W1, L * per_level)


def _geo_bwd_impl(geo_shapes, corr_shapes, disp, coords, g, radius, interpret):
    L = len(geo_shapes)
    B, H, W1, _, C = geo_shapes[0].shape
    G = B * H
    R = _pick_rows(G)
    taps = 2 * radius + 1
    per_level = C * taps + taps

    disp2 = disp.reshape(G, W1)
    coords2 = coords.reshape(G, W1)
    g2 = g.reshape(G, W1, L * per_level)

    # R=2 row blocks: each unrolled row iteration holds ~2MB of (W1c, DC)
    # fp32 temps on the Mosaic stack; 8 rows exceeded the 16MB scoped limit
    # (see _bwd_geo_kernel docstring). The 3-D (G, W1p, 1) disp/coords form
    # is what legalizes a non-multiple-of-8 leading dim.
    Rb = 2 if G % 2 == 0 else 1

    dgeos, dcorrs = [], []
    for i in range(L):
        DC = geo_shapes[i].shape[3] * C
        W2 = corr_shapes[i].shape[-1]
        g_lvl = g2[..., i * per_level : (i + 1) * per_level]

        # --- dgeo half -----------------------------------------------------
        # budget at >= fp32 itemsize: the dominant scoped-VMEM consumers are
        # the kernel's fp32 (W1c, DC) accumulator/tap temps, which do NOT
        # shrink with bf16 inputs — budgeting at the input itemsize doubled
        # the chunk limit for the default corr_dtype="bfloat16" training
        # backward vs the fp32 geometry validate_kernels.py validates
        itemsize = max(jnp.dtype(geo_shapes[i].dtype).itemsize, 4)
        limit = max(128, _VMEM_BYTES // 2 // (Rb * (DC + C * taps) * itemsize) // 128 * 128)
        W1p, W1c = _pick_cols(W1, limit)
        d2 = disp2
        g_geo = g_lvl[..., : C * taps]
        if W1p != W1:
            d2 = jnp.pad(disp2, ((0, 0), (0, W1p - W1)), constant_values=1e9)
            g_geo = jnp.pad(g_geo, ((0, 0), (0, W1p - W1), (0, 0)))
        dgeo = pl.pallas_call(
            functools.partial(_bwd_geo_kernel, radius=radius, level=i, C=C),
            grid=(G // Rb, W1p // W1c),
            in_specs=[
                pl.BlockSpec((Rb, W1c, 1), lambda g, c: (g, c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Rb, W1c, C * taps), lambda g, c: (g, c, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Rb, W1c, DC), lambda g, c: (g, c, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, W1p, DC), geo_shapes[i].dtype),
            interpret=interpret,
        )(d2[..., None], g_geo)
        dgeos.append(dgeo[:, :W1].reshape(geo_shapes[i].shape))

        # --- dcorr half ----------------------------------------------------
        # fp32 (W1c, W2) temps dominate here too — same >= fp32 budget rule
        itemsize = max(jnp.dtype(corr_shapes[i].dtype).itemsize, 4)
        limit = max(128, _VMEM_BYTES // 2 // (Rb * (W2 + taps) * itemsize) // 128 * 128)
        W1p, W1c = _pick_cols(W1, limit)
        d2, c2 = disp2, coords2
        g_corr = g_lvl[..., C * taps :]
        if W1p != W1:
            d2 = jnp.pad(disp2, ((0, 0), (0, W1p - W1)), constant_values=1e9)
            c2 = jnp.pad(coords2, ((0, 0), (0, W1p - W1)), constant_values=-1e9)
            g_corr = jnp.pad(g_corr, ((0, 0), (0, W1p - W1), (0, 0)))
        dcorr = pl.pallas_call(
            functools.partial(_bwd_corr_kernel, radius=radius, level=i),
            grid=(G // Rb, W1p // W1c),
            in_specs=[
                pl.BlockSpec((Rb, W1c, 1), lambda g, c: (g, c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Rb, W1c, 1), lambda g, c: (g, c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Rb, W1c, taps), lambda g, c: (g, c, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Rb, W1c, W2), lambda g, c: (g, c, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, W1p, W2), corr_shapes[i].dtype),
            interpret=interpret,
        )(d2[..., None], c2[..., None], g_corr)
        dcorrs.append(dcorr[:, :W1].reshape(corr_shapes[i].shape))
    return tuple(dgeos), tuple(dcorrs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def geo_lookup_pallas(geo_pyr, corr_pyr, disp, coords, radius: int = 4, interpret: bool = False):
    """geo_pyr: tuple of (B,H,W1,D_i,C); corr_pyr: tuple of (B,H,W1,W2_i);
    disp/coords: (B,H,W1,1). Returns (B,H,W1, L*(C+1)*(2r+1)) fp32."""
    return _geo_fwd_impl(geo_pyr, corr_pyr, disp[..., 0], coords[..., 0], radius, interpret)


def _vjp_fwd(geo_pyr, corr_pyr, disp, coords, radius, interpret):
    out = _geo_fwd_impl(geo_pyr, corr_pyr, disp[..., 0], coords[..., 0], radius, interpret)
    geo_shapes = tuple(jax.ShapeDtypeStruct(v.shape, v.dtype) for v in geo_pyr)
    corr_shapes = tuple(jax.ShapeDtypeStruct(v.shape, v.dtype) for v in corr_pyr)
    return out, (geo_shapes, corr_shapes, disp, coords)


def _vjp_bwd(radius, interpret, res, g):
    geo_shapes, corr_shapes, disp, coords = res
    dgeos, dcorrs = _geo_bwd_impl(
        geo_shapes, corr_shapes, disp[..., 0], coords[..., 0], g, radius, interpret
    )
    return dgeos, dcorrs, jnp.zeros_like(disp), jnp.zeros_like(coords)


geo_lookup_pallas.defvjp(_vjp_fwd, _vjp_bwd)
