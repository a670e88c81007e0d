"""Pallas TPU kernel: fused combined geometry-encoding volume lookup (IGEV).

Device-side counterpart of ops/geometry.py (reference:
meta_arch/igev_stereo/geometry.py:34-58): per iteration, sample
  (a) the C-channel geo volume along disparity at ``disp/2^i ± r``,
  (b) the init correlation volume along width at ``(coords−disp)/2^i ± r``,
for every pyramid level. Same streaming-row + vectorized-tap-weight design
as corr_lookup.py (w_j = relu(1−|j−pos|) reproduces zero-padded linear
interpolation exactly); custom VJP returns gradients for both pyramids
(disp/coords are detached each iteration, igev_stereo.py:201).

Channel order matches the XLA path: per level [geo C-major (C·(2r+1)) |
corr (2r+1)].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dkt_stereo_tpu.ops.pallas.corr_lookup import _pick_rows


def _fwd_kernel(disp_ref, coords_ref, *refs, radius: int, num_levels: int, C: int):
    out_ref = refs[-1]
    geo_refs = refs[:num_levels]
    corr_refs = refs[num_levels : 2 * num_levels]
    R, W1 = disp_ref.shape
    taps = 2 * radius + 1

    for r in range(R):
        outs = []
        for i in range(num_levels):
            # geo rows arrive d-major flattened (W1, D_i*C): C=8 on the lane
            # axis alone would pad 16x and blow the VMEM budget at eval sizes
            geo_flat = geo_refs[i][r].astype(jnp.float32)  # (W1, D_i*C)
            D = geo_flat.shape[-1] // C
            geo = geo_flat.reshape(W1, D, C)
            jd = jax.lax.broadcasted_iota(jnp.int32, (1, D, 1), 1).astype(jnp.float32)
            x = disp_ref[r].astype(jnp.float32) / (2**i)  # (W1,)
            geo_taps = []
            for k in range(taps):
                pos = x[:, None, None] + (k - radius)  # (W1,1,1)
                w = jnp.maximum(1.0 - jnp.abs(jd - pos), 0.0)  # (W1,D,1)
                geo_taps.append(jnp.sum(geo * w, axis=1))  # (W1,C)
            # C-major, taps fast: (W1, C, taps) → (W1, C*taps)
            g = jnp.stack(geo_taps, axis=-1).reshape(W1, C * taps)

            corr = corr_refs[i][r].astype(jnp.float32)  # (W1, W2_i)
            W2 = corr.shape[-1]
            jc = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1).astype(jnp.float32)
            xc = (coords_ref[r].astype(jnp.float32) - disp_ref[r].astype(jnp.float32)) / (2**i)
            corr_taps = []
            for k in range(taps):
                pos = xc[:, None] + (k - radius)
                w = jnp.maximum(1.0 - jnp.abs(jc - pos), 0.0)
                corr_taps.append(jnp.sum(corr * w, axis=-1))
            c = jnp.stack(corr_taps, axis=-1)  # (W1, taps)
            outs.append(jnp.concatenate([g, c], axis=-1))
        out_ref[r] = jnp.concatenate(outs, axis=-1)


def _bwd_kernel(disp_ref, coords_ref, g_ref, *drefs, radius: int, num_levels: int, C: int):
    dgeo_refs = drefs[:num_levels]
    dcorr_refs = drefs[num_levels:]
    R, W1 = disp_ref.shape
    taps = 2 * radius + 1
    per_level = C * taps + taps

    for r in range(R):
        g_all = g_ref[r].astype(jnp.float32)  # (W1, L*(C*taps+taps))
        for i in range(num_levels):
            base = i * per_level
            D = dgeo_refs[i].shape[-1] // C
            jd = jax.lax.broadcasted_iota(jnp.int32, (1, D, 1), 1).astype(jnp.float32)
            x = disp_ref[r].astype(jnp.float32) / (2**i)
            g_geo = g_all[:, base : base + C * taps].reshape(W1, C, taps)
            acc = jnp.zeros((W1, D, C), jnp.float32)
            for k in range(taps):
                pos = x[:, None, None] + (k - radius)
                w = jnp.maximum(1.0 - jnp.abs(jd - pos), 0.0)  # (W1,D,1)
                acc = acc + w * g_geo[:, None, :, k]  # (W1,D,C)
            dgeo_refs[i][r] = acc.reshape(W1, D * C).astype(dgeo_refs[i].dtype)

            W2 = dcorr_refs[i].shape[-1]
            jc = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1).astype(jnp.float32)
            xc = (coords_ref[r].astype(jnp.float32) - disp_ref[r].astype(jnp.float32)) / (2**i)
            g_corr = g_all[:, base + C * taps : base + per_level]  # (W1, taps)
            acc_c = jnp.zeros((W1, W2), jnp.float32)
            for k in range(taps):
                pos = xc[:, None] + (k - radius)
                w = jnp.maximum(1.0 - jnp.abs(jc - pos), 0.0)
                acc_c = acc_c + g_corr[:, k : k + 1] * w
            dcorr_refs[i][r] = acc_c.astype(dcorr_refs[i].dtype)


def _geo_fwd_impl(geo_pyr, corr_pyr, disp, coords, radius, interpret):
    L = len(geo_pyr)
    B, H, W1, _, C = geo_pyr[0].shape
    G = B * H
    R = _pick_rows(G)
    taps = 2 * radius + 1
    K = L * (C * taps + taps)

    disp2 = disp.reshape(G, W1)
    coords2 = coords.reshape(G, W1)
    # d-major flatten (D_i, C) onto lanes — avoids 16x lane padding of C=8
    geos = [v.reshape(G, W1, v.shape[3] * C) for v in geo_pyr]
    corrs = [v.reshape(G, W1, v.shape[-1]) for v in corr_pyr]

    kernel = functools.partial(_fwd_kernel, radius=radius, num_levels=L, C=C)
    out = pl.pallas_call(
        kernel,
        grid=(G // R,),
        in_specs=[
            pl.BlockSpec((R, W1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W1), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec((R, W1, v.shape[-1]), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
            for v in geos
        ]
        + [
            pl.BlockSpec((R, W1, v.shape[-1]), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
            for v in corrs
        ],
        out_specs=pl.BlockSpec((R, W1, K), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, W1, K), jnp.float32),
        interpret=interpret,
    )(disp2, coords2, *geos, *corrs)
    return out.reshape(B, H, W1, K)


def _geo_bwd_impl(geo_shapes, corr_shapes, disp, coords, g, radius, interpret):
    L = len(geo_shapes)
    B, H, W1, _, C = geo_shapes[0].shape
    G = B * H
    R = _pick_rows(G)
    taps = 2 * radius + 1
    K = L * (C * taps + taps)

    disp2 = disp.reshape(G, W1)
    coords2 = coords.reshape(G, W1)
    g2 = g.reshape(G, W1, K)

    kernel = functools.partial(_bwd_kernel, radius=radius, num_levels=L, C=C)
    outs = pl.pallas_call(
        kernel,
        grid=(G // R,),
        in_specs=[
            pl.BlockSpec((R, W1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W1, K), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, W1, s.shape[3] * C), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
            for s in geo_shapes
        ]
        + [
            pl.BlockSpec((R, W1, s.shape[-1]), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
            for s in corr_shapes
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, W1, s.shape[3] * C), s.dtype) for s in geo_shapes
        ]
        + [jax.ShapeDtypeStruct((G, W1, s.shape[-1]), s.dtype) for s in corr_shapes],
        interpret=interpret,
    )(disp2, coords2, g2)
    dgeos = tuple(d.reshape(s.shape) for d, s in zip(outs[:L], geo_shapes))
    dcorrs = tuple(d.reshape(s.shape) for d, s in zip(outs[L:], corr_shapes))
    return dgeos, dcorrs


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
