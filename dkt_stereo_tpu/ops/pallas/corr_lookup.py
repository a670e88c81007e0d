"""Pallas TPU kernel: fused correlation-pyramid lookup (+ custom VJP).

TPU-native replacement for the reference's CUDA ``corr_sampler`` extension
(core/corr.py:17-29, config "reg_cuda") and the hot-path pyramid lookup of
``CorrBlock1D.__call__`` (core/corr.py:127-146).

Why a kernel: the XLA formulation is a per-pixel 2-tap gather into HBM —
random access over a ~70-140 MB volume every GRU iteration. Here each grid
program streams a block of volume *rows* into VMEM once and extracts all
``levels × (2r+1)`` taps with vectorized VPU arithmetic, no gathers at all:

    tap weight over the row is  w_j = relu(1 − |j − pos|)
    sampled value             = Σ_j vol[w1, j] · w_j

which reproduces 1-D bilinear interpolation with zero padding *exactly*
(out-of-range pos ⇒ all w_j = 0; pos ∈ (−1, 0] ⇒ only j=0 contributes with
weight 1+pos — identical to grid_sample zero-padding semantics).

Backward: the reference's CUDA sampler returns gradients only for the volume
(core/corr.py:25-29) and RAFT detaches lookup coords every iteration
(raft_stereo.py:153), so the VJP computes d/d(volume) by the transposed
weighting (a scatter-free outer product per tap) and zero for coords.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_rows(g: int) -> int:
    """Rows per grid program. Mosaic requires the block's second-to-last dim
    divisible by 8 (or the full array), so use 8-row blocks and iterate rows
    inside the kernel (full-array temps at R=8 OOM the 16MB VMEM limit)."""
    return 8 if g % 8 == 0 else g


def _fwd_kernel(coords_ref, *refs, radius: int, num_levels: int):
    out_ref = refs[-1]
    vol_refs = refs[:-1]
    R, W1 = coords_ref.shape
    taps = 2 * radius + 1

    for r in range(R):  # per-row: temps stay (W1, W2_i) ≈ 0.5 MB
        outs = []
        for i in range(num_levels):
            vol = vol_refs[i][r].astype(jnp.float32)  # (W1, W2_i)
            W2 = vol.shape[-1]
            # Mosaic requires integer iota; cast to f32 after
            j = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1).astype(jnp.float32)
            x = coords_ref[r].astype(jnp.float32) / (2**i)  # (W1,)
            for k in range(taps):
                pos = x[:, None] + (k - radius)  # (W1, 1)
                w = jnp.maximum(1.0 - jnp.abs(j - pos), 0.0)
                outs.append(jnp.sum(vol * w, axis=-1))  # (W1,)
        out_ref[r] = jnp.stack(outs, axis=-1)  # (W1, L*taps)


def _bwd_kernel(coords_ref, g_ref, *dvol_refs, radius: int, num_levels: int):
    R, W1 = coords_ref.shape
    taps = 2 * radius + 1

    for r in range(R):
        g = g_ref[r].astype(jnp.float32)  # (W1, L*taps)
        for i in range(num_levels):
            W2 = dvol_refs[i].shape[-1]
            j = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1).astype(jnp.float32)
            x = coords_ref[r].astype(jnp.float32) / (2**i)
            acc = jnp.zeros((W1, W2), jnp.float32)
            for k in range(taps):
                pos = x[:, None] + (k - radius)
                w = jnp.maximum(1.0 - jnp.abs(j - pos), 0.0)
                acc = acc + g[:, i * taps + k : i * taps + k + 1] * w
            dvol_refs[i][r] = acc.astype(dvol_refs[i].dtype)


# one grid program's volume blocks must fit VMEM (with Mosaic's double
# buffering + fp32 tap temps): cap R·W1c·ΣW2 elements per program.
# Empirically 2.07M elems (Middlebury-F level-1 full-row) measures 16.3M
# scoped VMEM; 3.4MB keeps headroom while the 736×1280 eval protocol's
# bf16 pyramid (3.1MB) stays on the single-call fast path. Budgeted in
# BYTES, not elements: an fp32 pyramid at the same geometry needs 2x the
# VMEM and must route to the chunked path (an element-count budget let it
# through and Mosaic's 16MB scoped-vmem allocator rejected the kernel —
# caught by scripts/validate_kernels.py on-chip, invisible in interpret
# mode).
_VMEM_BYTES = 3_400_000


def _fwd_kernel_level(coords_ref, vol_ref, out_ref, *, radius, level):
    """Per-level variant for large frames: W1 chunked on the grid."""
    R, W1c = coords_ref.shape
    taps = 2 * radius + 1

    for r in range(R):
        vol = vol_ref[r].astype(jnp.float32)  # (W1c, W2)
        W2 = vol.shape[-1]
        j = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1).astype(jnp.float32)
        x = coords_ref[r].astype(jnp.float32) / (2**level)
        outs = []
        for k in range(taps):
            pos = x[:, None] + (k - radius)
            w = jnp.maximum(1.0 - jnp.abs(j - pos), 0.0)
            outs.append(jnp.sum(vol * w, axis=-1))
        out_ref[r] = jnp.stack(outs, axis=-1)


def _lookup_fwd_chunked(pyramid, coords, radius, interpret):
    """Large-frame path: one pallas_call per level, W1 split into
    128-multiple chunks (Middlebury-F-sized volumes overflow the 16MB VMEM
    budget of the all-levels single call)."""
    from dkt_stereo_tpu.ops.pallas.corr_alt import _pick_cols

    B, H, W1, _ = pyramid[0].shape
    G = B * H
    R = _pick_rows(G)
    taps = 2 * radius + 1
    coords2 = coords.reshape(G, W1)

    outs = []
    for level, v in enumerate(pyramid):
        W2 = v.shape[-1]
        limit = max(128, _VMEM_BYTES // v.dtype.itemsize // (R * W2) // 128 * 128)
        W1p, W1c = _pick_cols(W1, limit)
        c2 = coords2
        vol = v.reshape(G, W1, W2)
        if W1p != W1:
            c2 = jnp.pad(c2, ((0, 0), (0, W1p - W1)), constant_values=-1e9)
            vol = jnp.pad(vol, ((0, 0), (0, W1p - W1), (0, 0)))
        kernel = functools.partial(_fwd_kernel_level, radius=radius, level=level)
        out = pl.pallas_call(
            kernel,
            grid=(G // R, W1p // W1c),
            in_specs=[
                pl.BlockSpec((R, W1c), lambda g, c: (g, c), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, W1c, W2), lambda g, c: (g, c, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (R, W1c, taps), lambda g, c: (g, c, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((G, W1p, taps), jnp.float32),
            interpret=interpret,
        )(c2, vol)
        outs.append(out[:, :W1])
    return jnp.concatenate(outs, axis=-1).reshape(B, H, W1, len(pyramid) * taps)


def _bwd_kernel_level(coords_ref, g_ref, dvol_ref, *, radius, level):
    """Per-level backward for large frames (W1 chunked on the grid)."""
    R, W1c = coords_ref.shape
    taps = 2 * radius + 1

    for r in range(R):
        g = g_ref[r].astype(jnp.float32)  # (W1c, taps)
        W2 = dvol_ref.shape[-1]
        j = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1).astype(jnp.float32)
        x = coords_ref[r].astype(jnp.float32) / (2**level)
        acc = jnp.zeros((W1c, W2), jnp.float32)
        for k in range(taps):
            pos = x[:, None] + (k - radius)
            w = jnp.maximum(1.0 - jnp.abs(j - pos), 0.0)
            acc = acc + g[:, k : k + 1] * w
        dvol_ref[r] = acc.astype(dvol_ref.dtype)


def _lookup_bwd_chunked(pyramid_shapes, coords, g, radius, interpret):
    """Large-frame backward mirroring :func:`_lookup_fwd_chunked`: one
    pallas_call per level, W1 in 128-multiple chunks — without this, grads
    at Middlebury-F-sized volumes would issue the all-levels single call and
    blow the 16MB scoped-VMEM budget the forward already avoids."""
    from dkt_stereo_tpu.ops.pallas.corr_alt import _pick_cols

    num_levels = len(pyramid_shapes)
    B, H, W1, _ = pyramid_shapes[0].shape
    G = B * H
    R = _pick_rows(G)
    taps = 2 * radius + 1
    coords2 = coords.reshape(G, W1)
    g2 = g.reshape(G, W1, num_levels * taps)

    dvols = []
    for level, s in enumerate(pyramid_shapes):
        W2 = s.shape[-1]
        # half the forward's budget: the backward kernel's unrolled
        # row×tap loop keeps more fp32 temps live, and Mosaic lane-pads W2
        # to 128 multiples — at the forward's chunk size it exceeded the
        # 16MB scoped-vmem stack by ~2% at Middlebury-F fp32 (caught by
        # scripts/validate_kernels.py on the chip)
        # >= fp32 itemsize: the kernel's fp32 (W1c, W2) acc/tap temps don't
        # shrink with bf16 inputs, so a bf16 pyramid must not double the
        # chunk limit past what fits the 16MB scoped-VMEM stack
        limit = max(
            128, _VMEM_BYTES // 2 // max(s.dtype.itemsize, 4) // (R * W2) // 128 * 128
        )
        W1p, W1c = _pick_cols(W1, limit)
        c2 = coords2
        gl = g2[..., level * taps : (level + 1) * taps]
        if W1p != W1:
            c2 = jnp.pad(c2, ((0, 0), (0, W1p - W1)), constant_values=-1e9)
            gl = jnp.pad(gl, ((0, 0), (0, W1p - W1), (0, 0)))
        kernel = functools.partial(_bwd_kernel_level, radius=radius, level=level)
        dvol = pl.pallas_call(
            kernel,
            grid=(G // R, W1p // W1c),
            in_specs=[
                pl.BlockSpec((R, W1c), lambda g_, c: (g_, c), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, W1c, taps), lambda g_, c: (g_, c, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (R, W1c, W2), lambda g_, c: (g_, c, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((G, W1p, W2), s.dtype),
            interpret=interpret,
        )(c2, gl)
        dvols.append(dvol[:, :W1].reshape(s.shape))
    return tuple(dvols)


def _lookup_fwd_impl(pyramid, coords, radius, interpret):
    num_levels = len(pyramid)
    B, H, W1, _ = pyramid[0].shape
    G = B * H
    R = _pick_rows(G)
    taps = 2 * radius + 1

    if R * W1 * sum(v.shape[-1] * v.dtype.itemsize for v in pyramid) > _VMEM_BYTES:
        return _lookup_fwd_chunked(pyramid, coords, radius, interpret)

    coords2 = coords.reshape(G, W1)
    vols = [v.reshape(G, W1, v.shape[-1]) for v in pyramid]

    kernel = functools.partial(_fwd_kernel, radius=radius, num_levels=num_levels)
    out = pl.pallas_call(
        kernel,
        grid=(G // R,),
        in_specs=[pl.BlockSpec((R, W1), lambda g: (g, 0), memory_space=pltpu.VMEM)]
        + [
            pl.BlockSpec((R, W1, v.shape[-1]), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
            for v in vols
        ],
        out_specs=pl.BlockSpec(
            (R, W1, num_levels * taps), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((G, W1, num_levels * taps), jnp.float32),
        interpret=interpret,
    )(coords2, *vols)
    return out.reshape(B, H, W1, num_levels * taps)


def _lookup_bwd_impl(pyramid_shapes, coords, g, radius, interpret):
    num_levels = len(pyramid_shapes)
    B, H, W1, _ = pyramid_shapes[0].shape
    G = B * H
    R = _pick_rows(G)
    taps = 2 * radius + 1

    if R * W1 * sum(s.shape[-1] * s.dtype.itemsize for s in pyramid_shapes) > _VMEM_BYTES:
        return _lookup_bwd_chunked(pyramid_shapes, coords, g, radius, interpret)

    coords2 = coords.reshape(G, W1)
    g2 = g.reshape(G, W1, num_levels * taps)

    kernel = functools.partial(_bwd_kernel, radius=radius, num_levels=num_levels)
    dvols = pl.pallas_call(
        kernel,
        grid=(G // R,),
        in_specs=[
            pl.BlockSpec((R, W1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (R, W1, num_levels * taps), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((R, W1, s.shape[-1]), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
            for s in pyramid_shapes
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, W1, s.shape[-1]), s.dtype) for s in pyramid_shapes
        ],
        interpret=interpret,
    )(coords2, g2)
    return tuple(d.reshape(s.shape) for d, s in zip(dvols, pyramid_shapes))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def corr_lookup_pallas(pyramid, coords_x, radius: int = 4, interpret: bool = False):
    """Fused pyramid lookup. ``pyramid``: tuple of (B,H,W1,W2_i) (fp32 or
    bf16); ``coords_x``: (B,H,W1,1) fp32. Returns (B,H,W1,L*(2r+1)) fp32,
    channel order identical to ops.corr.corr_lookup."""
    return _lookup_fwd_impl(pyramid, coords_x[..., 0], radius, interpret)


def _vjp_fwd(pyramid, coords_x, radius, interpret):
    out = _lookup_fwd_impl(pyramid, coords_x[..., 0], radius, interpret)
    shapes = tuple(jax.ShapeDtypeStruct(v.shape, v.dtype) for v in pyramid)
    return out, (shapes, coords_x)


def _vjp_bwd(radius, interpret, res, g):
    shapes, coords_x = res
    dvols = _lookup_bwd_impl(shapes, coords_x[..., 0], g, radius, interpret)
    return dvols, jnp.zeros_like(coords_x)


corr_lookup_pallas.defvjp(_vjp_fwd, _vjp_bwd)
