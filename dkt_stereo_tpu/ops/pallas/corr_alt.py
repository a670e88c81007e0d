"""Pallas TPU kernel: fused build+lookup correlation — no volume in HBM.

TPU-native replacement for the reference's memory-efficient ``alt_cuda_corr``
extension (core/corr.py:212-241 ``CorrBlockFast1D`` and the pure-torch
``PytorchAlternateCorrBlock1D``, core/corr.py:64-107): the W×W₂ correlation
volume is **never materialized in device memory**. Each grid program

  1. streams a block of left-feature rows (W1c, D) and the level's pooled,
     pre-transposed right-feature rows (D, W2) into VMEM,
  2. computes the row-block volume ``f1 @ f2ᵀ / sqrt(D)`` on the MXU —
     fp32 accumulation, the volume block lives only in VMEM registers,
  3. extracts the 2r+1 taps with the same relu-weighting as the
     materialized-path kernel (ops/pallas/corr_lookup.py) and writes only
     the (W1c, 2r+1) tap block back to HBM.

Numerically this equals the materialized pyramid lookup because width
average-pooling is linear in fmap2 (pool(corr(f1, f2)) == corr(f1, pool(f2))
along the j axis) — the same identity the XLA ``corr_lookup_alt`` path uses.
Peak HBM holds only the feature pyramids: O((W1 + 1.33·W2)·D) per row
instead of O(1.33·W1·W2) — the ``alt_cuda`` memory contract that makes
full-resolution Middlebury-F / Booster frames fit on one chip.

Backward (training rarely runs memory-starved, so it favors simplicity):
a custom VJP that differentiates the XLA recompute path — exact gradients
for fmap1 and the f2 pyramid, zero for coords (the reference's CUDA sampler
also returns no coordinate gradient, core/corr.py:25-29).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_rows(g: int) -> int:
    """8-row blocks (Mosaic: 2nd-to-last block dim divisible by 8)."""
    return 8 if g % 8 == 0 else g


def _pick_cols(w1: int, limit: int = 512) -> tuple[int, int]:
    """(padded W1, chunk) bounding the per-program VMEM volume block.

    Small widths use one full-array block (Mosaic's equal-to-dim exception);
    wide rows are padded up to a multiple of 128 and chunked by a
    128-multiple divisor ≤ limit (Mosaic requires non-full lane-dim blocks
    to be 128-divisible)."""
    if w1 <= limit:
        return w1, w1
    w1p = -(-w1 // 128) * 128
    for c in (512, 384, 256, 128):
        if c <= limit and w1p % c == 0:
            return w1p, c
    return w1p, 128


def _alt_fwd_kernel(coords_ref, f1_ref, f2t_ref, out_ref, *, radius, level, inv_sqrt_d):
    R, W1c = coords_ref.shape
    taps = 2 * radius + 1

    # fp32-correlation policy (ops/corr.py::corr_volume precision note):
    # fp32 features must run the MXU at HIGHEST — the default pass rounds
    # fp32 operands to bf16, a ~4e-3 relative divergence vs the XLA path
    # (measured 1.0e-2 abs at eval geometry by scripts/validate_kernels.py
    # on-chip; invisible in interpret mode). bf16 features keep the native
    # single-pass bf16×bf16→fp32 path, identical to the XLA einsum.
    prec = jax.lax.Precision.HIGHEST if f1_ref.dtype == jnp.float32 else None

    for r in range(R):  # per-row: the (W1c, W2) volume block is VMEM-only
        f1r = f1_ref[r]  # (W1c, D)
        f2t = f2t_ref[r]  # (D, W2)
        vol = (
            jax.lax.dot_general(
                f1r,
                f2t,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            * inv_sqrt_d
        )  # (W1c, W2) fp32 — never written to HBM
        W2 = vol.shape[-1]
        j = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1).astype(jnp.float32)
        x = coords_ref[r].astype(jnp.float32) / (2**level)  # (W1c,)
        outs = []
        for k in range(taps):
            pos = x[:, None] + (k - radius)
            w = jnp.maximum(1.0 - jnp.abs(j - pos), 0.0)
            outs.append(jnp.sum(vol * w, axis=-1))
        out_ref[r] = jnp.stack(outs, axis=-1)  # (W1c, taps)


# Per-program byte budget for choosing the W1 chunk (same rationale as
# corr_lookup._VMEM_BYTES): the (R, W1c, D) f1 block + the level's fixed
# (R, D, W2) f2t block + the (R, W1c, taps→128-lane-padded) out block,
# double-buffered, plus the per-row fp32 volume and HIGHEST-precision
# decomposition scratch must stay under Mosaic's 16MB scoped-VMEM stack.
# An un-budgeted full-W1 fp32 block measured 18.3MB inside the RAFT scan
# (caught compiled-on-chip by scripts/validate_kernels.py — the standalone
# kernel jit of the same shapes happened to fit).
_VMEM_BYTES = 3_400_000


def _alt_fwd_impl(fmap1, f2t_pyramid, coords, radius, interpret):
    B, H, W1, D = fmap1.shape
    G = B * H
    R = _pick_rows(G)
    itemsize = jnp.dtype(f2t_pyramid[0].dtype).itemsize
    w2max = max(f.shape[-1] for f in f2t_pyramid)
    limit = max(
        128,
        (_VMEM_BYTES - R * D * w2max * itemsize)
        // max(R * (D + 128) * itemsize, 1)
        // 128
        * 128,
    )
    W1p, W1c = _pick_cols(W1, limit)
    taps = 2 * radius + 1

    # match the right-feature dtype (bf16 on the TPU hot path — halves the
    # VMEM feature blocks; the MXU accumulates fp32 either way)
    f1 = fmap1.astype(f2t_pyramid[0].dtype).reshape(G, W1, D)
    coords2 = coords.reshape(G, W1)
    if W1p != W1:
        # pad to the 128-multiple chunk grid: zero features (harmless extra
        # dots) and far-out-of-range coords (all tap weights vanish)
        f1 = jnp.pad(f1, ((0, 0), (0, W1p - W1), (0, 0)))
        coords2 = jnp.pad(coords2, ((0, 0), (0, W1p - W1)), constant_values=-1e9)

    outs = []
    for level, f2t in enumerate(f2t_pyramid):
        f2t = f2t.reshape(G, D, f2t.shape[-1])
        W2 = f2t.shape[-1]
        kernel = functools.partial(
            _alt_fwd_kernel,
            radius=radius,
            level=level,
            inv_sqrt_d=1.0 / float(D) ** 0.5,
        )
        out = pl.pallas_call(
            kernel,
            grid=(G // R, W1p // W1c),
            in_specs=[
                pl.BlockSpec((R, W1c), lambda g, c: (g, c), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, W1c, D), lambda g, c: (g, c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, D, W2), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (R, W1c, taps), lambda g, c: (g, c, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((G, W1p, taps), jnp.float32),
            interpret=interpret,
        )(coords2, f1, f2t)
        outs.append(out[:, :W1])
    return jnp.concatenate(outs, axis=-1).reshape(B, H, W1, len(f2t_pyramid) * taps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def corr_lookup_alt_pallas(
    fmap1, f2t_pyramid, coords_x, radius: int = 4, interpret: bool = False
):
    """Fused no-materialization pyramid lookup.

    ``fmap1``: (B,H,W1,D) fp32/bf16; ``f2t_pyramid``: tuple of *transposed*
    pooled right features (B,H,D,W2_i) — transpose once outside the iteration
    loop (``jnp.swapaxes(f, -1, -2)`` over ``ops.corr.fmap_pyramid``) so the
    MXU sees a contiguous (D, W2) operand every GRU step; ``coords_x``:
    (B,H,W1,1) fp32. Returns (B,H,W1,L*(2r+1)) fp32, channel order identical
    to ``ops.corr.corr_lookup``.
    """
    return _alt_fwd_impl(fmap1, f2t_pyramid, coords_x[..., 0], radius, interpret)


def _vjp_fwd(fmap1, f2t_pyramid, coords_x, radius, interpret):
    out = _alt_fwd_impl(fmap1, f2t_pyramid, coords_x[..., 0], radius, interpret)
    return out, (fmap1, f2t_pyramid, coords_x)


def _vjp_bwd(radius, interpret, res, g):
    from dkt_stereo_tpu.ops.corr import corr_lookup_alt

    fmap1, f2t_pyramid, coords_x = res

    def recompute(f1, f2t_pyr):
        pyr = [jnp.swapaxes(f, -1, -2) for f in f2t_pyr]
        return corr_lookup_alt(f1, pyr, coords_x, radius)

    _, vjp = jax.vjp(recompute, fmap1, tuple(f2t_pyramid))
    df1, df2t = vjp(g)
    return df1, df2t, jnp.zeros_like(coords_x)


corr_lookup_alt_pallas.defvjp(_vjp_fwd, _vjp_bwd)
