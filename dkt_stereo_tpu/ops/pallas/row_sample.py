"""Pallas TPU kernel: arbitrary-position 1D row sampling (+ custom VJP).

Generalization of corr_lookup.py to per-pixel sample positions: for each
pixel row, sample K arbitrary positions with zero-padded linear interpolation
(w_j = relu(1−|j−pos|)). Used by PCVNet's Gaussian-parameterized lookup,
whose positions ``dx·σ + μ`` depend on a *differentiable* σ
(pcvnet/model.py:121-122 detaches only coords) — so unlike the RAFT kernel,
the VJP also returns position gradients:

    d out_k / d pos_k = Σ_j vol_j · (1[0 < j−pos ≤ 1] − 1[−1 < j−pos ≤ 0])

i.e. the two-tap convention ``v[x0+1] − v[x0]`` with ``x0 = floor(pos)`` —
including at integer positions, where the hat function has a kink and the
symmetric ``sign(j−pos)·1[|j−pos|<1]`` subgradient instead returns 0. The
two-tap form matches the XLA path (ops/sampler.py) and torch grid_sample
exactly; the sign form disagreed at the ~1e-5 fraction of fp32 positions
that round to exact integers (29 of 2.1M at PCV eval geometry, caught
compiled-on-chip by scripts/validate_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dkt_stereo_tpu.ops.pallas.corr_lookup import _pick_rows


def _fwd_kernel(pos_ref, vol_ref, out_ref, K: int):
    R, W1 = pos_ref.shape[0], pos_ref.shape[1]
    for r in range(R):
        vol = vol_ref[r].astype(jnp.float32)  # (W1, W2)
        W2 = vol.shape[-1]
        j = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1).astype(jnp.float32)
        outs = []
        for k in range(K):
            pos = pos_ref[r, :, k][:, None]  # (W1, 1)
            w = jnp.maximum(1.0 - jnp.abs(j - pos), 0.0)
            outs.append(jnp.sum(vol * w, axis=-1))
        out_ref[r] = jnp.stack(outs, axis=-1)


def _bwd_vol_kernel(pos_ref, g_ref, dvol_ref, K: int):
    """dvol half of the backward. Split from dpos and run at R=2 row blocks:
    the combined R=8 kernel's unrolled row×K loop held ~29MB of (W1, W2)
    fp32 temps on the Mosaic scoped-VMEM stack (16MB limit) at PCV eval
    geometry — caught compiled-on-chip by scripts/validate_kernels.py,
    invisible in interpret mode."""
    R, W1 = pos_ref.shape[0], pos_ref.shape[1]
    W2 = dvol_ref.shape[-1]
    for r in range(R):
        j = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1).astype(jnp.float32)
        g = g_ref[r].astype(jnp.float32)  # (W1, K)
        acc = jnp.zeros((W1, W2), jnp.float32)
        for k in range(K):
            pos = pos_ref[r, :, k][:, None]
            w = jnp.maximum(1.0 - jnp.abs(j - pos), 0.0)
            acc = acc + g[:, k : k + 1] * w
        dvol_ref[r] = acc.astype(dvol_ref.dtype)


def _bwd_pos_kernel(pos_ref, vol_ref, g_ref, dpos_ref, K: int):
    R, W1 = pos_ref.shape[0], pos_ref.shape[1]
    for r in range(R):
        vol = vol_ref[r].astype(jnp.float32)
        W2 = vol.shape[-1]
        j = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1).astype(jnp.float32)
        g = g_ref[r].astype(jnp.float32)  # (W1, K)
        dpos = []
        for k in range(K):
            pos = pos_ref[r, :, k][:, None]
            diff = j - pos
            # two-tap convention incl. kinks (module docstring): +1 on the
            # x0+1 tap, −1 on the x0 tap, with x0 = floor(pos)
            dw = jnp.where((diff > 0.0) & (diff <= 1.0), 1.0, 0.0) - jnp.where(
                (diff > -1.0) & (diff <= 0.0), 1.0, 0.0
            )
            gk = g[:, k : k + 1]
            dpos.append(jnp.sum(vol * dw * gk, axis=-1))
        dpos_ref[r] = jnp.stack(dpos, axis=-1)


def _row_sample_impl(vol, pos, interpret):
    B, H, W1, W2 = vol.shape
    K = pos.shape[-1]
    G = B * H
    R = _pick_rows(G)
    vol2 = vol.reshape(G, W1, W2)
    pos2 = pos.reshape(G, W1, K)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, K=K),
        grid=(G // R,),
        in_specs=[
            pl.BlockSpec((R, W1, K), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W1, W2), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, W1, K), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, W1, K), jnp.float32),
        interpret=interpret,
    )(pos2, vol2)
    return out.reshape(B, H, W1, K)


def _row_sample_bwd_impl(vol, pos, g, interpret):
    B, H, W1, W2 = vol.shape
    K = pos.shape[-1]
    G = B * H
    # R=2: the unrolled row loop's fp32 temps dominate the scoped-VMEM
    # stack (see _bwd_vol_kernel docstring); 3-D blocks put W1 on the
    # sublane axis so the leading dim carries no divisibility constraint
    R = 2 if G % 2 == 0 else 1
    pos2 = pos.reshape(G, W1, K)
    g2 = g.reshape(G, W1, K)
    dvol = pl.pallas_call(
        functools.partial(_bwd_vol_kernel, K=K),
        grid=(G // R,),
        in_specs=[
            pl.BlockSpec((R, W1, K), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W1, K), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, W1, W2), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, W1, W2), vol.dtype),
        interpret=interpret,
    )(pos2, g2)
    dpos = pl.pallas_call(
        functools.partial(_bwd_pos_kernel, K=K),
        grid=(G // R,),
        in_specs=[
            pl.BlockSpec((R, W1, K), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W1, W2), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W1, K), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, W1, K), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, W1, K), jnp.float32),
        interpret=interpret,
    )(pos2, vol.reshape(G, W1, W2), g2)
    return dvol.reshape(vol.shape), dpos.reshape(pos.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def row_sample_pallas(vol, pos, interpret: bool = False):
    """vol: (B,H,W1,W2); pos: (B,H,W1,K) fp32 → (B,H,W1,K) fp32."""
    return _row_sample_impl(vol, pos, interpret)


def _vjp_fwd(vol, pos, interpret):
    return _row_sample_impl(vol, pos, interpret), (vol, pos)


def _vjp_bwd(interpret, res, g):
    vol, pos = res
    dvol, dpos = _row_sample_bwd_impl(vol, pos, g, interpret)
    return dvol, dpos


row_sample_pallas.defvjp(_vjp_fwd, _vjp_bwd)
