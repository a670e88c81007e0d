"""Pallas TPU kernels: fused full-resolution encoder stage (conv3x3 + IN).

TPU-native replacement for the hot full-resolution section of the feature/
context encoders (reference ``core/extractor.py:122-197``: the 7x7 stem's
norm + ``layer1``'s two stride-1 residual blocks). XLA runs these
64-channel full-res convolutions at ~18 TF/s: 64 output channels fill only
half of the 128-wide MXU/lane tiles and every conv+norm round-trips HBM.

Design ("w2d" = width-to-depth):
  - Activations are stored as (B, H, W/2, 2C): adjacent column pairs are
    folded into channels, so C=64 tensors become 128-lane tiles that fill
    the MXU and the vector registers.
  - A logical 3x3 stride-1 conv becomes a dense (3 rows x 3 cells) conv
    over w2d tensors whose (2C, 2C) per-tap matrices carry a fixed zero
    pattern (built once by :func:`w2d_conv3x3_weights`). 2x the logical
    FLOPs, but at full MXU utilization — a net win over XLA here.
  - One kernel invocation fuses: per-(sample,channel) input affine (the
    preceding InstanceNorm, folded to ``a*x+b`` — IN is shift-invariant so
    conv biases vanish into it; see below) + ReLU + optional residual
    stream (its own affine+ReLU) + the 3x3 conv + per-channel sum/sumsq of
    the raw output (the stats the NEXT stage's affine needs). Activations
    cross HBM exactly once per stage.
  - Row halo (+-1) is carried in persistent VMEM scratch across grid steps
    (the TPU grid runs sequentially), so blocks never overlap: each stage's
    output lands one row "later" than its input — the ``shift`` bookkeeping
    below. Outputs are zero-masked outside the valid image region so the
    next stage's halo reads are exact SAME-padding zeros.

Bias-freedom: every conv in the fused section is followed by InstanceNorm
(or eval-mode BatchNorm). IN(x + const_per_channel) == IN(x), so conv
biases are dropped entirely; for BN the bias folds into the static affine.

:func:`encoder_stage_ad` wraps the stage in a ``jax.custom_vjp`` so the
fused chain is trainable (round-4; the r3 fused path was inference-only and
the student paid the ~2× XLA encoder every train step). The backward's only
hot op — the adjoint SAME-conv of the output cotangent with spatially
flipped, IO-transposed dense taps — is the SAME kernel family, so it reuses
:func:`encoder_stage` with an identity affine; everything else (masks, ReLU
gates, per-channel affine/stat sums, the 9 dense-tap weight contractions)
is XLA-level, where the w2d weight scatter (:func:`w2d_conv3x3_weights`)
stays inside autodiff and its adjoint is automatic.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_BLOCK = 8  # default output rows per grid step


def pick_rb(wcp: int, h: int, itemsize: int = 2) -> int:
    """Rows per grid step bounded by VMEM: the per-program footprint (input/
    output/scratch blocks in the activation dtype + two fp32 row temps) is
    ≈ 18·rb·Wcp·C2 bytes at bf16, so wide full-resolution frames
    (Middlebury-F: Wcp≈1442) must drop below the default 8. ``h`` must stay
    divisible by the choice. ``itemsize`` scales the budget for fp32
    activations (mixed_precision off): the bf16-calibrated threshold let an
    fp32 736×1280 frame through and Mosaic's 16MB scoped-VMEM allocator
    rejected the kernel — caught compiled-on-chip by
    scripts/validate_kernels.py."""
    # measured on the dual-input (v + emit_h) stage, the VMEM-heaviest:
    # rb·wcp = 5136 (736×1280 eval) fits at bf16; 5768 (Middlebury-F)
    # overflows by ~0.9M — the scoped budget works out to ≈ rb·wcp ≤ ~5460
    # bf16-equivalent units
    budget = 5300 * 2 // max(itemsize, 2)
    for rb in (8, 4, 2, 1):
        if rb * wcp <= budget and h % rb == 0:
            return rb
    return 1


# ---------------------------------------------------------------------------
# Layout helpers (XLA level)
# ---------------------------------------------------------------------------


def w2d_pack(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W/2, 2C): channels [0:C] = even columns,
    [C:2C] = odd columns."""
    B, H, W, C = x.shape
    assert W % 2 == 0, W
    return x.reshape(B, H, W // 2, 2 * C)


def w2d_unpack(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`w2d_pack`."""
    B, H, Wc, C2 = x.shape
    return x.reshape(B, H, Wc * 2, C2 // 2)


def w2d_pad(x_w2d: jnp.ndarray, rb: int = R_BLOCK) -> jnp.ndarray:
    """Add the frame the kernels expect: bottom zero rows (at least 4 — the
    chain shifts down one row per stage across 4 stages — rounded up to a
    multiple of ``rb`` so the grid tiles Hp) and one zero cell (2 columns)
    on each side of W."""
    pad = max(rb, 4)
    pad += (-pad) % rb
    return jnp.pad(x_w2d, ((0, 0), (0, pad), (1, 1), (0, 0)))


def w2d_slice(y: jnp.ndarray, shift: int, H: int) -> jnp.ndarray:
    """Recover the real (B, H, Wc, 2C) region from a kernel output whose
    row k holds real row ``k - shift``."""
    return y[:, shift : shift + H, 1:-1, :]


def w2d_conv3x3_weights(w) -> jnp.ndarray:
    """Logical (3, 3, C, C) HWIO kernel -> dense w2d (3, 3, 2C, 2C).

    Output cell j, phase po reads original column 2j+po+q-1 for tap q; that
    column lives in cell j + c - 1, phase pi with 2(c-1) + pi = po + q - 1.
    """
    w = jnp.asarray(w)
    kh, kw, ci, co = w.shape
    assert kh == 3 and kw == 3, (kh, kw)
    dense = jnp.zeros((3, 3, 2 * ci, 2 * co), w.dtype)
    for c in range(3):
        for pi in range(2):
            for po in range(2):
                q = 2 * (c - 1) + pi - po + 1  # tap index 0..2
                if 0 <= q <= 2:
                    dense = dense.at[
                        :, c, pi * ci : (pi + 1) * ci, po * co : (po + 1) * co
                    ].set(w[:, q])
    return dense


def w2d_stem_weights(w) -> jnp.ndarray:
    """Logical (7, 7, Cin, Cout) stride-1 stem kernel -> dense w2d
    (7, 5, 2Cin, 2Cout): output cell j phase po, tap q reads original column
    2j+po+q-3 = cell j+c-2 phase pi with q = 2(c-2)+pi-po+3."""
    w = jnp.asarray(w)
    kh, kw, ci, co = w.shape
    assert kh == 7 and kw == 7, (kh, kw)
    dense = jnp.zeros((7, 5, 2 * ci, 2 * co), w.dtype)
    for c in range(5):
        for pi in range(2):
            for po in range(2):
                q = 2 * (c - 2) + pi - po + 3
                if 0 <= q <= 6:
                    dense = dense.at[
                        :, c, pi * ci : (pi + 1) * ci, po * co : (po + 1) * co
                    ].set(w[:, q])
    return dense


def in_affine(stats_sum, stats_sumsq, count, gamma=None, beta=None, eps=1e-5):
    """Fold normalization into (a, b) with x_norm = a*x + b.

    ``stats_*``: (B, 2C) w2d sums — phase pairs are combined so the
    statistic is per LOGICAL channel, as InstanceNorm2d computes it.
    ``count`` = H*W (logical pixels)."""
    C = stats_sum.shape[-1] // 2
    s = stats_sum[..., :C] + stats_sum[..., C:]
    ss = stats_sumsq[..., :C] + stats_sumsq[..., C:]
    mean = s / count
    var = ss / count - mean * mean
    a = jax.lax.rsqrt(var + eps)
    if gamma is not None:
        a = a * gamma
    b = -mean * a
    if beta is not None:
        b = b + beta
    return jnp.concatenate([a, a], axis=-1), jnp.concatenate([b, b], axis=-1)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _stage_kernel(
    *refs,
    H: int,
    shift_in: int,
    has_res: bool,
    emit_h: bool,
    relu_u: bool,
    hi_prec: bool = False,
):
    refs = list(refs)
    u_ref, a1_ref, b1_ref = refs[:3]  # (1,RB,Wcp,C2), (1,1,C2), (1,1,C2)
    refs = refs[3:]
    if has_res:
        v_ref, a2_ref, b2_ref = refs[:3]
        refs = refs[3:]
    w_ref = refs.pop(0)  # (3, 3, C2, C2)
    out_ref = refs.pop(0)  # (1, RB, Wcp, C2)
    sum_ref = refs.pop(0)  # (1, 1, C2) fp32, accumulated over row blocks
    ssq_ref = refs.pop(0)  # (1, 1, C2) fp32
    h_out_ref = refs.pop(0) if emit_h else None
    buf = refs.pop(0)  # scratch (RB+2, Wcp, C2), transformed input

    i = pl.program_id(1)
    _, RB, Wcp, C2 = u_ref.shape
    Wc = Wcp - 2
    shift_out = shift_in + 1

    # ---- carry halo: previous block's last 2 transformed rows -> rows 0:2
    @pl.when(i == 0)
    def _():
        buf[0:2] = jnp.zeros((2, Wcp, C2), buf.dtype)

    @pl.when(i > 0)
    def _():
        buf[0:2] = buf[RB : RB + 2]

    # ---- input transform: affine (+ residual affine) + ReLU, masked to the
    # valid image region so conv SAME-padding zeros are exact
    h = u_ref[0].astype(jnp.float32) * a1_ref[0] + b1_ref[0]
    if relu_u:
        h = jnp.maximum(h, 0.0)
    if has_res:
        hv = jnp.maximum(v_ref[0].astype(jnp.float32) * a2_ref[0] + b2_ref[0], 0.0)
        h = jnp.maximum(h + hv, 0.0)

    # rows of this input block are real rows i*RB + k - shift_in
    row = jax.lax.broadcasted_iota(jnp.int32, (RB, Wcp, 1), 0) + i * RB - shift_in
    col = jax.lax.broadcasted_iota(jnp.int32, (RB, Wcp, 1), 1)
    valid = (row >= 0) & (row < H) & (col >= 1) & (col <= Wc)
    h = jnp.where(valid, h, 0.0)
    buf[2 : RB + 2] = h.astype(buf.dtype)

    if emit_h:
        h_out_ref[0] = h.astype(h_out_ref.dtype)

    # ---- 3x3 (rows x cells) conv over the transformed buffer
    acc = jnp.zeros((RB, Wc, C2), jnp.float32)
    for dr in range(3):
        hr = buf[dr : dr + RB]
        for dc in range(3):
            lhs = hr[:, dc : dc + Wc, :]
            acc = acc + jax.lax.dot_general(
                lhs,
                w_ref[dr, dc],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # fp32 activations (parity/validation mode): true-f32 MXU
                # passes — at DEFAULT the MXU truncates f32 operands to
                # bf16 mantissas, and the dense-w2d reformulation then
                # rounds differently from the XLA conv it is compared to
                # (bf16 shipped path: one pass either way, unaffected)
                precision=jax.lax.Precision.HIGHEST if hi_prec else None,
            )

    # ---- mask to valid OUTPUT rows, frame with zero cells, emit stats
    orow = jax.lax.broadcasted_iota(jnp.int32, (RB, Wc, 1), 0) + i * RB - shift_out
    y = jnp.where((orow >= 0) & (orow < H), acc, 0.0)

    out_ref[0, :, 1 : Wc + 1, :] = y.astype(out_ref.dtype)
    out_ref[0, :, 0:1, :] = jnp.zeros((RB, 1, C2), out_ref.dtype)
    out_ref[0, :, Wc + 1 : Wc + 2, :] = jnp.zeros((RB, 1, C2), out_ref.dtype)

    part_sum = jnp.sum(y, axis=(0, 1))[None]
    part_ssq = jnp.sum(y * y, axis=(0, 1))[None]

    @pl.when(i == 0)
    def _():
        sum_ref[0] = part_sum
        ssq_ref[0] = part_ssq

    @pl.when(i > 0)
    def _():
        sum_ref[0] = sum_ref[0] + part_sum
        ssq_ref[0] = ssq_ref[0] + part_ssq


def encoder_stage(
    u: jnp.ndarray,
    a1: jnp.ndarray,
    b1: jnp.ndarray,
    w_dense: jnp.ndarray,
    *,
    H: int,
    shift_in: int,
    v: Optional[jnp.ndarray] = None,
    a2: Optional[jnp.ndarray] = None,
    b2: Optional[jnp.ndarray] = None,
    emit_h: bool = False,
    relu_u: bool = True,
    interpret: bool = False,
    rb: Optional[int] = None,
):
    """One fused stage: ``y = conv3x3(relu(a1*u + b1 [+ relu(a2*v + b2)]))``.

    u, v: (B, Hp, Wcp, C2) framed w2d tensors (see :func:`w2d_pad`), where
    row k holds real row ``k - shift_in``. a*/b*: (B, C2) fp32 per-sample
    affines. w_dense: (3, 3, C2, C2) from :func:`w2d_conv3x3_weights`.

    Returns (y, sum, sumsq[, h]): y is framed with shift ``shift_in + 1``;
    sum / sumsq are per-(sample, w2d-channel) fp32 statistics of y over the
    valid region; h (if ``emit_h``) is the transformed input stream at
    ``shift_in`` (the residual tap the block structure needs later).
    """
    B, Hp, Wcp, C2 = u.shape
    RB = rb if rb is not None else R_BLOCK
    assert Hp % RB == 0, (Hp, RB)
    nblk = Hp // RB
    has_res = v is not None

    kernel = functools.partial(
        _stage_kernel,
        H=H,
        shift_in=shift_in,
        has_res=has_res,
        emit_h=emit_h,
        relu_u=relu_u,
        hi_prec=u.dtype == jnp.float32,
    )

    blk = pl.BlockSpec((1, RB, Wcp, C2), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, 1, C2), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)

    in_specs = [blk, vec, vec]
    args = [u, a1[:, None, :], b1[:, None, :]]
    if has_res:
        in_specs += [blk, vec, vec]
        args += [v, a2[:, None, :], b2[:, None, :]]
    in_specs.append(
        pl.BlockSpec((3, 3, C2, C2), lambda b, i: (0, 0, 0, 0), memory_space=pltpu.VMEM)
    )
    args.append(w_dense)

    out_shapes = [
        jax.ShapeDtypeStruct((B, Hp, Wcp, C2), u.dtype),
        jax.ShapeDtypeStruct((B, 1, C2), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, C2), jnp.float32),
    ]
    out_specs = [blk, vec, vec]
    if emit_h:
        out_shapes.append(jax.ShapeDtypeStruct((B, Hp, Wcp, C2), u.dtype))
        out_specs.append(blk)

    outs = pl.pallas_call(
        kernel,
        grid=(B, nblk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((RB + 2, Wcp, C2), u.dtype)],
        interpret=interpret,
    )(*args)
    y, s, ss = outs[0], outs[1][:, 0], outs[2][:, 0]
    if emit_h:
        return y, s, ss, outs[3]
    return y, s, ss


# ---------------------------------------------------------------------------
# Custom VJP (round 4): makes the fused chain trainable
# ---------------------------------------------------------------------------


def _valid_mask(Hp: int, Wcp: int, H: int, shift: int):
    """(Hp, Wcp, 1) fp32 mask of the real image region in a framed tensor
    whose row k holds real row ``k - shift`` (frame cells 0 and Wcp-1 are
    the conv padding)."""
    row = jnp.arange(Hp)[:, None, None] - shift
    col = jnp.arange(Wcp)[None, :, None]
    return ((row >= 0) & (row < H) & (col >= 1) & (col <= Wcp - 2)).astype(jnp.float32)


def _flip_transpose(w_dense: jnp.ndarray) -> jnp.ndarray:
    """Adjoint taps of a dense w2d conv: spatial flip + IO transpose."""
    return jnp.transpose(w_dense[::-1, ::-1], (0, 1, 3, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def _stage_ad(u, a1, b1, w_dense, v, a2, b2, H, shift_in, has_res, emit_h, relu_u, interpret, rb):
    kw = dict(H=H, shift_in=shift_in, emit_h=emit_h, relu_u=relu_u, interpret=interpret, rb=rb)
    if has_res:
        return encoder_stage(u, a1, b1, w_dense, v=v, a2=a2, b2=b2, **kw)
    return encoder_stage(u, a1, b1, w_dense, **kw)


def _stage_ad_fwd(u, a1, b1, w_dense, v, a2, b2, H, shift_in, has_res, emit_h, relu_u, interpret, rb):
    # always emit h under differentiation: it is the backward's residual
    # (the transformed conv input) for both the weight grad and the adjoint
    kw = dict(H=H, shift_in=shift_in, emit_h=True, relu_u=relu_u, interpret=interpret, rb=rb)
    if has_res:
        y, s, ss, h = encoder_stage(u, a1, b1, w_dense, v=v, a2=a2, b2=b2, **kw)
    else:
        y, s, ss, h = encoder_stage(u, a1, b1, w_dense, **kw)
    out = (y, s, ss, h) if emit_h else (y, s, ss)
    return out, (u, a1, b1, v, a2, b2, w_dense, y, h)


def _stage_ad_bwd(H, shift_in, has_res, emit_h, relu_u, interpret, rb, res, cts):
    u, a1, b1, v, a2, b2, w_dense, y, h = res
    if emit_h:
        gy, gs, gss, gh_out = cts
    else:
        gy, gs, gss = cts
        gh_out = None

    B, Hp, Wcp, C2 = u.shape
    shift_out = shift_in + 1
    f32 = jnp.float32

    # ---- cotangent of the raw conv output over the valid region:
    # y also feeds s = Σy and ss = Σy² (per sample/channel, valid region)
    m_out = _valid_mask(Hp, Wcp, H, shift_out)
    g_y = gy.astype(f32) + gs[:, None, None, :] + 2.0 * y.astype(f32) * gss[:, None, None, :]
    g_y = g_y * m_out

    # ---- adjoint SAME-conv: the same kernel family with identity affine,
    # flipped/transposed taps, input framed at shift_out. Extra bottom rows
    # keep the last real g_h row inside the padded grid.
    pad_n = -(-2 // rb) * rb
    g_y_in = jnp.pad(g_y.astype(u.dtype), ((0, 0), (0, pad_n), (0, 0), (0, 0)))
    ones = jnp.ones((B, C2), f32)
    zeros = jnp.zeros((B, C2), f32)
    g_h_framed, _, _ = encoder_stage(
        g_y_in, ones, zeros, _flip_transpose(w_dense),
        H=H, shift_in=shift_out, relu_u=False, interpret=interpret, rb=rb,
    )
    # output frame = shift_out + 1 = h frame + 2: realign to h's frame
    g_h = g_h_framed[:, 2 : 2 + Hp].astype(f32)
    if gh_out is not None:
        g_h = g_h + gh_out.astype(f32)

    # ---- elementwise backward through mask / ReLU stack / affines
    m_in = _valid_mask(Hp, Wcp, H, shift_in)
    g_h = g_h * m_in
    t1 = u.astype(f32) * a1[:, None, None, :] + b1[:, None, None, :]
    if has_res:
        # h = relu(relu?(t1) + relu(t2)); (h > 0) gates the outer relu
        g_pre = g_h * (h.astype(f32) > 0)
        t2 = v.astype(f32) * a2[:, None, None, :] + b2[:, None, None, :]
        g_t2 = g_pre * (t2 > 0)
        g_t1 = g_pre * (t1 > 0) if relu_u else g_pre
        g_v = (g_t2 * a2[:, None, None, :]).astype(v.dtype)
        g_a2 = jnp.sum(g_t2 * v.astype(f32), axis=(1, 2)).astype(a2.dtype)
        g_b2 = jnp.sum(g_t2, axis=(1, 2)).astype(b2.dtype)
    else:
        g_t1 = g_h * (t1 > 0) if relu_u else g_h
        g_v = g_a2 = g_b2 = None
    g_u = (g_t1 * a1[:, None, None, :]).astype(u.dtype)
    g_a1 = jnp.sum(g_t1 * u.astype(f32), axis=(1, 2)).astype(a1.dtype)
    g_b1 = jnp.sum(g_t1, axis=(1, 2)).astype(b1.dtype)

    # ---- dense-tap weight grad: 9 contractions over (B, rows, cells).
    # h pad of 1 row each side covers taps reaching outside the frame at
    # shift_in = 0 (top) / deep shifts (bottom); padded rows are zero so
    # they contribute nothing (h is zero-masked outside the valid region).
    hpad = jnp.pad(h.astype(f32), ((0, 0), (1, 1), (0, 0), (0, 0)))
    Wc = Wcp - 2
    gy_val = g_y[:, shift_out : shift_out + H, 1 : 1 + Wc, :]
    g_w = jnp.zeros(w_dense.shape, f32)
    for dr in range(3):
        for dc in range(3):
            # g_y real row ρ (frame shift_out) reads h real row ρ + dr - 1,
            # which sits at hpad row ρ + shift_in + dr (after the +1 pad)
            hw = hpad[:, shift_in + dr : shift_in + dr + H, dc : dc + Wc, :]
            g_w = g_w.at[dr, dc].set(
                jax.lax.dot_general(
                    hw, gy_val,
                    dimension_numbers=((((0, 1, 2), (0, 1, 2))), ((), ())),
                    preferred_element_type=f32,
                )
            )
    g_w = g_w.astype(w_dense.dtype)

    return g_u, g_a1, g_b1, g_w, g_v, g_a2, g_b2


_stage_ad.defvjp(_stage_ad_fwd, _stage_ad_bwd)


def encoder_stage_ad(
    u, a1, b1, w_dense, *, H, shift_in,
    v=None, a2=None, b2=None,
    emit_h=False, relu_u=True, interpret=False, rb=None,
):
    """:func:`encoder_stage` with a custom VJP — same signature/returns.

    Under plain evaluation this is exactly the forward kernel (the ``h``
    residual is only emitted when JAX runs the fwd rule, i.e. under
    differentiation), so inference cost is unchanged.
    """
    RB = rb if rb is not None else R_BLOCK
    return _stage_ad(
        u, a1, b1, w_dense, v, a2, b2,
        H, shift_in, v is not None, emit_h, relu_u, interpret, RB,
    )
