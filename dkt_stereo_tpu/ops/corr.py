"""All-pairs 1D correlation: volume, pyramid, and pyramid lookup.

TPU-native rebuild of the reference's ``CorrBlock1D`` (core/corr.py:110-156)
and ``CorrBlock1D_Cosine`` (core/corr.py:160-209):

  - volume: ``corr[b,h,i,j] = <f1[b,h,i,:], f2[b,h,j,:]> / sqrt(D)`` — one
    batched matmul on the MXU, fp32 accumulation regardless of feature dtype
    (the reference always runs correlation in fp32: raft_stereo.py:116).
  - pyramid: mean-pool pairs along the j (right-image width) axis, ``L``
    levels. The reference builds L+1 levels but only ever samples L of them
    (core/corr.py:123-125 vs :133); we build exactly L.
  - lookup: at level i, sample 2r+1 offsets around ``x/2^i`` with 1D bilinear
    interpolation and zero padding (core/corr.py:133-146), concatenated over
    levels → (B, H, W, L*(2r+1)), fp32 (``:146`` casts to float).

The lookup here is the pure-XLA reference implementation (a single gather per
level); ``ops/pallas/corr_lookup.py`` provides the fused Pallas kernel used on
the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dkt_stereo_tpu.ops.sampler import sample_row_1d


def corr_volume(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    normalize: bool = False,
    out_dtype=None,
) -> jnp.ndarray:
    """(B,H,W1,D),(B,H,W2,D) → (B,H,W1,W2) correlation volume, fp32 accumulation.

    ``normalize=True`` gives the cosine variant (core/corr.py:198-209):
    features L2-normalized over D, no 1/sqrt(D) scaling, values in [-1, 1].

    Precision policy: fp32 inputs get HIGHEST (exact parity with the
    reference's fp32 matmul, raft_stereo.py:116); bf16 inputs use the MXU's
    native bf16×bf16→fp32 path (the TPU fast path — pass bf16 features +
    ``out_dtype=jnp.bfloat16`` to halve volume HBM traffic).
    """
    D = fmap1.shape[-1]
    f1, f2 = fmap1, fmap2
    if normalize:
        f1 = (f1 / jnp.linalg.norm(f1.astype(jnp.float32), axis=-1, keepdims=True)).astype(f1.dtype)
        f2 = (f2 / jnp.linalg.norm(f2.astype(jnp.float32), axis=-1, keepdims=True)).astype(f2.dtype)
    precision = jax.lax.Precision.HIGHEST if f1.dtype == jnp.float32 else None
    corr = jnp.einsum(
        "bhid,bhjd->bhij",
        f1,
        f2,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if not normalize:
        corr = corr / jnp.sqrt(jnp.asarray(D, jnp.float32))
    return corr.astype(out_dtype) if out_dtype is not None else corr


def corr_pyramid(volume: jnp.ndarray, num_levels: int = 4) -> list[jnp.ndarray]:
    """Mean-pool pairs along the last axis, ``num_levels`` entries (level 0 =
    the input volume). Odd trailing widths drop the last column, matching
    torch ``avg_pool2d([1,2], stride=[1,2])`` floor behavior."""
    pyramid = [volume]
    v = volume
    for _ in range(num_levels - 1):
        w2 = v.shape[-1]
        v = v[..., : (w2 // 2) * 2]
        v = v.reshape(*v.shape[:-1], w2 // 2, 2).mean(axis=-1)
        pyramid.append(v)
    return pyramid


def fmap_pyramid(fmap2: jnp.ndarray, num_levels: int, factor: int = 2) -> list[jnp.ndarray]:
    """Width-pooled right-feature pyramid for the memory-efficient "alt"
    lookup (core/corr.py:104: ``avg_pool2d(fmap2, [1,2])`` per level).
    ``factor`` generalizes to PCVNet's compress_factor pooling
    (meta_arch/pcvnet/corr.py:24-31)."""
    pyr = [fmap2]
    f = fmap2
    for _ in range(num_levels - 1):
        w = f.shape[2]
        keep = (w // factor) * factor
        f = f[:, :, :keep].reshape(
            f.shape[0], f.shape[1], w // factor, factor, f.shape[-1]
        ).mean(3)
        pyr.append(f)
    return pyr


def corr_pyramid_fused(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    num_levels: int = 4,
    normalize: bool = False,
    out_dtype=None,
    scaled: bool = True,
    pool_factor: int = 2,
) -> list[jnp.ndarray]:
    """Build the correlation pyramid level-by-level as ``f1 @ pooled(f2)``.

    ``scaled=False`` omits the 1/sqrt(D) factor (IGEV's init correlation,
    meta_arch/igev_stereo/geometry.py:62-69). ``pool_factor`` generalizes to
    PCVNet's compress_factor pyramid (meta_arch/pcvnet/corr.py:24-31).

    Numerically equivalent to ``corr_pyramid(corr_volume(f1, f2))`` because
    the [1,2] average pool is linear in fmap2 (mean of dot = dot of mean) —
    and slightly *more* accurate for low-precision volumes, since every
    level gets fp32 matmul accumulation instead of pooling an already
    rounded volume. On TPU it also skips the volume's pool relayouts: the
    einsum chain measured 6.1 → ~1 ms at 736×1280 eval geometry.
    """
    D = fmap1.shape[-1]
    f1, f2 = fmap1, fmap2
    if normalize:
        f1 = (f1 / jnp.linalg.norm(f1.astype(jnp.float32), axis=-1, keepdims=True)).astype(f1.dtype)
        f2 = (f2 / jnp.linalg.norm(f2.astype(jnp.float32), axis=-1, keepdims=True)).astype(f2.dtype)
    precision = jax.lax.Precision.HIGHEST if f1.dtype == jnp.float32 else None
    scale = 1.0 if (normalize or not scaled) else 1.0 / float(np.sqrt(D))
    pyramid = []
    for f2l in fmap_pyramid(f2, num_levels, pool_factor):
        corr = jnp.einsum(
            "bhid,bhjd->bhij",
            f1,
            f2l,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        if scale != 1.0:
            corr = corr * scale
        pyramid.append(corr.astype(out_dtype) if out_dtype is not None else corr)
    return pyramid


def corr_lookup_alt(
    fmap1: jnp.ndarray,
    f2_pyramid: list[jnp.ndarray],
    coords_x: jnp.ndarray,
    radius: int = 4,
) -> jnp.ndarray:
    """Memory-efficient on-the-fly lookup (core/corr.py:64-107, config "alt"):
    sample the pooled right features at the tap positions and dot with the
    left features — no W×W₂ volume is ever materialized. Numerically equal to
    the materialized path because average pooling is linear in fmap2.

    fmap1: (B,H,W,D); coords_x: (B,H,W,1). Returns (B,H,W,L·(2r+1)) fp32.
    """
    B, H, W, D = fmap1.shape
    r = radius
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)
    K = 2 * r + 1
    f1 = fmap1.astype(jnp.float32)
    out = []
    for i, f2 in enumerate(f2_pyramid):
        S = f2.shape[2]
        x = coords_x.astype(jnp.float32) / (2**i) + dx  # (B,H,W,K)
        x0 = jnp.floor(x)
        w = x - x0

        def tap(ix):
            inb = ((ix >= 0) & (ix <= S - 1)).astype(jnp.float32)
            ixc = jnp.clip(ix, 0, S - 1).astype(jnp.int32).reshape(B, H, W * K)
            vals = jnp.take_along_axis(
                f2.astype(jnp.float32), ixc[..., None], axis=2
            ).reshape(B, H, W, K, D)
            return vals * inb[..., None]

        sampled = tap(x0) * (1 - w)[..., None] + tap(x0 + 1) * w[..., None]
        # fp32 correlation policy (CLAUDE.md): inputs are cast to fp32 above,
        # so force full-precision accumulation — TPU default would truncate
        # the dot to bf16 mantissa
        corr = jnp.einsum(
            "bhwkd,bhwd->bhwk", sampled, f1,
            precision=jax.lax.Precision.HIGHEST,
        ) / jnp.sqrt(jnp.asarray(D, jnp.float32))
        out.append(corr)
    return jnp.concatenate(out, axis=-1)


def corr_lookup(
    pyramid: list[jnp.ndarray], coords_x: jnp.ndarray, radius: int = 4
) -> jnp.ndarray:
    """Sample the pyramid at ``coords_x`` (B,H,W,1) → (B,H,W,L*(2r+1)) fp32.

    Per level i: positions ``coords_x/2^i + dx`` for dx in [-r..r]
    (core/corr.py:135-141); channel order is [level0 taps, level1 taps, ...]
    with taps ordered -r..r, matching the reference concat (:145)."""
    r = radius
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)
    out = []
    for i, vol in enumerate(pyramid):
        x = coords_x.astype(jnp.float32) / (2**i) + dx  # (B,H,W,2r+1)
        out.append(sample_row_1d(vol, x))
    return jnp.concatenate(out, axis=-1)
