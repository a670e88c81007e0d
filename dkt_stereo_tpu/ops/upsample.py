"""Learned upsampling ops: RAFT convex upsampling and IGEV/CGI context upsample.

Pure-XLA formulations: the 3×3 "unfold" is expressed as 9 static shifted
slices of a zero-padded array (stacked on a new axis), the convex combination
as a fused multiply-reduce, and the sub-pixel rearrangement as a
reshape/transpose (free at the XLA layout level). No gathers anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unfold3x3(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) → (B,H,W,9,C): 3×3 zero-padded neighborhoods.

    Tap order matches torch ``F.unfold([3,3], padding=1)``: k = ky*3+kx,
    neighbor offset (ky-1, kx-1), row-major over (dy, dx)."""
    B, H, W, C = x.shape
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [p[:, ky : ky + H, kx : kx + W, :] for ky in range(3) for kx in range(3)]
    return jnp.stack(taps, axis=3)


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray, factor: int, scale: bool = True) -> jnp.ndarray:
    """RAFT convex upsampling (meta_arch/raft_stereo/raft_stereo.py:70-82).

    ``flow``: (B,H,W,D) coarse field; ``mask``: (B,H,W,9*factor²) logits with
    channel layout c = (k*factor + fy)*factor + fx (torch ``view(N,1,9,f,f)``).
    Returns (B, H*factor, W*factor, D); values scaled ×factor unless
    ``scale=False`` (PCVNet upsamples mixture weights unscaled,
    pcvnet/model.py:62-73)."""
    B, H, W, D = flow.shape
    f = factor
    m = mask.reshape(B, H, W, 9, f * f).astype(jnp.float32)
    m = jax.nn.softmax(m, axis=3)

    nb = _unfold3x3(flow.astype(jnp.float32) * (f if scale else 1))  # (B,H,W,9,D)
    # out[b,y,x,p,d] = sum_k m[b,y,x,k,p] * nb[b,y,x,k,d]  (p = fy*f+fx)
    out = jnp.einsum("bhwkp,bhwkd->bhwpd", m, nb, precision=jax.lax.Precision.HIGHEST)
    out = out.reshape(B, H, W, f, f, D)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * f, W * f, D)
    return out.astype(flow.dtype)


def context_upsample(disp_low: jnp.ndarray, up_weights: jnp.ndarray) -> jnp.ndarray:
    """IGEV/CGI ×4 context upsample (meta_arch/igev_stereo/submodule.py:242-254).

    ``disp_low``: (B,H,W,1); ``up_weights``: (B,4H,4W,9) (already softmaxed by
    the caller, as in igev_stereo.py:141-147). The reference unfolds 3×3 at low
    res, nearest-upsamples the 9 taps ×4, then takes the weighted sum.
    Returns (B,4H,4W) (channel squeezed, matching ``.sum(1)``)."""
    B, H, W, _ = disp_low.shape
    nb = _unfold3x3(disp_low)[..., 0]  # (B,H,W,9)
    # nearest ×4: repeat each spatial cell
    nb = jnp.repeat(jnp.repeat(nb, 4, axis=1), 4, axis=2)  # (B,4H,4W,9)
    return (nb * up_weights).sum(axis=-1)
