"""RAFT sequence loss (rebuild of meta_arch/raft_stereo/loss.py:3-41).

Differences forced by jit:
  - predictions arrive stacked (iters, B, H, W) from the model's scan, so the
    per-iteration γ-decayed L1 is one vectorized weighted sum;
  - the reference returns ``(None, None, None)`` on inf GT / NaN predictions
    (loss.py:17-23) — un-jittable; instead we return ``ok`` (scalar bool) and
    a loss that is zeroed when not ok, so the train step can mask the update
    (equivalent to the reference's "skip this step" behavior).
"""

from __future__ import annotations

import jax.numpy as jnp


def _masked_mean(x, mask):
    denom = jnp.maximum(mask.sum(), 1.0)
    return jnp.where(mask, x, 0.0).sum() / denom


def sequence_loss_raft(
    disp_preds: jnp.ndarray,  # (N, B, H, W) negative-disparity flow
    flow_gt: jnp.ndarray,  # (B, H, W)
    valid: jnp.ndarray,  # (B, H, W) 0/1
    loss_gamma: float = 0.9,
    max_flow: float = 700.0,
):
    n = disp_preds.shape[0]
    assert n >= 1
    flow_gt = flow_gt.astype(jnp.float32)
    preds = disp_preds.astype(jnp.float32)

    mag = jnp.abs(flow_gt)  # 1-channel L2 == abs (loss.py:11)
    m = (valid >= 0.5) & (mag < max_flow)

    finite_gt = jnp.isfinite(jnp.where(m, flow_gt, 0.0)).all()
    finite_pred = jnp.isfinite(preds).all()
    ok = finite_gt & finite_pred

    # γ adjusted for iteration count (loss.py:25)
    gamma_adj = loss_gamma ** (15.0 / (n - 1)) if n > 1 else 1.0
    weights = jnp.asarray([gamma_adj ** (n - 1 - i) for i in range(n)], jnp.float32)

    abs_err = jnp.abs(preds - flow_gt[None])  # (N,B,H,W)
    per_iter = jnp.stack([_masked_mean(abs_err[i], m) for i in range(n)])
    loss = (weights * per_iter).sum()
    loss = jnp.where(ok, loss, 0.0)

    epe = jnp.abs(preds[-1] - flow_gt)
    metrics = {
        "epe": _masked_mean(epe, m),
        "1px": _masked_mean((epe < 1).astype(jnp.float32), m),
        "3px": _masked_mean((epe < 3).astype(jnp.float32), m),
        "5px": _masked_mean((epe < 5).astype(jnp.float32), m),
    }
    return loss, metrics, m, ok


def sequence_loss_igev(
    disp_preds: jnp.ndarray,  # (N, B, H, W) negative-disparity flow
    init_disp: jnp.ndarray,  # (B, H, W) soft-argmin init, upsampled, negative
    flow_gt: jnp.ndarray,  # (B, H, W)
    valid: jnp.ndarray,  # (B, H, W) 0/1
    loss_gamma: float = 0.9,
    max_disp: float = 192.0,
):
    """IGEV sequence loss. The reference's meta_arch/igev_stereo/loss.py is
    an EMPTY file (IGEV is unregistered there, SURVEY §2.3); registering the
    model needs a loss, and this follows upstream IGEV-Stereo's: a unit-
    weight smooth-L1 term on the soft-argmin init disparity plus the
    γ-decayed L1 over the GRU refinements. The init term matters beyond
    fidelity: every scan iteration stop-grads the incoming disparity
    (igev_stereo.py:154, the reference's detach), so without it the 3D
    cost-aggregation classifier and the init spx upsampling chain would
    receive exactly zero gradient during fine-tune (while AdamW weight
    decay erodes them)."""
    n = disp_preds.shape[0]
    assert n >= 1
    flow_gt = flow_gt.astype(jnp.float32)
    preds = disp_preds.astype(jnp.float32)
    init = init_disp.astype(jnp.float32)

    mag = jnp.abs(flow_gt)
    m = (valid >= 0.5) & (mag < max_disp)

    ok = (
        jnp.isfinite(jnp.where(m, flow_gt, 0.0)).all()
        & jnp.isfinite(preds).all()
        & jnp.isfinite(init).all()
    )

    err0 = jnp.abs(init - flow_gt)
    smooth_l1 = jnp.where(err0 < 1.0, 0.5 * err0 * err0, err0 - 0.5)
    loss = _masked_mean(smooth_l1, m)

    gamma_adj = loss_gamma ** (15.0 / (n - 1)) if n > 1 else 1.0
    weights = jnp.asarray([gamma_adj ** (n - 1 - i) for i in range(n)], jnp.float32)
    abs_err = jnp.abs(preds - flow_gt[None])
    per_iter = jnp.stack([_masked_mean(abs_err[i], m) for i in range(n)])
    loss = loss + (weights * per_iter).sum()
    loss = jnp.where(ok, loss, 0.0)

    epe = jnp.abs(preds[-1] - flow_gt)
    metrics = {
        "epe": _masked_mean(epe, m),
        "init_epe": _masked_mean(err0, m),
        "1px": _masked_mean((epe < 1).astype(jnp.float32), m),
        "3px": _masked_mean((epe < 3).astype(jnp.float32), m),
        "5px": _masked_mean((epe < 5).astype(jnp.float32), m),
    }
    return loss, metrics, m, ok
