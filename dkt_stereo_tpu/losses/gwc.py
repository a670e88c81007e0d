"""GWCNet stacked-hourglass loss (rebuild of meta_arch/gwcnet/gwc_loss.py:5-31).

Per-head smooth-L1 with weights [0.5, 0.5, 0.7, 1.0]; validity mask
``valid ≥ 0.5 ∧ |gt| < maxdisp``. Same jit-safe ``ok`` convention as
sequence_loss_raft (the reference asserts no-inf instead, :13)."""

from __future__ import annotations

import jax.numpy as jnp

_WEIGHTS = (0.5, 0.5, 0.7, 1.0)


def _smooth_l1(x):
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def _masked_mean(x, m):
    return jnp.where(m, x, 0.0).sum() / jnp.maximum(m.sum(), 1.0)


def loss_gwcnet(disp_preds, flow_gt, valid, maxdisp: float = 192.0):
    """``disp_preds``: (4, B, H, W); ``flow_gt``/``valid``: (B, H, W)."""
    flow_gt = flow_gt.astype(jnp.float32)
    preds = disp_preds.astype(jnp.float32)
    mag = jnp.abs(flow_gt)
    m = (valid >= 0.5) & (mag < maxdisp)
    ok = jnp.isfinite(jnp.where(m, flow_gt, 0.0)).all() & jnp.isfinite(preds).all()

    loss = sum(
        w * _masked_mean(_smooth_l1(preds[i] - flow_gt), m)
        for i, w in enumerate(_WEIGHTS[: preds.shape[0]])
    )
    loss = jnp.where(ok, loss, 0.0)

    epe = jnp.abs(preds[-1] - flow_gt)
    metrics = {
        "epe": _masked_mean(epe, m),
        "1px": _masked_mean((epe < 1).astype(jnp.float32), m),
        "3px": _masked_mean((epe < 3).astype(jnp.float32), m),
        "5px": _masked_mean((epe < 5).astype(jnp.float32), m),
    }
    return loss, metrics, m, ok
