"""CGI-Stereo loss.

The reference's ``loss_cgi`` (meta_arch/cgi/loss.py:4-11) has a broken
signature — it lacks the ``args`` kwarg every caller passes and returns only
a scalar, making it incompatible with the DKT driver (SURVEY.md §7 known
bugs). This port fixes that: standard (loss, metrics, mask, ok) contract,
same math — smooth-L1 per prediction with weights [0.3, 1.0].

Note the CGI preds list mixes resolutions (quarter-res and full-res,
CGI_Stereo.py:264); the quarter-res head is compared against a 4×-strided
view of the GT, which is how the original CGI-Stereo repo trains it.
"""

from __future__ import annotations

import jax.numpy as jnp

from dkt_stereo_tpu.losses.gwc import _masked_mean, _smooth_l1

_WEIGHTS = (0.3, 1.0)


def loss_cgi(disp_preds, flow_gt, valid, maxdisp: float = 192.0):
    """``disp_preds``: [quarter (B,H/4,W/4), full (B,H,W)] negative disps."""
    flow_gt = flow_gt.astype(jnp.float32)
    m_full = (valid >= 0.5) & (jnp.abs(flow_gt) < maxdisp)
    gt_q = flow_gt[:, ::4, ::4]
    m_q = m_full[:, ::4, ::4]

    p_q = disp_preds[0].astype(jnp.float32)
    p_f = disp_preds[1].astype(jnp.float32)
    ok = (
        jnp.isfinite(jnp.where(m_full, flow_gt, 0.0)).all()
        & jnp.isfinite(p_q).all()
        & jnp.isfinite(p_f).all()
    )
    loss = _WEIGHTS[0] * _masked_mean(_smooth_l1(p_q - gt_q), m_q) + _WEIGHTS[
        1
    ] * _masked_mean(_smooth_l1(p_f - flow_gt), m_full)
    loss = jnp.where(ok, loss, 0.0)

    epe = jnp.abs(p_f - flow_gt)
    metrics = {
        "epe": _masked_mean(epe, m_full),
        "1px": _masked_mean((epe < 1).astype(jnp.float32), m_full),
        "3px": _masked_mean((epe < 3).astype(jnp.float32), m_full),
        "5px": _masked_mean((epe < 5).astype(jnp.float32), m_full),
    }
    return loss, metrics, m_full, ok
