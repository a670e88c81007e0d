"""PCVNet loss (rebuild of meta_arch/pcvnet/loss.py:4-73).

Per-iteration weights [0.4, 0.6, 0.8, 1, 1.2, 1.4] on (a) the mixture
disparity L1 and (b) the per-Gaussian mean μ L1, plus 1.4·smooth-L1 on the
refined disparity. Rich metrics incl. bad1/2/5. The reference indexes
``final_disp_preds[3]`` for the headline epe (loss.py:53) — preserved when
≥4 iterations exist, clamped otherwise.

Accepts the framework's negative-flow GT and negates internally (the
reference's PCV loss expects positive disparities, loss.py:14)."""

from __future__ import annotations

import jax.numpy as jnp

from dkt_stereo_tpu.losses.gwc import _masked_mean, _smooth_l1

_I_WEIGHTS = (0.4, 0.6, 0.8, 1.0, 1.2, 1.4)


def sequence_loss_pcvnet(output_list, flow_gt, valid, max_disp: float = 512.0):
    """``output_list``: (refined_up (B,H,W), disp_seq (N,B,H,W),
    mu_seq (N,B,H,W,G), w_seq, sigma_seq) — positive disparities.
    ``flow_gt``: (B,H,W) negative-flow GT."""
    refined, disp_seq, mu_seq, w_seq, sigma_seq = output_list
    disp_gt = -flow_gt.astype(jnp.float32)  # → positive
    n = disp_seq.shape[0]

    m = (disp_gt < max_disp) & (valid >= 0.5) & (disp_gt >= 0)
    ok = (
        jnp.isfinite(jnp.where(m, disp_gt, 0.0)).all()
        & jnp.isfinite(disp_seq).all()
        & jnp.isfinite(mu_seq).all()
        & jnp.isfinite(refined).all()
    )

    loss = 0.0
    for i in range(n):
        wgt = _I_WEIGHTS[i] if i < len(_I_WEIGHTS) else _I_WEIGHTS[-1]
        l1 = _masked_mean(jnp.abs(disp_seq[i] - disp_gt), m)
        l2 = _masked_mean(jnp.abs(mu_seq[i] - disp_gt[..., None]).mean(-1), m)
        loss = loss + wgt * (l1 + l2)
    loss = loss + 1.4 * _masked_mean(_smooth_l1(refined - disp_gt), m)
    loss = jnp.where(ok, loss, 0.0)

    epe = jnp.abs(disp_seq[min(3, n - 1)] - disp_gt)
    epe_f = jnp.abs(refined - disp_gt)
    metrics = {
        "epe": _masked_mean(epe, m),
        "1px": _masked_mean((epe < 1).astype(jnp.float32), m),
        "3px": _masked_mean((epe < 3).astype(jnp.float32), m),
        "5px": _masked_mean((epe < 5).astype(jnp.float32), m),
        "bad1": _masked_mean((epe > 1).astype(jnp.float32), m),
        "bad2": _masked_mean((epe > 2).astype(jnp.float32), m),
        "bad5": _masked_mean((epe > 5).astype(jnp.float32), m),
        "epe_final": _masked_mean(epe_f, m),
        "1px_final": _masked_mean((epe_f < 1).astype(jnp.float32), m),
        "3px_final": _masked_mean((epe_f < 3).astype(jnp.float32), m),
        "5px_final": _masked_mean((epe_f < 5).astype(jnp.float32), m),
        "bad1_final": _masked_mean((epe_f > 1).astype(jnp.float32), m),
        "bad2_final": _masked_mean((epe_f > 2).astype(jnp.float32), m),
        "bad5_final": _masked_mean((epe_f > 5).astype(jnp.float32), m),
    }
    return loss, metrics, m, ok
