"""NeRF-Stereo loss (rebuild of meta_arch/nerf_stereo/loss.py:92-181).

Confidence-weighted disparity L1 + trinocular photometric term
(0.15·L1 + 0.85·SSIM, min over left/right reconstructions, automask) with
γ-decay over iterations. Disparities negative throughout (the reference's
own comment at :129). The reference's ``binocular_loss`` references an
undefined ``valid`` (:120, dead code) — only the trinocular path is ported.
"""

from __future__ import annotations

import jax.numpy as jnp

from dkt_stereo_tpu.ops.warp import disp_warp, ssim


def photometric_loss(im1, im2):
    """loss.py:87-91: 0.15·L1 + 0.85·SSIM-distance, channel-meaned → (B,H,W)."""
    l1 = jnp.abs(im1 - im2).mean(axis=-1)
    s = ssim(im2, im1).mean(axis=-1)
    return 0.15 * l1 + 0.85 * s


def trinocular_loss(disp, im1, im2, im3, uncertainty, valid):
    """loss.py:92-109. ``disp``: (B,H,W,1) negative; images (B,H,W,3)."""
    rec12, mask12 = disp_warp(im1, disp, r2l=True)
    rec23, mask23 = disp_warp(im3, disp, r2l=False)
    pl12 = photometric_loss(im2, mask12 * rec12)
    pl23 = photometric_loss(im2, mask23 * rec23)
    loss_warp = jnp.minimum(pl12, pl23)
    loss_2 = jnp.minimum(photometric_loss(im2, im1), photometric_loss(im2, im3))
    automask = (loss_warp < loss_2) & (valid >= 0.5)
    num = jnp.where(automask, loss_warp * uncertainty, 0.0).sum()
    return num / jnp.maximum(automask.sum(), 1.0)


def ns_loss(
    pred_disps,  # (N, B, H, W) negative
    target_disp,  # (B, H, W) negative
    conf,  # (B, H, W)
    im0, im1, im2,  # (B, H, W, 3) clean triplet
    alpha_disp_loss: float = 1.0,
    alpha_photometric: float = 0.1,
    conf_threshold: float = 0.5,
    max_flow: float = 512.0,
    loss_gamma: float = 0.9,
):
    target = target_disp.astype(jnp.float32)
    preds = pred_disps.astype(jnp.float32)
    n = preds.shape[0]

    conf = conf * (target < 0).astype(jnp.float32)
    valid = (conf > conf_threshold).astype(jnp.float32)
    mag = jnp.abs(target)
    m = (valid >= 0.5) & (mag < max_flow)
    ok = jnp.isfinite(jnp.where(m, target, 0.0)).all() & jnp.isfinite(preds).all()

    gamma_adj = loss_gamma ** (15.0 / (n - 1)) if n > 1 else 1.0
    disp_loss = 0.0
    photo_loss = 0.0
    for i in range(n):
        w = gamma_adj ** (n - 1 - i)
        diff = jnp.abs(preds[i] - target) * conf
        disp_loss = disp_loss + w * (jnp.where(m, diff, 0.0).sum() / jnp.maximum(m.sum(), 1.0))
        if alpha_photometric != 0.0:
            photo_loss = photo_loss + w * trinocular_loss(
                preds[i][..., None], im0, im1, im2, 1.0 - conf, m.astype(jnp.float32)
            )
    loss = alpha_disp_loss * disp_loss + alpha_photometric * photo_loss
    loss = jnp.where(ok, loss, 0.0)

    epe = jnp.abs(preds[-1] - target)
    mm = jnp.maximum(m.sum(), 1.0)
    metrics = {
        "epe": jnp.where(m, epe, 0.0).sum() / mm,
        "1px": jnp.where(m, (epe < 1).astype(jnp.float32), 0.0).sum() / mm,
        "3px": jnp.where(m, (epe < 3).astype(jnp.float32), 0.0).sum() / mm,
        "5px": jnp.where(m, (epe < 5).astype(jnp.float32), 0.0).sum() / mm,
    }
    return loss, metrics, m, ok
