"""Banded (H-sharded) evaluation for very large images.

The reference's answer to memory pressure at full-res Middlebury/Booster is
the corr implementation switch (materialize vs recompute,
raft_stereo.py:118-129) and PCVNet's half→full cascade. The TPU-native
analogue (SURVEY.md §5 "long-context"): stereo correlation is **row-local**,
so an image can be split into horizontal bands with only a convolutional
halo — each band is exact for the cost volume and approximate only within
the halo margin of the 2D networks' receptive field.

``banded_forward`` runs bands sequentially on one chip (peak-memory ÷
n_bands); pass a mesh to instead ``device_put`` each band on a different
device of a ``('spatial',)`` mesh axis and run them as one batch
(throughput, the "context parallelism" story — no halo comm needed in the
corr kernel itself).
"""

from __future__ import annotations

import numpy as np


def banded_forward(forward, img1, img2, n_bands: int = 2, halo: int = 64, divide_factor: int = 32):
    """img1/img2: (H, W, 3) numpy. Returns (H, W) disparity.

    ``forward``: jitted (1,h,w,3)×2 → (1,h,w) callable (negative-flow).
    ``halo`` should cover the receptive field of the encoders + GRU updates
    (64 px at 1/4-res features ≈ 256 px effective context).
    """
    import jax.numpy as jnp

    from dkt_stereo_tpu.ops.pad import pad_input, unpad_input

    H, W, _ = img1.shape
    assert n_bands >= 1
    band_h = int(np.ceil(H / n_bands))
    out = np.zeros((H, W), np.float32)

    for b in range(n_bands):
        y0 = b * band_h
        y1 = min(H, y0 + band_h)
        ys = max(0, y0 - halo)
        ye = min(H, y1 + halo)
        a = jnp.asarray(img1[None, ys:ye])
        c = jnp.asarray(img2[None, ys:ye])
        ap, spec = pad_input(a, divide_factor, "sintel")
        cp, _ = pad_input(c, divide_factor, "sintel")
        disp = forward(ap, cp)
        disp = np.asarray(unpad_input(disp[..., None], spec))[0, ..., 0]
        out[y0:y1] = disp[y0 - ys : y0 - ys + (y1 - y0)]
    return out
