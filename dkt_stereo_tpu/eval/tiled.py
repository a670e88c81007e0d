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


def banded_forward_mesh(forward, img1, img2, mesh, halo: int = 64, divide_factor: int = 32):
    """Mesh-parallel banded eval: one horizontal band per device of a 1-D
    mesh, processed as a single sharded batch. Stereo correlation is
    row-local, so no cross-band communication happens inside the model — the
    mesh axis acts as this framework's "context parallelism" for very large
    images (SURVEY.md §5).

    ``forward`` must accept a batched (N, h, w, 3) pair and return (N, h, w).
    Bands are equal-height (H padded up), each with ``halo`` rows of context.

    Caveat: models with instance normalization (RAFT's fnet) compute
    whole-image statistics, so banding perturbs features beyond the halo;
    with trained weights on natural images the stats are near-stationary and
    the approximation is tight, but it is not exact.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dkt_stereo_tpu.ops.pad import pad_dims

    n_bands = int(np.prod(mesh.devices.shape))
    H, W, _ = img1.shape
    band_h = int(np.ceil(H / n_bands))
    # uniform banded crop with halo, replicate-padded at the image border
    pad_top = halo
    pad_bot = halo + band_h * n_bands - H
    a = np.pad(img1, ((pad_top, pad_bot), (0, 0), (0, 0)), mode="edge")
    b = np.pad(img2, ((pad_top, pad_bot), (0, 0), (0, 0)), mode="edge")
    bh = band_h + 2 * halo
    bands_a = np.stack([a[i * band_h : i * band_h + bh] for i in range(n_bands)])
    bands_b = np.stack([b[i * band_h : i * band_h + bh] for i in range(n_bands)])

    (pt, pb), (pl, pr) = pad_dims(bh, W, divide_factor, "sintel")
    bands_a = np.pad(bands_a, ((0, 0), (pt, pb), (pl, pr), (0, 0)), mode="edge")
    bands_b = np.pad(bands_b, ((0, 0), (pt, pb), (pl, pr), (0, 0)), mode="edge")

    sh = NamedSharding(mesh, P(mesh.axis_names[0]))
    da = jax.device_put(jnp.asarray(bands_a), sh)
    db = jax.device_put(jnp.asarray(bands_b), sh)
    disp = np.asarray(forward(da, db))  # (n_bands, bh+pads, W+pads)
    disp = disp[:, pt : pt + bh, pl : pl + W]

    out = np.zeros((H, W), np.float32)
    for i in range(n_bands):
        y0 = i * band_h
        y1 = min(H, y0 + band_h)
        out[y0:y1] = disp[i, halo : halo + (y1 - y0)]
    return out


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
