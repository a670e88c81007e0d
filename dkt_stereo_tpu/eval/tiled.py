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

import collections

import numpy as np

# Small LRU keyed on (model identity, mesh, band geometry): entries hold the
# jitted band forward AND a strong reference to the model/params closure, so
# the cache must be bounded — a long-lived process evaluating many configs or
# frame sizes would otherwise pin every compiled trace forever.
_EXACT_JIT_CACHE: collections.OrderedDict = collections.OrderedDict()
_EXACT_JIT_CACHE_MAX = 8


def banded_forward_exact(
    model, params, img1, img2, mesh, halo: int = 96, divide_factor: int = 32
):
    """Cross-band-exact banded eval: one horizontal band per device, IN
    statistics made GLOBAL via psum (nn/norms.py::cross_band_stats).

    Exactness story vs the full-image forward on the same padded frame:
      - instance-norm statistics: exact (band interiors tile the padded
        image; halo/pad rows are masked out of the partial sums);
      - eval-mode BatchNorm: exact (running stats, no spatial coupling);
      - image top/bottom edges: exact (windows are clamped to the image, so
        the first/last band's tensor edge IS the image edge and conv SAME
        padding behaves identically);
      - interior band boundaries: exact to fp noise PROVIDED each segment of
        conv reach between halo exchanges stays under the halo
        (nn/norms.py::band_refresh swaps halo rows between neighbor bands
        after each encoder stage and each GRU iteration — windows overlap by
        2·halo, so a neighbor's copy of the same global row is exact there).
        Measured on RAFT at random init (the adversarial case — untrained
        weights amplify boundary perturbations): the shipped 3-GRU-layer
        config (configs/raft_stereo/base.json, 1/16-scale context branch)
        is < 1e-3 max-abs at halo=128 (tests/test_parallel.py pins it);
        without the exchange the same config saw ~4.6% peak boundary error.
        n_gru_layers=1 remains fp-exact at halo=64.

    ``model`` must be built with ``pallas_encoder=False`` (the fused encoder
    computes IN inside its kernel and would bypass the cross-band stats) —
    asserted here. ``halo`` must be a multiple of 32. img1/img2: (H, W, 3)
    numpy, values [0,255]. Returns (H, W) disparity (negative flow-x).
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from dkt_stereo_tpu.nn.norms import cross_band_stats
    from dkt_stereo_tpu.ops.pad import pad_dims

    assert not getattr(model.cfg, "pallas_encoder", False), (
        "banded_forward_exact needs module-level instance norms "
        "(pallas_encoder=False)"
    )
    assert halo % 32 == 0 and halo > 0, halo
    # the cross-band stats machinery (nn/norms.py::_banded_instance_stats)
    # tiles interiors at the coarsest context stride (1/32): band windows
    # must land on 32-row boundaries, which requires the padded frame height
    # to be a multiple of 32 as well — i.e. a 32-divisible divide_factor.
    # A 16-divisible factor would CLAMP win0 to a misaligned offset and
    # silently corrupt the psum'd statistics.
    assert divide_factor % 32 == 0 and divide_factor > 0, (
        f"banded_forward_exact requires divide_factor % 32 == 0 "
        f"(got {divide_factor}): band windows must align to the 1/32-scale "
        "context stride for exact cross-band instance-norm statistics"
    )
    n_bands = int(np.prod(mesh.devices.shape))
    axis = mesh.axis_names[0]
    H, W, _ = img1.shape

    # pad the FULL frame exactly like the unbanded eval path ('sintel'
    # replicate mode, ops/pad.py), then band the padded frame
    (pt, pb), (pl, pr) = pad_dims(H, W, divide_factor, "sintel")
    a = np.pad(img1, ((pt, pb), (pl, pr), (0, 0)), mode="edge")
    b = np.pad(img2, ((pt, pb), (pl, pr), (0, 0)), mode="edge")
    fh = a.shape[0]

    band_h = int(np.ceil(fh / n_bands / 32)) * 32
    th = band_h + 2 * halo
    if th >= fh:
        # image too small to band: run it replicated (band 0 covers it)
        th = fh
        band_h = fh
        halo = 0
    win0 = [int(np.clip(k * band_h - halo, 0, fh - th)) for k in range(n_bands)]
    bands_a = np.stack([a[w : w + th] for w in win0])
    bands_b = np.stack([b[w : w + th] for w in win0])

    key = (id(model), mesh, th, band_h, fh, bands_a.shape, halo)
    if key not in _EXACT_JIT_CACHE:

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=P(axis),
            check_rep=False,
        )
        def run(p, xa, xb):
            _, disp = model.apply(p, xa, xb)
            return disp

        _EXACT_JIT_CACHE[key] = jax.jit(run)
        while len(_EXACT_JIT_CACHE) > _EXACT_JIT_CACHE_MAX:
            _EXACT_JIT_CACHE.popitem(last=False)
    else:
        _EXACT_JIT_CACHE.move_to_end(key)

    sh = jax.sharding.NamedSharding(mesh, P(axis))
    rep = jax.sharding.NamedSharding(mesh, P())
    params = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params)
    da = jax.device_put(jnp.asarray(bands_a, jnp.float32), sh)
    db = jax.device_put(jnp.asarray(bands_b, jnp.float32), sh)
    # the context must be live when the cached fn TRACES (its first call);
    # the banded-stats trace is keyed separately from any unbanded jit of
    # the same model, so the cache cannot leak a non-banded trace in
    with cross_band_stats(axis, th, halo, band_h, fh, n_bands):
        disp = np.asarray(_EXACT_JIT_CACHE[key](params, da, db))  # (n_bands, th, Wp)

    out = np.zeros((fh, a.shape[1]), np.float32)
    for k in range(n_bands):
        off = k * band_h - win0[k]
        ilen = int(np.clip(fh - k * band_h, 0, band_h))
        if ilen > 0:
            out[k * band_h : k * band_h + ilen] = disp[k, off : off + ilen]
    return out[pt : pt + H, pl : pl + W]


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
