"""Parallelism layer on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dkt_stereo_tpu.parallel import make_mesh, replicate, shard_batch
from dkt_stereo_tpu.parallel.mesh import cross_replica_batch_stats


def test_mesh_and_batch_sharding():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    batch = {"x": np.ones((16, 4, 4, 3), np.float32), "y": np.zeros((16,), np.float32)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])

    params = {"w": np.ones((3, 3), np.float32)}
    rep = replicate(params, mesh)
    assert rep["w"].sharding.spec == P()


def test_sharded_jit_step_reduces_over_mesh():
    mesh = make_mesh(8)
    batch = shard_batch({"x": np.arange(16, dtype=np.float32).reshape(16, 1)}, mesh)
    w = replicate({"w": np.ones((1,), np.float32)}, mesh)

    @jax.jit
    def loss_and_grad(w, batch):
        def loss(w):
            return ((batch["x"] * w["w"]) ** 2).mean()

        return jax.value_and_grad(loss)(w)

    val, g = loss_and_grad(w, batch)
    want = float((np.arange(16) ** 2).mean())
    np.testing.assert_allclose(float(val), want, rtol=1e-6)
    # gradient implicitly all-reduced over the sharded batch
    want_g = float((2 * np.arange(16) ** 2).mean())
    np.testing.assert_allclose(float(g["w"][0]), want_g, rtol=1e-6)


def test_make_mesh_two_axis():
    # multi-axis default: trailing axis gets the largest power-of-two ≤ √n
    # (adjacent devices on 'spatial' → halo/stat collectives ride neighbor
    # ICI); axis_sizes overrides, numpy-reshape style incl. -1 inference
    assert make_mesh(8, axis_names=("data", "spatial")).devices.shape == (4, 2)
    assert make_mesh(
        8, axis_names=("data", "spatial"), axis_sizes=(2, 4)
    ).devices.shape == (2, 4)
    assert make_mesh(
        8, axis_names=("data", "spatial"), axis_sizes=(-1, 2)
    ).devices.shape == (4, 2)


def test_cross_replica_batch_stats():
    from jax.experimental.shard_map import shard_map

    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 64)).astype(np.float32)

    def f(x_local):
        mean = x_local.mean()
        var = x_local.var()
        g_mean, g_var = cross_replica_batch_stats(mean, var, "data")
        return jnp.stack([g_mean, g_var])[None]

    out = shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P("data"))(x)
    g_mean, g_var = np.asarray(out)[0]
    np.testing.assert_allclose(g_mean, x.mean(), atol=1e-5)
    np.testing.assert_allclose(g_var, x.var(), atol=1e-4)


def test_banded_eval_matches_full_for_rowlocal_model(rng):
    # oracle forward whose receptive field is zero -> banded == full
    import jax.numpy as jnp

    from dkt_stereo_tpu.eval.tiled import banded_forward

    H, W = 96, 64
    img1 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)

    def forward(a, b):
        return -(a.mean(-1) * 0.01 + b.mean(-1) * 0.02)

    full = np.asarray(forward(jnp.asarray(img1[None]), jnp.asarray(img2[None])))[0]
    banded = banded_forward(forward, img1, img2, n_bands=3, halo=8, divide_factor=32)
    np.testing.assert_allclose(banded, full, atol=1e-5)


def test_banded_eval_mesh_matches_full(rng):
    # mesh-sharded banded eval equals the full-image result for a
    # receptive-field-free oracle; runs 8 bands over the 8-device mesh
    from dkt_stereo_tpu.eval.tiled import banded_forward_mesh

    mesh = make_mesh(8)
    H, W = 160, 64
    img1 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)

    @jax.jit
    def forward(a, b):
        return -(a.mean(-1) * 0.01 + b.mean(-1) * 0.02)

    full = np.asarray(forward(jnp.asarray(img1[None]), jnp.asarray(img2[None])))[0]
    banded = banded_forward_mesh(forward, img1, img2, mesh, halo=8)
    np.testing.assert_allclose(banded, full, atol=1e-5)


def test_banded_eval_exact_real_model(rng):
    """banded_forward_exact vs the full-image pass, REAL RAFT model.

    With cross-band IN statistics (psum'd masked-interior sums) the banded
    pass differs from the full pass only by receptive-field truncation at
    interior window edges — a halo covering the encoder receptive field
    bounds it tightly even at random init (where band-local IN stats would
    diverge chaotically; the old approximate path asserted nothing here).
    """
    from dkt_stereo_tpu.eval.tiled import banded_forward_exact
    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig
    from dkt_stereo_tpu.ops.pad import pad_input, unpad_input

    mesh = make_mesh(2)
    # 1/4-scale GRU stack: halo=64 covers the full receptive field, so the
    # bound below is tight even at random init (the adversarial case for
    # banding — trained weights only shrink it). The 3-level config's 1/16
    # context branch has a receptive field of hundreds of input rows; its
    # measured random-init boundary error is ~4.6% of the disparity scale,
    # decaying to fp noise ~190 rows out (see eval/tiled.py docstring).
    cfg = RAFTStereoConfig(mixed_precision=False, context_norm="instance",
                           corr_dtype="float32", n_gru_layers=1,
                           slow_fast_gru=False)
    model = RAFTStereo(cfg, iters=2, test_mode=True)
    H, W = 640, 64
    img1 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))

    @jax.jit
    def forward(a, b):
        return model.apply(params, a, b)[1]

    a, spec = pad_input(jnp.asarray(img1[None]), 32, "sintel")
    b, _ = pad_input(jnp.asarray(img2[None]), 32, "sintel")
    full = np.asarray(unpad_input(forward(a, b)[..., None], spec))[0, ..., 0]

    banded = banded_forward_exact(model, params, img1, img2, mesh, halo=64)
    assert banded.shape == full.shape
    err = np.abs(banded - full)
    # measured 8.6e-4 max on a ~39 px disparity scale, halo-independent
    # (i.e. pure fp accumulation, zero truncation error)
    assert err.max() < 5e-3, f"max {err.max()} mean {err.mean()}"
    assert err.mean() < 5e-4, f"mean {err.mean()}"


def test_cross_band_stats_hooks_igev_instance_norm(rng):
    """BasicConvIGEV's instance norm must route through nn/norms.InstanceNorm
    so banded_forward_exact's cross-band statistics reach IGEV's stem/spx
    norms too (regression: an inline IN here silently violated the
    exact-banded contract — each band normalized over its own window
    including halo/pad rows)."""
    from functools import partial

    from jax.experimental.shard_map import shard_map

    from dkt_stereo_tpu.nn.igev_blocks import BasicConvIGEV
    from dkt_stereo_tpu.nn.norms import cross_band_stats

    mesh = make_mesh(2)
    fh, W, C = 384, 64, 8
    halo, band_h = 64, 192
    th = band_h + 2 * halo
    x = rng.standard_normal((1, fh, W, C)).astype(np.float32)
    mod = BasicConvIGEV(16, False, 2, "instance", True, 3, 1, 1)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    full = np.asarray(mod.apply(params, jnp.asarray(x)))

    win0 = [int(np.clip(k * band_h - halo, 0, fh - th)) for k in range(2)]
    bands = np.stack([x[0, w : w + th] for w in win0])

    @partial(shard_map, mesh=mesh, in_specs=(P("data"),), out_specs=P("data"),
             check_rep=False)
    def run(xb):
        return mod.apply(params, xb)

    with cross_band_stats("data", th, halo, band_h, fh):
        out = np.asarray(jax.jit(run)(jnp.asarray(bands)))

    # interiors (conv receptive field ⊂ halo) must match the full pass to fp
    for k in range(2):
        off = k * band_h - win0[k]
        got = out[k, off : off + band_h]
        want = full[0, k * band_h : (k + 1) * band_h]
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_cross_band_instance_norm_exact(rng):
    """The masked-interior psum'd IN statistics reproduce the full-image
    InstanceNorm to fp precision (the core of banded_forward_exact)."""
    from functools import partial

    from jax.experimental.shard_map import shard_map

    from dkt_stereo_tpu.nn.norms import InstanceNorm, cross_band_stats

    mesh = make_mesh(2)
    fh, W, C = 384, 64, 8
    halo, band_h = 64, 192
    th = band_h + 2 * halo
    x = rng.standard_normal((1, fh, W, C)).astype(np.float32)
    full = np.asarray(InstanceNorm().apply({}, jnp.asarray(x)))

    win0 = [int(np.clip(k * band_h - halo, 0, fh - th)) for k in range(2)]
    bands = np.stack([x[0, w : w + th] for w in win0])

    @partial(shard_map, mesh=mesh, in_specs=(P("data"),), out_specs=P("data"),
             check_rep=False)
    def run(xb):
        return InstanceNorm().apply({}, xb)

    with cross_band_stats("data", th, halo, band_h, fh):
        out = np.asarray(jax.jit(run)(jnp.asarray(bands)))

    for k in range(2):
        off = k * band_h - win0[k]
        got = out[k, off : off + band_h]
        want = full[0, k * band_h : (k + 1) * band_h]
        np.testing.assert_allclose(got, want, atol=5e-5)


def test_banded_eval_exact_real_model_igev(rng):
    """banded_forward_exact through the FULL IGEV graph (MobileNet trunk
    BN-eval + stems/spx instance norms under cross_band_stats + GWC volume +
    hourglass + GRU iterations on the 2-band mesh). At random init (the
    adversarial case) the error is receptive-field truncation at the band
    boundary only: measured max 2.8 px on a ~257 px scale at the boundary
    rows, decaying to fp noise at the frame edges."""
    from dkt_stereo_tpu.eval.tiled import banded_forward_exact
    from dkt_stereo_tpu.models import IGEVStereo, IGEVStereoConfig
    from dkt_stereo_tpu.ops.pad import pad_input, unpad_input

    mesh = make_mesh(2)
    cfg = IGEVStereoConfig(max_disp=32, mixed_precision=False)
    model = IGEVStereo(cfg, iters=2, test_mode=True)
    H, W = 640, 64
    img1 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))

    @jax.jit
    def forward(a, b):
        return model.apply(params, a, b)[1]

    a, spec = pad_input(jnp.asarray(img1[None]), 32, "sintel")
    b, _ = pad_input(jnp.asarray(img2[None]), 32, "sintel")
    full = np.asarray(unpad_input(forward(a, b)[..., None], spec))[0, ..., 0]
    banded = banded_forward_exact(model, params, img1, img2, mesh, halo=64)
    assert banded.shape == full.shape
    err = np.abs(banded - full)
    scale = np.abs(full).max()
    assert err.max() < 0.02 * scale + 1.0, f"max {err.max()} scale {scale}"
    # far from the band boundary (frame edges) the truncation has decayed to
    # a fraction of the boundary peak (measured 0.03-0.37 px vs 2.8 at the
    # boundary across seeds) — a band-local-stats regression would not decay
    mid = err[H // 2 - 4 : H // 2 + 4].max()
    assert err[:32].max() < max(0.8, 0.3 * mid), (err[:32].max(), mid)
    assert err[-32:].max() < max(0.8, 0.3 * mid), (err[-32:].max(), mid)


def test_banded_eval_exact_default_3gru_config(rng):
    """banded_forward_exact vs full-image, the SHIPPED base.json config
    (n_gru_layers=3, context batch norm — the 1/16-scale context branch that
    round 2 could not band exactly: ~4.6% peak boundary error).

    With band_refresh halo exchange (nn/norms.py) between encoder stages and
    per GRU iteration, the banded output must match the full forward to fp
    noise at halo=128, at RANDOM INIT (the adversarial case)."""
    from dkt_stereo_tpu.eval.tiled import banded_forward_exact
    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig
    from dkt_stereo_tpu.ops.pad import pad_input, unpad_input

    mesh = make_mesh(2)
    # configs/raft_stereo/base.json fields; fp32 so the bound measures
    # banding error, not the bf16 policy
    cfg = RAFTStereoConfig(mixed_precision=False, corr_dtype="float32",
                           context_norm="batch", n_gru_layers=3,
                           slow_fast_gru=False)
    model = RAFTStereo(cfg, iters=7, test_mode=True)
    H, W = 640, 64
    img1 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
    # random-init flow-head weights produce ~470 px disparities and a
    # CHAOTIC refinement loop: fp accumulation noise alone reaches O(1e-2)
    # absolute at that scale (measured halo-INdependent and not
    # boundary-localized — i.e. not banding truncation). Damp the flow head
    # so per-iteration updates are O(1) px — the magnitude regime of
    # trained weights — for the absolute bound; the raw-scale run below
    # pins the same result relatively.
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    damped = {
        k: (v * 0.02 if "flow_head" in k else v) for k, v in flat.items()
    }
    params_d = flax.traverse_util.unflatten_dict(damped)

    def run(p):
        @jax.jit
        def forward(a, b):
            return model.apply(p, a, b)[1]

        a, spec = pad_input(jnp.asarray(img1[None]), 32, "sintel")
        b, _ = pad_input(jnp.asarray(img2[None]), 32, "sintel")
        full = np.asarray(unpad_input(forward(a, b)[..., None], spec))[0, ..., 0]
        banded = banded_forward_exact(model, params=p, img1=img1, img2=img2,
                                      mesh=mesh, halo=128)
        assert banded.shape == full.shape
        return np.abs(banded - full), np.abs(full).max()

    err, scale = run(params_d)
    assert err.max() < 1e-3, f"max {err.max()} (disp scale {scale})"
    assert err.mean() < 1e-4, f"mean {err.mean()}"

    err, scale = run(params)  # raw random init: relative fp-noise bound
    assert err.max() / max(scale, 1.0) < 5e-5, (err.max(), scale)
