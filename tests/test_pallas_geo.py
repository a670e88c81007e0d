"""Pallas geo-lookup kernel (interpret) vs the XLA CombinedGeoEncodingVolume."""

import numpy as np
import jax
import jax.numpy as jnp

from dkt_stereo_tpu.ops.geometry import CombinedGeoEncodingVolume
from dkt_stereo_tpu.ops.pallas.geo_lookup import geo_lookup_pallas


def _setup(rng, B=1, H=8, W=32, D=16, C=8):
    f1 = jnp.asarray(rng.standard_normal((B, H, W, 24)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((B, H, W, 24)).astype(np.float32))
    geo = jnp.asarray(rng.standard_normal((B, D, H, W, C)).astype(np.float32))
    fn = CombinedGeoEncodingVolume(f1, f2, geo, num_levels=2, radius=4)
    disp = jnp.asarray(rng.uniform(0, D, (B, H, W, 1)).astype(np.float32))
    coords = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.float32)[None, None, :, None], (B, H, W, 1)
    )
    return fn, disp, coords


def test_geo_pallas_matches_xla(rng):
    fn, disp, coords = _setup(rng)
    want = np.asarray(fn(disp, coords))
    # kernel expects geo rows (B,H,W,D,C); fn stores (B,H,W,D,C) already
    got = np.asarray(
        geo_lookup_pallas(
            tuple(fn.geo_pyramid), tuple(fn.init_corr_pyramid), disp, coords, 4, True
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_geo_pallas_vjp_matches_xla(rng):
    fn, disp, coords = _setup(rng, H=4, W=16, D=8)
    geo_pyr = tuple(fn.geo_pyramid)
    corr_pyr = tuple(fn.init_corr_pyramid)

    def f_pl(geo_pyr, corr_pyr):
        return (geo_lookup_pallas(geo_pyr, corr_pyr, disp, coords, 4, True) ** 2).sum()

    def f_xla(geo_pyr, corr_pyr):
        fn2 = CombinedGeoEncodingVolume.__new__(CombinedGeoEncodingVolume)
        fn2.num_levels, fn2.radius = 2, 4
        fn2.geo_pyramid = list(geo_pyr)
        fn2.init_corr_pyramid = list(corr_pyr)
        return (fn2(disp, coords) ** 2).sum()

    g_pl = jax.grad(f_pl, argnums=(0, 1))(geo_pyr, corr_pyr)
    g_xla = jax.grad(f_xla, argnums=(0, 1))(geo_pyr, corr_pyr)
    for a, b in zip(jax.tree_util.tree_leaves(g_pl), jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_geo_pallas_chunked_matches_xla(rng, monkeypatch):
    """W1-chunked path (VMEM budget exceeded → 128-multiple column blocks,
    padded disp/coords): forced at test size by shrinking the byte budget.
    On-chip the chunking is what keeps IGEV eval geometry under Mosaic's
    16MB scoped-VMEM limit (scripts/validate_kernels.py)."""
    import dkt_stereo_tpu.ops.pallas.geo_lookup as m

    fn, disp, coords = _setup(rng, H=8, W=160, D=16)
    monkeypatch.setattr(m, "_VMEM_BYTES", 200_000)  # forces W1c=128 < W1=160
    want = np.asarray(fn(disp, coords))
    got = np.asarray(
        geo_lookup_pallas(
            tuple(fn.geo_pyramid), tuple(fn.init_corr_pyramid), disp, coords, 4, True
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)

    def f_pl(geo_pyr, corr_pyr):
        return (geo_lookup_pallas(geo_pyr, corr_pyr, disp, coords, 4, True) ** 2).sum()

    def f_xla(geo_pyr, corr_pyr):
        fn2 = CombinedGeoEncodingVolume.__new__(CombinedGeoEncodingVolume)
        fn2.num_levels, fn2.radius = 2, 4
        fn2.geo_pyramid = list(geo_pyr)
        fn2.init_corr_pyramid = list(corr_pyr)
        return (fn2(disp, coords) ** 2).sum()

    geo_pyr = tuple(fn.geo_pyramid)
    corr_pyr = tuple(fn.init_corr_pyramid)
    g_pl = jax.grad(f_pl, argnums=(0, 1))(geo_pyr, corr_pyr)
    g_xla = jax.grad(f_xla, argnums=(0, 1))(geo_pyr, corr_pyr)
    for a, b in zip(jax.tree_util.tree_leaves(g_pl), jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_igev_model_pallas_matches_reg(rng):
    from dkt_stereo_tpu.models import IGEVStereo, IGEVStereoConfig

    B, H, W = 1, 32, 64
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    cfg_reg = IGEVStereoConfig(max_disp=32, mixed_precision=False)
    cfg_pl = IGEVStereoConfig(max_disp=32, mixed_precision=False, corr_implementation="reg_cuda")
    m_reg = IGEVStereo(cfg_reg, iters=2, test_mode=True)
    m_pl = IGEVStereo(cfg_pl, iters=2, test_mode=True)
    params = m_reg.init(jax.random.PRNGKey(0), img1, img2)
    _, d_reg = m_reg.apply(params, img1, img2)
    _, d_pl = m_pl.apply(params, img1, img2)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_reg), atol=1e-3)
