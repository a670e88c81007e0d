"""Positions-based pallas row sampler vs XLA path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from dkt_stereo_tpu.ops.pallas.row_sample import row_sample_pallas
from dkt_stereo_tpu.ops.sampler import sample_row_1d


def test_row_sample_matches_xla(rng):
    B, H, W1, W2, K = 1, 8, 16, 64, 12
    vol = jnp.asarray(rng.standard_normal((B, H, W1, W2)).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-3, W2 + 2, (B, H, W1, K)).astype(np.float32))
    want = np.asarray(sample_row_1d(vol, pos))
    got = np.asarray(row_sample_pallas(vol, pos, True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_row_sample_vjp_matches_xla(rng):
    # positions INCLUDING out-of-bounds / clamp territory (-3 .. W2+2): the
    # backward must zero OOB gradients exactly like the XLA path, not
    # scatter them into clamped edge taps (the forward test already covers
    # this range; restricting the VJP to the interior dodged it)
    B, H, W1, W2, K = 1, 4, 8, 32, 6
    vol = jnp.asarray(rng.standard_normal((B, H, W1, W2)).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-3, W2 + 2, (B, H, W1, K)).astype(np.float32))

    def f_pl(vol, pos):
        return (row_sample_pallas(vol, pos, True) ** 2).sum()

    def f_xla(vol, pos):
        return (sample_row_1d(vol, pos) ** 2).sum()

    gv_pl, gp_pl = jax.grad(f_pl, argnums=(0, 1))(vol, pos)
    gv_x, gp_x = jax.grad(f_xla, argnums=(0, 1))(vol, pos)
    np.testing.assert_allclose(np.asarray(gv_pl), np.asarray(gv_x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gp_pl), np.asarray(gp_x), atol=1e-3)


def test_row_sample_vjp_integer_positions(rng):
    """Position gradient AT the interpolation kinks (exact-integer pos,
    including the 0 and W2-1 boundaries): the kernel must follow the
    two-tap convention v[x0+1]-v[x0] like the XLA path / grid_sample, not
    the symmetric-hat subgradient 0. Regression for a compiled-on-chip
    divergence at the ~1e-5 fraction of fp32 positions that round to exact
    integers (scripts/validate_kernels.py)."""
    B, H, W1, W2, K = 1, 2, 8, 32, 8
    vol = jnp.asarray(rng.standard_normal((B, H, W1, W2)).astype(np.float32))
    ints = rng.integers(0, W2, (B, H, W1, K - 2)).astype(np.float32)
    edges = np.broadcast_to(
        np.asarray([0.0, W2 - 1.0], np.float32), (B, H, W1, 2)
    )
    pos = jnp.asarray(np.concatenate([ints, edges], axis=-1))

    gp_pl = jax.grad(lambda p: (row_sample_pallas(vol, p, True) ** 2).sum())(pos)
    gp_x = jax.grad(lambda p: (sample_row_1d(vol, p) ** 2).sum())(pos)
    np.testing.assert_allclose(np.asarray(gp_pl), np.asarray(gp_x), atol=1e-4)


def test_pcvnet_pallas_lookup_matches_reg(rng):
    from dkt_stereo_tpu.models import PCVNet, PCVNetConfig

    B, H, W = 1, 32, 256
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    cfg_reg = PCVNetConfig(mixed_precision=False)
    cfg_pl = PCVNetConfig(mixed_precision=False, corr_implementation="reg_cuda")
    m_reg = PCVNet(cfg_reg, iters=2, test_mode=True)
    m_pl = PCVNet(cfg_pl, iters=2, test_mode=True)
    params = m_reg.init(jax.random.PRNGKey(0), img1, img2)
    _, d_reg = m_reg.apply(params, img1, img2)
    _, d_pl = m_pl.apply(params, img1, img2)
    # The sampler itself matches at 1e-4 (tests above); end-to-end the two
    # interpolation implementations differ by fp-epsilon per lookup, which
    # two iterations of PCV's closed-form mu/sigma/w updates amplify to
    # ~1e-2 on O(50) disparities at a handful of pixels (measured 7.4e-3
    # worst-case across seeds/refactors; 2e-2 gives 2.7x headroom without
    # masking a real lookup bug, which shows up at O(1)).
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_reg), atol=2e-2)
