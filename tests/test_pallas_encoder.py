"""Fused Pallas w2d encoder chain vs the XLA encoders (interpret mode).

The fused path (ops/pallas/encoder_conv.py + nn/blocks.py::
fused_fullres_layer1) must be numerically equivalent to the standard
norm1+layer1 section and keep an identical parameter tree, so checkpoints
load regardless of the ``fused_fullres`` flag.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dkt_stereo_tpu.nn.blocks import (
    BasicEncoder,
    MultiBasicEncoder,
    _RawBN,
    _ConvParams,
    _ResPairParams,
    fused_fullres_layer1,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_basic_encoder_fused_matches_xla(rng):
    B, H, W = 2, 40, 64
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))
    ref = BasicEncoder(256, "instance", 2, dtype=jnp.float32)
    fused = BasicEncoder(256, "instance", 2, dtype=jnp.float32, fused_fullres=True)
    params = ref.init(jax.random.PRNGKey(0), x)
    p2 = fused.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)

    d = np.abs(np.asarray(ref.apply(params, x)) - np.asarray(fused.apply(params, x)))
    assert d.max() < 1e-4, d.max()


def test_multi_encoder_fused_matches_xla_instance(rng):
    B, H, W = 1, 32, 48
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))
    dims = ((128, 128, 128), (128, 128, 128))
    ref = MultiBasicEncoder(dims, "instance", 2, 3, dtype=jnp.float32)
    fused = MultiBasicEncoder(dims, "instance", 2, 3, dtype=jnp.float32, fused_fullres=True)
    params = ref.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        fused.init(jax.random.PRNGKey(1), x)
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(ref.apply(params, x)),
        jax.tree_util.tree_leaves(fused.apply(params, x)),
    ):
        assert float(np.abs(np.asarray(a) - np.asarray(b)).max()) < 1e-4


def test_fused_layer1_batchnorm_fold(rng):
    """Direct check of the eval-BatchNorm mode of the fused chain (static
    affines folding running stats + conv biases) against the XLA section."""
    B, H, W = 1, 24, 32
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))

    import flax.linen as nn

    from dkt_stereo_tpu.nn.blocks import Norm, _res_pair, conv

    class _Section(nn.Module):
        fused: bool = False

        @nn.compact
        def __call__(self, x):
            if self.fused:
                k, b = _ConvParams(64, 3, 7, name="conv1")()
                bn = _RawBN(64, name="norm1")()
                triples = _ResPairParams(64, "batch", name="layer1")()
                return fused_fullres_layer1(
                    x, k, triples, "batch", jnp.float32, stem_bn=bn, stem_bias=b
                )
            y = conv(64, 7, 1, 3, jnp.float32, name="conv1")(x)
            y = Norm("batch", 8, True, jnp.float32, name="norm1")(y)
            y = nn.relu(y)
            return _res_pair(64, 64, "batch", 1, True, jnp.float32, "layer1")(y)

    ref, fused = _Section(False), _Section(True)
    params = ref.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        fused.init(jax.random.PRNGKey(1), x)
    )
    # randomize the running stats / affines so the fold actually matters
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jnp.asarray(rng.standard_normal(a.shape), a.dtype)
        if a.ndim == 1
        else a,
        params,
    )
    a = np.asarray(ref.apply(params, x))
    b = np.asarray(fused.apply(params, x))
    assert np.abs(a - b).max() < 1e-4, np.abs(a - b).max()


def test_raft_model_fused_encoder_matches(rng):
    """Whole-model: pallas_encoder=True must match the default test-mode
    forward (fp32, CPU interpret)."""
    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig

    B, H, W = 1, 32, 64
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))

    cfg0 = RAFTStereoConfig(mixed_precision=False, corr_dtype="float32")
    cfg1 = RAFTStereoConfig(
        mixed_precision=False, corr_dtype="float32", pallas_encoder=True
    )
    m0 = RAFTStereo(cfg0, iters=3, test_mode=True)
    m1 = RAFTStereo(cfg1, iters=3, test_mode=True)
    params = m0.init(jax.random.PRNGKey(0), img1, img2)

    _, d0 = m0.apply(params, img1, img2)
    _, d1 = m1.apply(params, img1, img2)
    d = np.abs(np.asarray(d0) - np.asarray(d1))
    assert d.max() < 5e-3, d.max()
