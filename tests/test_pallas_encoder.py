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


def _grad_compare(ref, fused, params, x, tol, seen_min=30):
    """max-abs difference between param/input grads of the two paths,
    relative to the grad scale (grads of deep IN chains can be O(100))."""

    def loss(m):
        def f(p, xx):
            out = m.apply(p, xx)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves)

        return f

    g0p, g0x = jax.grad(loss(ref), argnums=(0, 1))(params, x)
    g1p, g1x = jax.grad(loss(fused), argnums=(0, 1))(params, x)
    l0 = jax.tree_util.tree_leaves(g0p)
    l1 = jax.tree_util.tree_leaves(g1p)
    assert len(l0) == len(l1) and len(l0) >= seen_min
    worst = 0.0
    for a, b in zip(l0, l1):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        worst = max(worst, float(np.abs(a - b).max() / scale))
    gx = float(np.abs(np.asarray(g0x) - np.asarray(g1x)).max())
    gscale = max(float(np.abs(np.asarray(g0x)).max()), 1.0)
    assert worst < tol, worst
    assert gx / gscale < tol, (gx, gscale)


def test_encoder_stage_vjp_matches_autodiff(rng):
    """Unit-level pin of encoder_stage_ad's custom VJP: one fused stage
    (dual-input residual form, emit_h) against jax autodiff of a pure-jnp
    re-statement of the same math (affine + ReLU stack + mask + dense-w2d
    SAME conv + stats), for ALL seven inputs. This is the tight bound; the
    model-level comparisons below accumulate fp32 reordering noise through
    the deeper XLA stages."""
    from dkt_stereo_tpu.ops.pallas.encoder_conv import (
        _valid_mask,
        encoder_stage_ad,
        w2d_conv3x3_weights,
    )

    B, H, W, C = 2, 12, 16, 4
    C2, rb, shift_in = 2 * C, 2, 2
    Hp, Wcp = H + 4, W // 2 + 2

    def framed(arr):
        z = jnp.zeros((B, Hp, Wcp, C2), jnp.float32)
        return z.at[:, shift_in : shift_in + H, 1:-1, :].set(arr)

    u = framed(jnp.asarray(rng.standard_normal((B, H, W // 2, C2)).astype(np.float32)))
    v = framed(jnp.asarray(rng.standard_normal((B, H, W // 2, C2)).astype(np.float32)))
    a1, b1, a2, b2 = (
        jnp.asarray(rng.standard_normal((B, C2)).astype(np.float32)) for _ in range(4)
    )
    wl = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32)) * 0.2

    def ref_fn(u, a1, b1, wl, v, a2, b2):
        wd = w2d_conv3x3_weights(wl)
        m_in = _valid_mask(Hp, Wcp, H, shift_in)
        t1 = u * a1[:, None, None, :] + b1[:, None, None, :]
        t2 = v * a2[:, None, None, :] + b2[:, None, None, :]
        h = jnp.maximum(jnp.maximum(t1, 0.0) + jnp.maximum(t2, 0.0), 0.0) * m_in
        y = jax.lax.conv_general_dilated(
            h, wd, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        # the kernel's output lands one row later (shift_in + 1 frame)
        y = jnp.pad(y, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :Hp]
        y = y * _valid_mask(Hp, Wcp, H, shift_in + 1)
        return y, jnp.sum(y, axis=(1, 2)), jnp.sum(y * y, axis=(1, 2)), h

    def pal_fn(u, a1, b1, wl, v, a2, b2):
        wd = w2d_conv3x3_weights(wl)
        return encoder_stage_ad(
            u, a1, b1, wd, H=H, shift_in=shift_in, v=v, a2=a2, b2=b2,
            emit_h=True, interpret=True, rb=rb,
        )

    outs_r = ref_fn(u, a1, b1, wl, v, a2, b2)
    ws = [jnp.asarray(rng.standard_normal(np.shape(o)).astype(np.float32)) for o in outs_r]

    def loss(fn):
        return lambda *a: sum(jnp.sum(w * o) for w, o in zip(ws, fn(*a)))

    args = (u, a1, b1, wl, v, a2, b2)
    for o_r, o_p in zip(outs_r, pal_fn(*args)):
        assert float(jnp.abs(o_r - o_p).max()) < 1e-3
    gr = jax.grad(loss(ref_fn), argnums=tuple(range(7)))(*args)
    gp = jax.grad(loss(pal_fn), argnums=tuple(range(7)))(*args)
    for name, a, b in zip(["u", "a1", "b1", "wl", "v", "a2", "b2"], gr, gp):
        d = float(jnp.abs(a - b).max())
        s = max(float(jnp.abs(a).max()), 1.0)
        assert d / s < 1e-5, (name, d, s)


def test_basic_encoder_fused_grads_match_xla(rng):
    """Round 4: the fused chain is trainable (encoder_stage_ad custom VJP).
    Param AND input grads of the fused path must match the XLA encoder's
    (fp32, CPU interpret) — the whole backward composition: adjoint conv,
    ReLU/residual gates, instance-norm statistics chains, w2d weight-scatter
    adjoint. Tolerance is accumulation-order noise through layer2/3 + the
    squared-sum loss (the single-stage VJP itself is pinned at 1e-5 rel by
    test_encoder_stage_vjp_matches_autodiff; measured here ~1.2e-3)."""
    B, H, W = 2, 24, 32
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))
    ref = BasicEncoder(256, "instance", 2, dtype=jnp.float32)
    fused = BasicEncoder(256, "instance", 2, dtype=jnp.float32, fused_fullres=True)
    params = ref.init(jax.random.PRNGKey(0), x)
    _grad_compare(ref, fused, params, x, tol=4e-3)


def test_multi_encoder_fused_grads_match_xla(rng):
    # ≥ 32×48: instance-norm statistics over fewer pixels are ill-conditioned
    # enough that even the two forwards drift ~2e-3 (measured at 16×24)
    B, H, W = 1, 32, 48
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))
    dims = ((128, 128, 128),)
    ref = MultiBasicEncoder(dims, "instance", 2, 3, dtype=jnp.float32)
    fused = MultiBasicEncoder(dims, "instance", 2, 3, dtype=jnp.float32, fused_fullres=True)
    params = ref.init(jax.random.PRNGKey(0), x)
    _grad_compare(ref, fused, params, x, tol=4e-3)


def test_raft_model_fused_encoder_train_grads(rng):
    """Whole-model training path: grads of the sequence loss through the
    fused encoder (pallas_encoder=True now applies in train mode too) match
    the XLA-encoder grads. Coarse bound: model-level grads compound fp32
    reordering noise through 3 iterations + correlation + IN chains."""
    from dkt_stereo_tpu.losses.sequence import sequence_loss_raft
    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig

    B, H, W = 1, 32, 64
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    flow = jnp.asarray(-rng.uniform(0, 8, (B, H, W)).astype(np.float32))
    valid = jnp.ones((B, H, W), jnp.float32)

    def make(pe):
        cfg = RAFTStereoConfig(
            mixed_precision=False, corr_dtype="float32", pallas_encoder=pe
        )
        return RAFTStereo(cfg, iters=3, test_mode=False)

    m0, m1 = make(False), make(True)
    params = m0.init(jax.random.PRNGKey(0), img1, img2)

    def loss_fn(m):
        def f(p):
            out = m.apply(p, img1, img2, rngs={"mix": jax.random.PRNGKey(1)})
            loss, _, _, _ = sequence_loss_raft(out["disp_preds"], flow, valid)
            return loss
        return f

    l0, g0 = jax.value_and_grad(loss_fn(m0))(params)
    l1, g1 = jax.value_and_grad(loss_fn(m1))(params)
    assert abs(float(l0) - float(l1)) < 1e-2 * max(abs(float(l0)), 1.0)
    worst = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-2)
        worst = max(worst, float(np.abs(a - b).max() / scale))
    assert worst < 5e-2, worst
