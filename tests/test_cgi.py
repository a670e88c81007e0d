"""CGI-Stereo: forward shapes, train/test consistency, loss, grads."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dkt_stereo_tpu.models import CGIStereo, CGIStereoConfig
from dkt_stereo_tpu.losses.cgi import loss_cgi

CFG = CGIStereoConfig(maxdisp=32, mixed_precision=False)
B, H, W = 1, 32, 64


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(9)
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    model = CGIStereo(CFG, test_mode=False)
    params = model.init(jax.random.PRNGKey(0), img1, img2)
    return img1, img2, model, params


def test_cgi_forward_shapes(setup):
    img1, img2, model, params = setup
    out = model.apply(params, img1, img2)
    assert out["disp_preds"][0].shape == (B, H // 4, W // 4)
    assert out["disp_preds"][1].shape == (B, H, W)
    assert (np.asarray(out["disp_preds"][1]) <= 0).all()

    test_model = CGIStereo(CFG, test_mode=True)
    _, disp = test_model.apply(params, img1, img2)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(out["disp_preds"][1]), atol=1e-5)


def test_cgi_loss_and_grads(setup):
    img1, img2, model, params = setup
    rng = np.random.default_rng(1)
    gt = jnp.asarray(-rng.uniform(1, 20, (B, H, W)).astype(np.float32))
    valid = jnp.ones((B, H, W))

    def f(p):
        out = model.apply(p, img1, img2)
        loss, metrics, m, ok = loss_cgi(out["disp_preds"], gt, valid, CFG.maxdisp)
        return loss, ok

    (loss, ok), grads = jax.value_and_grad(f, has_aux=True)(params)
    assert np.isfinite(float(loss)) and bool(ok)
    norms = [float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["params"])]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.3
