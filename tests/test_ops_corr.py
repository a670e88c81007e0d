"""Golden tests: correlation volume/pyramid/lookup and cost volumes vs the
reference formulas recomputed in torch/numpy."""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dkt_stereo_tpu.ops import (
    build_concat_volume,
    build_gwc_volume,
    build_norm_correlation_volume,
    corr_lookup,
    corr_pyramid,
    corr_volume,
    disparity_regression,
    regression_topk,
)


def torch_corr_block_1d(fmap1_nchw, fmap2_nchw, coords_x, num_levels=4, radius=4):
    """Re-derivation of core/corr.py:110-156 in torch (CPU) as the golden."""
    B, D, H, W1 = fmap1_nchw.shape
    W2 = fmap2_nchw.shape[-1]
    corr = torch.einsum("aijk,aijh->ajkh", fmap1_nchw, fmap2_nchw)
    corr = corr.reshape(B, H, W1, 1, W2) / (D**0.5)
    corr = corr.reshape(B * H * W1, 1, 1, W2)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = F.avg_pool2d(corr, [1, 2], stride=[1, 2])
        pyramid.append(corr)

    r = radius
    out = []
    for i, c in enumerate(pyramid):
        S = c.shape[-1]
        dx = torch.linspace(-r, r, 2 * r + 1).view(2 * r + 1, 1)
        x0 = dx + coords_x.reshape(B * H * W1, 1, 1, 1) / 2**i
        y0 = torch.zeros_like(x0)
        xg = 2 * x0 / (S - 1) - 1
        grid = torch.cat([xg, y0], dim=-1)
        sampled = F.grid_sample(c, grid, align_corners=True)
        out.append(sampled.view(B, H, W1, -1))
    return torch.cat(out, dim=-1)  # (B,H,W,L*(2r+1))


def test_corr_lookup_matches_reference(rng):
    B, H, W, D = 2, 4, 32, 16
    f1 = rng.standard_normal((B, H, W, D)).astype(np.float32)
    f2 = rng.standard_normal((B, H, W, D)).astype(np.float32)
    coords = rng.uniform(-2, W + 2, (B, H, W, 1)).astype(np.float32)

    vol = corr_volume(jnp.asarray(f1), jnp.asarray(f2))
    pyr = corr_pyramid(vol, num_levels=4)
    ours = np.asarray(corr_lookup(pyr, jnp.asarray(coords), radius=4))

    t1 = torch.from_numpy(f1).permute(0, 3, 1, 2)
    t2 = torch.from_numpy(f2).permute(0, 3, 1, 2)
    theirs = torch_corr_block_1d(t1, t2, torch.from_numpy(coords[..., 0])).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_corr_volume_cosine_range(rng):
    f1 = rng.standard_normal((1, 3, 8, 16)).astype(np.float32)
    f2 = rng.standard_normal((1, 3, 8, 16)).astype(np.float32)
    v = np.asarray(corr_volume(jnp.asarray(f1), jnp.asarray(f2), normalize=True))
    assert v.min() >= -1.0001 and v.max() <= 1.0001
    # diagonal of self-correlation is exactly 1
    vs = np.asarray(corr_volume(jnp.asarray(f1), jnp.asarray(f1), normalize=True))
    diag = np.einsum("bhii->bhi", vs)
    np.testing.assert_allclose(diag, 1.0, atol=1e-5)


def torch_build_gwc(ref, tgt, maxdisp, groups):
    B, C, H, W = ref.shape
    vol = ref.new_zeros([B, groups, maxdisp, H, W])
    for i in range(maxdisp):
        if i > 0:
            a = ref[:, :, :, i:]
            b = tgt[:, :, :, :-i]
            vol[:, :, i, :, i:] = (a * b).view(B, groups, C // groups, H, W - i).mean(2)
        else:
            vol[:, :, i] = (ref * tgt).view(B, groups, C // groups, H, W).mean(2)
    return vol


def test_gwc_volume_matches_reference(rng):
    B, H, W, C, D, G = 1, 5, 12, 16, 6, 4
    f1 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    f2 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    ours = np.asarray(build_gwc_volume(jnp.asarray(f1), jnp.asarray(f2), D, G))
    t1 = torch.from_numpy(f1).permute(0, 3, 1, 2)
    t2 = torch.from_numpy(f2).permute(0, 3, 1, 2)
    theirs = torch_build_gwc(t1, t2, D, G).numpy()  # (B,G,D,H,W)
    # ours: (B,D,H,W,G)
    np.testing.assert_allclose(ours.transpose(0, 4, 1, 2, 3), theirs, atol=1e-5)


def test_concat_volume_variants(rng):
    B, H, W, C, D = 1, 3, 8, 4, 3
    f1 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    f2 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    vol = np.asarray(build_concat_volume(jnp.asarray(f1), jnp.asarray(f2), D, mask_ref=True))
    # d=2: ref zeroed for w<2, target shifted
    np.testing.assert_allclose(vol[0, 2, :, :2, :], 0.0)
    np.testing.assert_allclose(vol[0, 2, :, 2:, :C], f1[0, :, 2:, :], atol=1e-6)
    np.testing.assert_allclose(vol[0, 2, :, 2:, C:], f2[0, :, :-2, :], atol=1e-6)
    vol2 = np.asarray(build_concat_volume(jnp.asarray(f1), jnp.asarray(f2), D, mask_ref=False))
    np.testing.assert_allclose(vol2[0, 2, :, :, :C], f1[0], atol=1e-6)


def test_norm_correlation_volume(rng):
    B, H, W, C, D = 1, 3, 8, 6, 4
    f1 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    f2 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    ours = np.asarray(build_norm_correlation_volume(jnp.asarray(f1), jnp.asarray(f2), D))
    n1 = f1 / (np.linalg.norm(f1, axis=-1, keepdims=True) + 1e-5)
    n2 = f2 / (np.linalg.norm(f2, axis=-1, keepdims=True) + 1e-5)
    for d in range(D):
        for w in range(W):
            if w >= d:
                want = (n1[0, :, w] * n2[0, :, w - d]).mean(-1)
            else:
                want = np.zeros(H)
            np.testing.assert_allclose(ours[0, d, :, w, 0], want, atol=1e-5)


def test_disparity_regression_and_topk(rng):
    B, H, W, D = 2, 3, 4, 8
    logits = rng.standard_normal((B, H, W, D)).astype(np.float32)
    prob = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    reg = np.asarray(disparity_regression(jnp.asarray(prob), D))
    want = (prob * np.arange(D)).sum(-1, keepdims=True)
    np.testing.assert_allclose(reg, want, atol=1e-5)

    samples = np.broadcast_to(np.arange(D, dtype=np.float32), (B, H, W, D)).copy()
    ours = np.asarray(regression_topk(jnp.asarray(logits), jnp.asarray(samples), k=2))
    c = torch.from_numpy(logits).permute(0, 3, 1, 2)
    s = torch.from_numpy(samples).permute(0, 3, 1, 2)
    _, ind = c.sort(1, True)
    pool_ind = ind[:, :2]
    cg = torch.gather(c, 1, pool_ind)
    pr = F.softmax(cg, 1)
    sg = torch.gather(s, 1, pool_ind)
    theirs = torch.sum(sg * pr, dim=1, keepdim=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_corr_pyramid_fused_matches_volume_pool(rng):
    """f1 @ pooled(f2) level construction == pool(volume) (pooling is linear
    in fmap2), for both the RAFT factor-2 pyramid and PCVNet's
    compress_factor pooling, scaled and unscaled, cosine and plain."""
    from dkt_stereo_tpu.ops.corr import corr_pyramid_fused

    B, H, W, D = 2, 5, 37, 16
    f1 = jnp.asarray(rng.standard_normal((B, H, W, D)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((B, H, W, D)).astype(np.float32))

    for normalize in (False, True):
        ref = corr_pyramid(corr_volume(f1, f2, normalize=normalize), 4)
        got = corr_pyramid_fused(f1, f2, 4, normalize=normalize)
        for a, b in zip(ref, got):
            assert a.shape == b.shape
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # unscaled (IGEV init corr): fused(scaled=False) == volume * sqrt(D)
    ref0 = corr_pyramid(corr_volume(f1, f2) * jnp.sqrt(jnp.float32(D)), 2)
    got0 = corr_pyramid_fused(f1, f2, 2, scaled=False)
    for a, b in zip(ref0, got0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    # PCVNet compress_factor=4 pooling (keep = floor(w2/4)*4 per level)
    from dkt_stereo_tpu.nn.pcv import gaussian_corr_pyramid

    ref4 = gaussian_corr_pyramid(corr_volume(f1, f2), 3, 4)
    got4 = corr_pyramid_fused(f1, f2, 3, pool_factor=4)
    for a, b in zip(ref4, got4):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_thin_conv3x3_matches_dense_conv(rng):
    """thin_conv3x3 (full-lane matmul + shifted adds) == a same-pad 3x3 conv
    for the tiny output widths used by the flow/disp heads (1, 2, 4 ch)."""
    from dkt_stereo_tpu.nn.gru import thin_conv3x3

    for cout in (1, 2, 4):
        x = jnp.asarray(rng.standard_normal((2, 9, 13, 32)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((3, 3, 32, cout)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
        want = (
            jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + b
        )
        got = thin_conv3x3(x, k, b, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
