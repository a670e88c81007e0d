"""PCVNet building blocks (rebuild of meta_arch/pcvnet/{extractor,update,
refinement}.py).

- ``PCVMultiBasicEncoder``: the RAFT context encoder plus a ``low_level_conv``
  low-frequency head (extractor.py:268-271, :311) and dual-input stereo batch.
- ``gaussian_corr_lookup``: per-pixel mixture-of-Gaussians sampling of the
  correlation pyramid (corr.py:18-51) — positions ``dx·σ + μcoord``, pyramid
  pooled by ``compress_factor`` (4 when n_downsample==2).
- ``BasicMotionEncoderPCV`` (update.py:37-61): per-Gaussian correlation convs
  (gaussians folded into batch), parameter branch on (μ, w, σ).
- ``ParametersUpdater`` (update.py:77-112): closed-form natural-gradient-style
  updates of μ/σ/w with clipping and weight renormalization.
- ``BasicMultiUpdateBlockPCV`` (update.py:115-170): 3-level GRU FDM whose
  coarse levels consume strided motion features.
- ``RefineNet`` (refinement.py:5-37): uncertainty-aware dilated refinement.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dkt_stereo_tpu.nn.blocks import _res_pair, conv
from dkt_stereo_tpu.nn.gru import ConvGRU, FlowHead, _ConvParams, cond_mask_head
from dkt_stereo_tpu.nn.norms import Norm
from dkt_stereo_tpu.ops.sampler import sample_row_1d
from dkt_stereo_tpu.ops.resize import interp_bilinear_align, pool2x


class PCVMultiBasicEncoder(nn.Module):
    """extractor.py:196-332 (n_gru_layers==3 path): trunk + heads at 1/4,
    1/8, 1/16 + dual-inp features + low-frequency head."""

    output_dim: Sequence[Sequence[int]] = ((128, 128, 128, 128), (128, 128, 128, 128))
    norm_fn: str = "batch"
    downsample: int = 2
    n_gru_layers: int = 3
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, dual_inp: bool = True):
        d, ura, dt = self.downsample, self.use_running_average, self.dtype
        # PCV variant (extractor.py:214-223): conv1 ALWAYS stride 2; layer2
        # stride 1 when down_sample==2 (finest head at 1/4) else 2 (1/8).
        x = conv(64, 7, 2, 3, dt, name="conv1")(x)
        x = Norm(self.norm_fn, 8, ura, dt, name="norm1")(x)
        x = nn.relu(x)
        x = _res_pair(64, 64, self.norm_fn, 1, ura, dt, "layer1")(x)
        x = _res_pair(64, 96, self.norm_fn, 1 if d == 2 else 2, ura, dt, "layer2")(x)
        x = _res_pair(96, 128, self.norm_fn, 2, ura, dt, "layer3")(x)

        v = None
        if dual_inp:
            v = x
            x = x[: x.shape[0] // 2]

        low_f = nn.relu(conv(32, 3, 1, 1, dt, name="low_level_conv_0")(x))
        low_f = nn.relu(conv(32, 3, 1, 1, dt, name="low_level_conv_2")(low_f))

        from dkt_stereo_tpu.nn.blocks import _ConvOut

        # head channel indexing follows the reference: outputs08 uses dim[0],
        # outputs16 dim[1], outputs32 dim[3] (extractor.py:226-261, quirky
        # but all-128 in practice)
        outputs08 = [
            _ConvOut(dim[0], self.norm_fn, ura, dt, name=f"outputs08_{i}")(x)
            for i, dim in enumerate(self.output_dim)
        ]
        y = _res_pair(128, 128, self.norm_fn, 2, ura, dt, "layer4")(x)
        outputs16 = [
            _ConvOut(dim[1], self.norm_fn, ura, dt, name=f"outputs16_{i}")(y)
            for i, dim in enumerate(self.output_dim)
        ]
        z = _res_pair(128, 128, self.norm_fn, 2, ura, dt, "layer5")(y)
        outputs32 = [
            conv(dim[3], 3, 1, 1, dt, name=f"outputs32_{i}")(z)
            for i, dim in enumerate(self.output_dim)
        ]
        if dual_inp:
            return outputs08, outputs16, outputs32, v, low_f
        return outputs08, outputs16, outputs32


def gaussian_corr_pyramid(volume: jnp.ndarray, num_levels: int, compress_factor: int):
    """corr.py:24-31: pool by compress_factor along w2, ``num_levels`` entries."""
    pyr = [volume]
    v = volume
    for _ in range(num_levels - 1):
        w2 = v.shape[-1]
        keep = (w2 // compress_factor) * compress_factor
        v = v[..., :keep].reshape(*v.shape[:-1], w2 // compress_factor, compress_factor).mean(-1)
        pyr.append(v)
    return pyr


def gaussian_corr_lookup_pallas(pyramid, mu_coords, sigma, sample_num: int,
                                compress_factor: int, interpret: bool = False):
    """Fused Pallas version of :func:`gaussian_corr_lookup` (the TPU analogue
    of the reference's corr_sampler shim at pcvnet/corr.py:6-9). Position
    gradients flow into sigma through the sampler's VJP."""
    from dkt_stereo_tpu.ops.pallas.row_sample import row_sample_pallas

    half = sample_num // 2
    dx = jnp.arange(-half, half + 1, dtype=jnp.float32)
    x = mu_coords[..., None] + sigma[..., None] * dx  # (B,H,W,G,S)
    B, H, W, G, S = x.shape
    out = []
    for i, vol in enumerate(pyramid):
        xi = (x / (compress_factor**i)).reshape(B, H, W, G * S)
        out.append(row_sample_pallas(vol, xi, interpret))
    return jnp.concatenate(out, axis=-1)


def gaussian_corr_lookup(pyramid, mu_coords, sigma, sample_num: int, compress_factor: int):
    """corr.py:33-51. ``mu_coords``/``sigma``: (B,H,W,G). Output
    (B,H,W, L·G·S) — level-major, gaussian, then sample, matching the
    reference's reshape consumed by the motion encoder (update.py:50-53)."""
    half = sample_num // 2
    dx = jnp.arange(-half, half + 1, dtype=jnp.float32)  # (S,)
    x = mu_coords[..., None] + sigma[..., None] * dx  # (B,H,W,G,S)
    B, H, W, G, S = x.shape
    out = []
    for i, vol in enumerate(pyramid):
        xi = (x / (compress_factor**i)).reshape(B, H, W, G * S)
        out.append(sample_row_1d(vol, xi))
    return jnp.concatenate(out, axis=-1)


class BasicMotionEncoderPCV(nn.Module):
    """update.py:37-61."""

    gauss_num: int = 4
    sample_num: int = 9
    corr_levels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mu, corr, w, sigma):
        """mu/w/sigma: (B,H,W,G); corr: (B,H,W,L·G·S)."""
        B, H, W, _ = mu.shape
        G, S, L = self.gauss_num, self.sample_num, self.corr_levels
        # (B,H,W,L,G,S) → per-gaussian (B·G,H,W,L·S)
        c = corr.reshape(B, H, W, L, G, S).transpose(0, 4, 1, 2, 3, 5)
        c = c.reshape(B * G, H, W, L * S)
        c = nn.relu(conv(64, 3, 1, 1, self.dtype, name="convc1")(c))
        c = nn.relu(conv(64, 3, 1, 1, self.dtype, name="convc2")(c))
        c = nn.relu(conv(48, 3, 1, 1, self.dtype, name="convc3")(c))
        c = c.reshape(B, G, H, W, 48).transpose(0, 2, 3, 1, 4).reshape(B, H, W, G * 48)

        param = jnp.concatenate(
            [mu, jax.lax.stop_gradient(w), jax.lax.stop_gradient(sigma)], axis=-1
        )  # 3G channels
        pf = nn.relu(conv(64, 7, 1, 3, self.dtype, name="convf1")(param))
        pf = nn.relu(conv(64 - 3 * G, 3, 1, 1, self.dtype, name="convf2")(pf))
        return jnp.concatenate([c, pf, param], axis=-1)  # 48G + 64 = 256 @ G=4


class ParametersUpdater(nn.Module):
    """update.py:77-112: closed-form μ/σ/w updates."""

    gauss_num: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, mu, sigma, w):
        delta = FlowHead(256, self.gauss_num, self.dtype, name="head")(hidden).astype(jnp.float32)
        mu = mu.astype(jnp.float32)
        sigma = sigma.astype(jnp.float32)
        w = w.astype(jnp.float32)
        M = float(self.gauss_num)
        sigma0, eps = 0.5, 1e-3

        d_sigma = 0.5 * (
            ((1 - M * w) * sigma**2 - sigma0**2 - delta**2) / (M * sigma**3)
            + w * sigma / sigma0**2
        )
        d_mu = -0.5 * delta * (1 / (M * sigma**2) + w / sigma0**2)
        beta = 0.5 * (
            -1 / (M * w + eps)
            + jnp.log(sigma0 * M * w / sigma + eps)
            + (sigma**2 + delta**2) / (2 * sigma0**2)
            + 0.5
        )
        d_w = beta - beta.sum(axis=-1, keepdims=True) / M

        d_sigma = jnp.clip(d_sigma, -3, 3)
        d_mu = jnp.clip(d_mu, -128, 128)
        d_w = jnp.clip(d_w, -1 / (M * 4), 1 / (M * 4))

        sigma = jnp.clip(sigma - d_sigma, 0.1, 16.0)
        mu = mu - d_mu
        w = jnp.clip(w - d_w, 0.0, 1.0)
        w = w / w.sum(axis=-1, keepdims=True)
        return mu, w, sigma


class BasicMultiUpdateBlockPCV(nn.Module):
    """update.py:115-170. hidden_dims has 4 entries; finest GRU uses [3]."""

    n_gru_layers: int = 3
    n_downsample: int = 2
    hidden_dims: Sequence[int] = (128, 128, 128, 128)
    gauss_num: int = 4
    sample_num: int = 9
    corr_levels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr=None, mu=None, w=None, sigma=None,
                 iter04=True, iter08=True, iter16=True, update=True,
                 motion_features_list=None, mask_pred=None):
        hd = self.hidden_dims
        dt = self.dtype
        net = list(net)

        if motion_features_list is None:
            mf = BasicMotionEncoderPCV(
                self.gauss_num, self.sample_num, self.corr_levels, dt, name="encoder"
            )(mu.astype(dt), corr.astype(dt), w.astype(dt), sigma.astype(dt))
            motion_features_list = [mf]
            if self.n_gru_layers >= 2:
                m08_0 = nn.relu(conv(128, 3, 2, 1, dt, name="conv2_0")(jax.lax.stop_gradient(mf)))
                m08 = nn.relu(conv(128, 3, 1, 1, dt, name="conv2_out_0")(m08_0))
                motion_features_list = [mf, m08]
            if self.n_gru_layers >= 3:
                m16 = nn.relu(conv(128, 3, 2, 1, dt, name="conv3_0")(jax.lax.stop_gradient(m08_0)))
                m16 = nn.relu(conv(128, 3, 1, 1, dt, name="conv3_out_0")(m16))
                motion_features_list = [mf, m08, m16]

        gru04 = ConvGRU(hd[3], dtype=dt, name="gru04")
        gru08 = ConvGRU(hd[2], dtype=dt, name="gru08")
        gru16 = ConvGRU(hd[1], dtype=dt, name="gru16")

        if iter16:
            net[2] = gru16(net[2], inp[2], motion_features_list[2], pool2x(net[1]))
        if iter08:
            if self.n_gru_layers > 2:
                net[1] = gru08(net[1], inp[1], motion_features_list[1], pool2x(net[0]),
                               interp_bilinear_align(net[2], net[1].shape[1:3]))
            else:
                net[1] = gru08(net[1], inp[1], motion_features_list[1], pool2x(net[0]))
        if iter04:
            if self.n_gru_layers > 1:
                net[0] = gru04(net[0], inp[0], motion_features_list[0],
                               interp_bilinear_align(net[1], net[0].shape[1:3]))
            else:
                net[0] = gru04(net[0], inp[0], motion_features_list[0])

        if not update:
            return tuple(net), motion_features_list

        mu, w, sigma = ParametersUpdater(self.gauss_num, dt, name="ParametersUpdater")(
            net[0], mu, sigma, w
        )
        factor = 2**self.n_downsample
        # test mode: only the FINAL iteration's mask feeds the refinement
        # upsample (model.py:156-162) — cond-skip the head elsewhere
        k1, b1 = _ConvParams(256, net[0].shape[-1], 3, name="mask_conv1")()
        k2, b2 = _ConvParams(factor**2 * 9, 256, 1, name="mask_conv2")()
        mask = cond_mask_head(net[0], k1, b1, k2, b2, dt, mask_pred)
        return tuple(net), mask, mu, sigma, w


class RefineNet(nn.Module):
    """refinement.py:5-37."""

    gauss_num: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, w, sigma, mu, disp, features):
        dt = self.dtype
        w_sigma = w * sigma
        u = nn.relu(conv(64, 3, 1, 1, dt, name="conv0_0")(
            jnp.concatenate([w_sigma, mu, disp], axis=-1)))
        u = nn.relu(conv(64, 3, 1, 1, dt, name="conv0_2")(u))
        umap = nn.sigmoid(conv(1, 3, 1, 1, dt, name="conv_softmask_0")(u))
        x = nn.relu(conv(32, 7, 1, 3, dt, name="conv_disp_0")(disp))
        x1 = nn.relu(conv(64, 3, 1, 1, dt, name="conv1_0")(
            jnp.concatenate([x, features, w_sigma, mu, u], axis=-1)))
        x = nn.relu(nn.Conv(64, (3, 3), padding=[(3, 3)] * 2, kernel_dilation=(3, 3),
                            dtype=dt, name="conv2_0")(x1))
        x = nn.relu(nn.Conv(64, (3, 3), padding=[(7, 7)] * 2, kernel_dilation=(7, 7),
                            dtype=dt, name="conv3_0")(x))
        x = conv(1, 3, 1, 1, dt, name="conv4")(x)
        return disp + x * umap
