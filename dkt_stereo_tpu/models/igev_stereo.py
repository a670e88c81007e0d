"""IGEV-Stereo, TPU-native.

Rebuild of meta_arch/igev_stereo/igev_stereo.py:91-226 — and **registered**
in the model zoo (the reference's meta_arch/__init__.py:7-12 forgot it;
SURVEY.md §7 known bugs).

Structure: MobileNetV2 features + stems (frozen via ``stop_gradient`` during
fine-tune, matching the ``torch.no_grad()`` at :157-168) → 8-group GWC
volume over 96-d descriptors → corr_stem + FeatureAtt + IGEV hourglass with
per-scale attention → geometry encoding volume (8ch) → init disparity by
soft-argmin → ConvGRU iterations over the combined geo lookup (``nn.scan``)
→ superpixel context upsample ×4. Outputs negated (−disp), per the
reference's convention (:216, :222).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from dkt_stereo_tpu.nn.blocks import MultiBasicEncoder, bn_eval_affine, conv
from dkt_stereo_tpu.nn.conv3d import RawConv3DParams, thin_conv3d
from dkt_stereo_tpu.nn.igev_blocks import (
    BasicConvIGEV,
    Conv2xIGEV,
    ConvTransposeTorch,
    FeatureAtt,
    HourglassIGEV,
    IGEVFeature,
    kaiming_out,
)
from dkt_stereo_tpu.nn.igev_update import BasicMultiUpdateBlockIGEV
from dkt_stereo_tpu.nn.norms import InstanceNorm
from dkt_stereo_tpu.ops.geometry import CombinedGeoEncodingVolume, geo_lookup
from dkt_stereo_tpu.ops.upsample import context_upsample
from dkt_stereo_tpu.ops.volumes import build_gwc_volume, disparity_regression


@dataclasses.dataclass(frozen=True)
class IGEVStereoConfig:
    """configs/igev_stereo/base.json."""

    corr_levels: int = 2
    corr_radius: int = 4
    n_downsample: int = 2
    context_norm: str = "batch"
    slow_fast_gru: bool = False
    n_gru_layers: int = 3
    hidden_dims: Tuple[int, ...] = (128, 128, 128)
    max_disp: int = 192
    mixed_precision: bool = True
    freeze_backbone: bool = True  # torch.no_grad() trunk (igev_stereo.py:157)
    # "reg" = XLA lookup; "reg_cuda"/"pallas" = fused Pallas geo-lookup kernel
    corr_implementation: str = "reg"
    # storage dtype of the hoisted geo/corr pyramids on the Pallas path
    # (same switch as RAFTStereoConfig.corr_dtype): "bfloat16" halves the
    # pyramid HBM/VMEM footprint (the hot-path default), "float32" keeps the
    # fp32-correlation policy end-to-end (and makes reg_cuda vs reg an
    # apples-to-apples kernel comparison — scripts/validate_kernels.py)
    corr_dtype: str = "bfloat16"
    # TPU extension: jax.checkpoint each GRU iteration (activation memory
    # O(1) in iters; numerics identical — tests/test_remat.py)
    remat_iters: bool = False
    # depth-to-lane packed cost aggregation (nn/conv3d_packed.py): the GWC
    # volume flows (B,H,W,D,C) and every 3D conv of corr_stem/hourglass/
    # classifier runs as a full-lane 2D conv. Same parameters, same math
    # (tests/test_igev_packed.py); ~5x faster aggregation on TPU
    # (IGEV_PROF_r05 vs docs/PERF.md round 5). False = direct NDHWC convs.
    agg_packed: bool = True

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.mixed_precision else jnp.float32

    @classmethod
    def from_dict(cls, d: dict) -> "IGEVStereoConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: tuple(v) if isinstance(v, list) else v for k, v in d.items() if k in known}
        return cls(**kw)


class _RawKernel(nn.Module):
    """A single conv/deconv kernel parameter (no bias), nn.Conv tree name.
    Distinct from blocks._ConvParams: that one is square-conv (k,k,I,O) with
    a bias; this takes an arbitrary shape so it can express the
    ConvTransposeTorch (k,k,O,I) layout."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", kaiming_out, self.shape, jnp.float32)


class _SpxConvBn(nn.Module):
    """Raw params of one BasicConvIGEV(norm='batch'): conv kernel + BN."""

    shape: Tuple[int, ...]  # conv kernel shape
    ch: int  # BN channels

    @nn.compact
    def __call__(self):
        from dkt_stereo_tpu.nn.blocks import _RawBN

        return _RawKernel(self.shape, name="conv")(), _RawBN(self.ch, name="bn")()


class _SpxGhost(nn.Module):
    """Raw parameter tree of the per-iteration spx upsampling chain —
    Conv2xIGEV('spx_2_gru', deconv) — with the exact same scope paths, so
    the (expensive, full-resolution) computation can sit under ``lax.cond``:
    in test mode only the FINAL iteration's upsample is consumed
    (igev_stereo.py:216-222 discards the rest) and the chain is ~1/3 of the
    per-iteration cost at eval sizes."""

    in_ch: int  # mask_feat_4 channels

    @nn.compact
    def __call__(self):
        # ConvTransposeTorch kernel layout (k, k, O, I)
        c1 = _SpxConvBn((4, 4, 32, self.in_ch), 32, name="conv1")()
        c2 = _SpxConvBn((3, 3, 64, 64), 64, name="conv2")()
        return c1, c2


class _SpxGhostT(nn.Module):
    """Raw params of ConvTransposeTorch('spx_gru_0', 9ch, bias)."""

    @nn.compact
    def __call__(self):
        k = self.param("kernel", kaiming_out, (4, 4, 9, 64), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (9,), jnp.float32)
        return k, b


def _conv_transpose_torch(x, w, stride=2, padding=1, dt=jnp.float32):
    """The ConvTransposeTorch math as a pure function (kernel (k,k,O,I))."""
    k = w.shape[0]
    w_conv = jnp.swapaxes(jnp.flip(w, axis=(0, 1)), -1, -2)
    pad = [(k - 1 - padding, k - 1 - padding)] * 2
    return jax.lax.conv_general_dilated(
        x.astype(dt), w_conv.astype(dt), (1, 1), pad,
        lhs_dilation=(stride, stride), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn_eval(x, bn, dt):
    """Eval-mode BatchNorm as an affine (shared fold: blocks.bn_eval_affine)."""
    a, b = bn_eval_affine(bn)
    return x.astype(dt) * a.astype(dt) + b.astype(dt)


class _IGEVIterStep(nn.Module):
    cfg: IGEVStereoConfig
    collect_up: bool

    @nn.compact
    def __call__(self, carry, consts, is_last):
        cfg = self.cfg
        dt = cfg.compute_dtype
        net, disp, _ = carry
        geo_pyr_g, geo_pyr_c, inp, coords, stem_2x = consts

        disp = jax.lax.stop_gradient(disp)
        if cfg.corr_implementation in ("reg_cuda", "alt_cuda", "pallas"):
            from dkt_stereo_tpu.ops.pallas.geo_lookup import geo_lookup_pallas

            # pyramids arrive pre-cast to bf16 (hoisted out of the scan body
            # by the model; see IGEVStereo.__call__) — keeps the per-level
            # kernels inside the 16MB scoped-VMEM budget at eval sizes
            interpret = jax.default_backend() == "cpu"
            geo_feat = geo_lookup_pallas(
                tuple(geo_pyr_g), tuple(geo_pyr_c), disp, coords, cfg.corr_radius, interpret
            )
        else:
            geo_feat = geo_lookup(
                list(geo_pyr_g), list(geo_pyr_c), disp, coords, cfg.corr_radius
            )

        block = BasicMultiUpdateBlockIGEV(cfg.n_gru_layers, cfg.hidden_dims, dt, name="update_block")
        if cfg.n_gru_layers == 3 and cfg.slow_fast_gru:
            net = block(net, inp, iter16=True, iter08=False, iter04=False, update=False)
        if cfg.n_gru_layers >= 2 and cfg.slow_fast_gru:
            net = block(net, inp, iter16=cfg.n_gru_layers == 3, iter08=True, iter04=False, update=False)
        net, mask_feat_4, delta = block(
            net, inp, geo_feat.astype(dt), disp.astype(dt),
            iter16=cfg.n_gru_layers == 3, iter08=cfg.n_gru_layers >= 2,
            # test mode: the mask feature feeds only the final iteration's
            # spx upsample — skip its conv on the other 31 iterations
            mask_pred=None if self.collect_up else is_last,
        )
        disp = disp + delta.astype(jnp.float32)

        if self.collect_up:
            # spx upsampling (igev_stereo.py:140-148), fp32 softmax
            xspx = Conv2xIGEV(32, True, 2, True, True, "batch", True, True, dt, name="spx_2_gru")(mask_feat_4, stem_2x)
            spx = ConvTransposeTorch(9, 2, 4, 2, 1, 0, True, dt, name="spx_gru_0")(xspx)
            spx = jax.nn.softmax(spx.astype(jnp.float32), axis=-1)
            disp_up = context_upsample(disp * 4.0, spx)  # (B, H, W)
            return (net, disp, disp_up), -disp_up

        # test mode: only the FINAL iteration's upsample is consumed
        # (igev_stereo.py:216-222) — run the full-resolution spx chain under
        # lax.cond with raw params (same tree paths as the train modules)
        (c1k, c1bn), (c2k, c2bn) = _SpxGhost(
            mask_feat_4.shape[-1], name="spx_2_gru"
        )()
        tk, tb = _SpxGhostT(name="spx_gru_0")()

        def _spx(args):
            mf, s2, d = args
            y = _conv_transpose_torch(mf, c1k, 2, 1, dt)
            y = nn.leaky_relu(_bn_eval(y, c1bn, dt), negative_slope=0.01)
            y = jnp.concatenate([y, s2.astype(dt)], axis=-1)
            y = jax.lax.conv_general_dilated(
                y, c2k.astype(dt), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = nn.leaky_relu(_bn_eval(y, c2bn, dt), negative_slope=0.01)
            spx = _conv_transpose_torch(y, tk, 2, 1, dt) + tb.astype(dt)
            spx = jax.nn.softmax(spx.astype(jnp.float32), axis=-1)
            return context_upsample(d * 4.0, spx)  # (B, H, W)

        disp_up = jax.lax.cond(
            is_last, _spx, lambda args: carry[2], (mask_feat_4, stem_2x, disp)
        )
        return (net, disp, disp_up), jnp.zeros((), jnp.float32)


class IGEVStereo(nn.Module):
    """train: {"init_disp": (B,H,W), "disp_preds": (iters,B,H,W)} (negative);
    test: (None, disp_up (B,H,W))."""

    cfg: IGEVStereoConfig
    iters: int = 12
    test_mode: bool = False

    @nn.compact
    def __call__(self, image1, image2, flow_init: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        dt = cfg.compute_dtype
        ura = True
        D4 = cfg.max_disp // 4

        x1 = (2.0 * (image1 / 255.0) - 1.0).astype(dt)
        x2 = (2.0 * (image2 / 255.0) - 1.0).astype(dt)

        # both views through the trunk as ONE batch-2B call (the reference
        # runs two python calls, igev_stereo.py:159-160; batching is exact —
        # BN is eval-affine, IN is per-sample — and ~2x better utilized)
        B0 = x1.shape[0]
        x12 = jnp.concatenate([x1, x2], axis=0)
        feature = IGEVFeature(ura, dt, name="feature")
        feats_lr = feature(x12)
        feats_l = [f[:B0] for f in feats_lr]
        feats_r = [f[B0:] for f in feats_lr]

        # shared InstanceNorm module (param-free), NOT inline math: the
        # banded eval's cross_band_stats context must hook these norms too
        _in = InstanceNorm()

        def _inorm_relu(y):
            return nn.relu(_in(y))

        # shared module instances applied to both views (weight sharing)
        stem2_a = BasicConvIGEV(32, False, 2, "instance", True, 3, 2, 1, ura, dt, name="stem_2_0")
        stem2_b = conv(32, 3, 1, 1, dt, name="stem_2_1", use_bias=False)
        stem4_a = BasicConvIGEV(48, False, 2, "instance", True, 3, 2, 1, ura, dt, name="stem_4_0")
        stem4_b = conv(48, 3, 1, 1, dt, name="stem_4_1", use_bias=False)
        stem_2 = lambda x: _inorm_relu(stem2_b(stem2_a(x)))
        stem_4 = lambda x: _inorm_relu(stem4_b(stem4_a(x)))

        stem_2xy = stem_2(x12)
        stem_4xy = stem_4(stem_2xy)
        stem_2x = stem_2xy[:B0]
        feat0_lr = jnp.concatenate([feats_lr[0], stem_4xy], axis=-1)  # 96ch
        feats_l[0] = feat0_lr[:B0]
        feats_r[0] = feat0_lr[B0:]

        conv_m = BasicConvIGEV(96, False, 2, "instance", True, 3, 1, 1, ura, dt, name="conv")
        desc_m = conv(96, 1, 1, 0, dt, name="desc")
        match_lr = desc_m(conv_m(feat0_lr))
        match_l = match_lr[:B0]
        match_r = match_lr[B0:]

        if cfg.freeze_backbone and not self.test_mode:
            # torch.no_grad() trunk during fine-tune (igev_stereo.py:157-168)
            feats_l = [jax.lax.stop_gradient(f) for f in feats_l]
            feats_r = [jax.lax.stop_gradient(f) for f in feats_r]
            match_l = jax.lax.stop_gradient(match_l)
            match_r = jax.lax.stop_gradient(match_r)
            stem_2x = jax.lax.stop_gradient(stem_2x)

        pk = cfg.agg_packed
        vol_layout = "nhwdc" if pk else "ndhwc"
        gwc = build_gwc_volume(match_l, match_r, D4, 8, layout=vol_layout).astype(dt)
        # corr_stem is a default BasicConv: BN + LeakyReLU (igev_stereo.py:130)
        gwc = BasicConvIGEV(8, False, 3, "batch", True, 3, 1, 1, ura, dt, pk, name="corr_stem")(gwc)
        gwc = FeatureAtt(8, ura, dt, pk, name="corr_feature_att")(gwc, feats_l[0])
        geo_volume = HourglassIGEV(8, ura, dt, pk, name="cost_agg")(gwc, feats_l)

        # 8→1ch disparity classifier; packed: one banded full-lane 2D conv
        # emitting (B,H4,W4,D4) directly (regression layout, no transpose);
        # direct: thin_conv3d (full-lane matmul + shifted tap adds)
        ck, _ = RawConv3DParams(
            (3, 3, 3, geo_volume.shape[-1], 1), use_bias=False, name="classifier"
        )()
        if pk:
            from dkt_stereo_tpu.nn.conv3d_packed import thin_conv3d_packed

            logits = thin_conv3d_packed(geo_volume, ck, 1, 1, dt)  # (B,H4,W4,D4)
            prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            init_disp = disparity_regression(prob, D4)  # (B,H4,W4,1)
        else:
            logits = thin_conv3d(geo_volume, ck, None, dt)[..., 0]  # (B,D4,H4,W4)
            prob = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
            init_disp = disparity_regression(prob.transpose(0, 2, 3, 1), D4)  # (B,H4,W4,1)

        if not self.test_mode:
            xspx = BasicConvIGEV(24, False, 2, "instance", True, 3, 1, 1, ura, dt, name="spx_4_0")(feats_l[0])
            xspx = conv(24, 3, 1, 1, dt, name="spx_4_1", use_bias=False)(xspx)
            xspx = _inorm_relu(xspx)
            xspx = Conv2xIGEV(32, True, 2, True, True, "instance", True, ura, dt, name="spx_2")(xspx, stem_2x)
            spx_pred = ConvTransposeTorch(9, 2, 4, 2, 1, 0, True, dt, name="spx_0")(xspx)
            spx_pred = jax.nn.softmax(spx_pred.astype(jnp.float32), axis=-1)

        cnet = MultiBasicEncoder(
            output_dim=(tuple(cfg.hidden_dims), tuple(cfg.hidden_dims)),
            norm_fn=cfg.context_norm, downsample=cfg.n_downsample,
            num_layers=cfg.n_gru_layers, dtype=dt, name="cnet",
        )
        cnet_list = cnet(x1)
        net = tuple(jnp.tanh(o[0]) for o in cnet_list)
        inp = []
        for i, o in enumerate(cnet_list[: cfg.n_gru_layers]):
            z = conv(cfg.hidden_dims[i] * 3, 3, 1, 1, dt, name=f"context_zqr_convs_{i}")(nn.relu(o[1]))
            inp.append(tuple(jnp.split(z, 3, axis=-1)))
        inp = tuple(inp)

        geo_fn = CombinedGeoEncodingVolume(
            match_l.astype(jnp.float32), match_r.astype(jnp.float32),
            geo_volume.astype(jnp.float32),  # (B,D,H,W,C) or packed (B,H,W,D,C)
            num_levels=cfg.corr_levels, radius=cfg.corr_radius,
            layout=vol_layout,
        )
        B, Hc, Wc, _ = match_l.shape
        coords = jnp.broadcast_to(
            jnp.arange(Wc, dtype=jnp.float32)[None, None, :, None], (B, Hc, Wc, 1)
        )

        # NB the reference's forward takes flow_init but never uses it
        # (igev_stereo.py:151); iterations always start from init_disp
        disp = init_disp

        geo_pyr_g = tuple(geo_fn.geo_pyramid)
        geo_pyr_c = tuple(geo_fn.init_corr_pyramid)
        if (
            cfg.corr_implementation in ("reg_cuda", "alt_cuda", "pallas")
            and cfg.corr_dtype == "bfloat16"
            and jax.default_backend() != "cpu"
        ):
            # cast ONCE outside the scan (a convert inside the body would
            # re-materialize the ~100MB pyramids every iteration unless XLA's
            # loop-invariant motion catches it); bf16 halves the per-level
            # Pallas kernel VMEM blocks (corr_dtype="float32" opts out; the
            # kernel's byte-budget W1 chunking keeps fp32 legal too)
            geo_pyr_g = tuple(v.astype(jnp.bfloat16) for v in geo_pyr_g)
            geo_pyr_c = tuple(v.astype(jnp.bfloat16) for v in geo_pyr_c)

        collect = not self.test_mode
        step_cls = (
            nn.remat(_IGEVIterStep, prevent_cse=False)
            if cfg.remat_iters
            else _IGEVIterStep
        )
        Scan = nn.scan(
            step_cls,
            variable_broadcast=("params", "batch_stats"),
            split_rngs={"params": False},
            in_axes=(nn.broadcast, 0),
            out_axes=0,
            length=self.iters,
        )
        step = Scan(cfg, collect, name="step")
        disp_up0 = jnp.zeros((B, Hc * 4, Wc * 4), jnp.float32)
        is_last = jnp.arange(self.iters) == self.iters - 1
        (net, disp, disp_up), ys = step(
            (net, disp, disp_up0),
            (geo_pyr_g, geo_pyr_c, inp, coords, stem_2x),
            is_last,
        )

        if self.test_mode:
            return None, -disp_up

        init_up = -context_upsample(init_disp * 4.0, spx_pred)  # (B,H,W)
        return {"init_disp": init_up, "disp_preds": ys}
