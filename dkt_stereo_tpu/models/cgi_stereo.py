"""CGI-Stereo, TPU-native.

Rebuild of meta_arch/cgi/CGI_Stereo.py:190-268: ImageNet-normalized inputs,
MobileNetV2 taps + FeatUp fusion shared across views, BN stems, 48-d
descriptors → single-channel norm-correlation volume (D/4) → corr_stem →
semantic attention volume → hourglass with Context-Geometry-Fusion at three
scales → top-2 regression + superpixel context upsample. Single-shot (no GRU
iterations); train returns {"disp_preds": [-pred·4, -pred_up·4]}.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from dkt_stereo_tpu.nn.blocks import conv
from dkt_stereo_tpu.nn.igev_blocks import (
    BasicConvIGEV,
    Conv2xIGEV,
    ConvTransposeTorch,
)
from dkt_stereo_tpu.nn.mobilenetv2 import MobileNetV2Trunk
from dkt_stereo_tpu.nn.norms import Norm
from dkt_stereo_tpu.ops.upsample import context_upsample
from dkt_stereo_tpu.ops.volumes import build_norm_correlation_volume, regression_topk

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class CGIStereoConfig:
    """configs/cgi/base.json."""

    maxdisp: int = 192
    mixed_precision: bool = True

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.mixed_precision else jnp.float32

    @classmethod
    def from_dict(cls, d: dict) -> "CGIStereoConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class ContextGeometryFusion(nn.Module):
    """CGI_Stereo.py:100-123."""

    cv_chan: int
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cv, feat):
        ura, dt = self.use_running_average, self.dtype
        im_chan = feat.shape[-1]
        s = BasicConvIGEV(im_chan // 2, False, 2, "batch", True, 1, 1, 0, ura, dt, name="semantic_0")(feat)
        s = conv(self.cv_chan, 1, 1, 0, dt, name="semantic_1")(s)
        feat3d = s[:, None]  # (B,1,H,W,C) broadcast over D
        a = BasicConvIGEV(self.cv_chan, False, 3, "batch", True, (1, 5, 5), 1, (0, 2, 2), ura, dt, name="att_0")(feat3d + cv)
        a = nn.Conv(self.cv_chan, (1, 1, 1), use_bias=False, dtype=dt, name="att_1")(a)
        cv = nn.sigmoid(a) * feat3d + cv
        return BasicConvIGEV(self.cv_chan, False, 3, "batch", True, (1, 5, 5), 1, (0, 2, 2), ura, dt, name="agg")(cv)


class HourglassFusion(nn.Module):
    """CGI_Stereo.py:126-188: encoder-decoder with CGF; final 1-ch deconv."""

    in_channels: int
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, imgs):
        c, ura, dt = self.in_channels, self.use_running_average, self.dtype

        def bc(feat, name, deconv=False, kernel=3, stride=1, pad=1, norm="batch", relu=True):
            return BasicConvIGEV(feat, deconv, 3, norm, relu, kernel, stride, pad, ura, dt, name=name)

        conv1 = bc(c * 2, "conv1_0", stride=2)(x)
        conv1 = bc(c * 2, "conv1_1")(conv1)
        conv2 = bc(c * 4, "conv2_0", stride=2)(conv1)
        conv2 = bc(c * 4, "conv2_1")(conv2)
        conv3 = bc(c * 6, "conv3_0", stride=2)(conv2)
        conv3 = bc(c * 6, "conv3_1")(conv3)

        conv3 = ContextGeometryFusion(c * 6, ura, dt, name="CGF_32")(conv3, imgs[3])
        conv3_up = bc(c * 4, "conv3_up", deconv=True, kernel=4, stride=2, pad=1)(conv3)

        conv2 = jnp.concatenate([conv3_up, conv2], axis=-1)
        conv2 = bc(c * 4, "agg_0_0", kernel=1, pad=0)(conv2)
        conv2 = bc(c * 4, "agg_0_1")(conv2)
        conv2 = bc(c * 4, "agg_0_2")(conv2)
        conv2 = ContextGeometryFusion(c * 4, ura, dt, name="CGF_16")(conv2, imgs[2])
        conv2_up = bc(c * 2, "conv2_up", deconv=True, kernel=4, stride=2, pad=1)(conv2)

        conv1 = jnp.concatenate([conv2_up, conv1], axis=-1)
        conv1 = bc(c * 2, "agg_1_0", kernel=1, pad=0)(conv1)
        conv1 = bc(c * 2, "agg_1_1")(conv1)
        conv1 = bc(c * 2, "agg_1_2")(conv1)
        conv1 = ContextGeometryFusion(c * 2, ura, dt, name="CGF_8")(conv1, imgs[1])
        return BasicConvIGEV(1, True, 3, None, False, 4, 2, 1, ura, dt, name="conv1_up")(conv1)


class CGIStereo(nn.Module):
    cfg: CGIStereoConfig
    iters: int = 0  # single-shot
    test_mode: bool = False

    @nn.compact
    def __call__(self, image1, image2, flow_init: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        dt = cfg.compute_dtype
        ura = True
        D4 = cfg.maxdisp // 4

        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        x1 = ((image1 / 255.0 - mean) / std).astype(dt)
        x2 = ((image2 / 255.0 - mean) / std).astype(dt)

        trunk = MobileNetV2Trunk(ura, dt, name="feature_trunk")
        _, l4, l8, l16, l32 = trunk(x1)
        _, r4, r8, r16, r32 = trunk(x2)

        # FeatUp fusion, modules shared across views (CGI_Stereo.py:71-96)
        d32_16 = Conv2xIGEV(96, True, 2, True, True, "batch", True, ura, dt, name="deconv32_16")
        d16_8 = Conv2xIGEV(32, True, 2, True, True, "batch", True, ura, dt, name="deconv16_8")
        d8_4 = Conv2xIGEV(24, True, 2, True, True, "batch", True, ura, dt, name="deconv8_4")
        conv4 = BasicConvIGEV(48, False, 2, "batch", True, 3, 1, 1, ura, dt, name="conv4")
        l16f, r16f = d32_16(l32, l16), d32_16(r32, r16)
        l8f, r8f = d16_8(l16f, l8), d16_8(r16f, r8)
        l4f, r4f = conv4(d8_4(l8f, l4)), conv4(d8_4(r8f, r4))
        feats_l = [l4f, l8f, l16f, l32]
        feats_r = [r4f, r8f, r16f, r32]

        stem2_a = BasicConvIGEV(32, False, 2, "batch", True, 3, 2, 1, ura, dt, name="stem_2_0")
        stem2_b = conv(32, 3, 1, 1, dt, name="stem_2_1", use_bias=False)
        stem2_bn = Norm("batch", None, ura, dt, name="stem_2_bn")
        stem4_a = BasicConvIGEV(48, False, 2, "batch", True, 3, 2, 1, ura, dt, name="stem_4_0")
        stem4_b = conv(48, 3, 1, 1, dt, name="stem_4_1", use_bias=False)
        stem4_bn = Norm("batch", None, ura, dt, name="stem_4_bn")
        stem_2 = lambda x: nn.relu(stem2_bn(stem2_b(stem2_a(x))))
        stem_4 = lambda x: nn.relu(stem4_bn(stem4_b(stem4_a(x))))

        stem_2x = stem_2(x1)
        stem_4x = stem_4(stem_2x)
        stem_2y = stem_2(x2)
        stem_4y = stem_4(stem_2y)
        feats_l[0] = jnp.concatenate([feats_l[0], stem_4x], axis=-1)  # 96ch
        feats_r[0] = jnp.concatenate([feats_r[0], stem_4y], axis=-1)

        conv_m = BasicConvIGEV(48, False, 2, "batch", True, 3, 1, 1, ura, dt, name="conv")
        desc_m = conv(48, 1, 1, 0, dt, name="desc")
        match_l = desc_m(conv_m(feats_l[0]))
        match_r = desc_m(conv_m(feats_r[0]))

        cv = build_norm_correlation_volume(
            match_l.astype(jnp.float32), match_r.astype(jnp.float32), D4
        ).astype(dt)  # (B,D4,H4,W4,1)
        cv = BasicConvIGEV(8, False, 3, "batch", True, 3, 1, 1, ura, dt, name="corr_stem")(cv)
        sem = BasicConvIGEV(32, False, 2, "batch", True, 3, 1, 1, ura, dt, name="semantic_0")(feats_l[0])
        sem = conv(8, 1, 1, 0, dt, name="semantic_1", use_bias=False)(sem)
        vol = BasicConvIGEV(8, False, 3, "batch", True, (1, 5, 5), 1, (0, 2, 2), ura, dt, name="agg")(
            sem[:, None] * cv
        )
        cost = HourglassFusion(8, ura, dt, name="hourglass_fusion")(vol, feats_l)  # (B,D4,H4,W4,1)

        xspx = BasicConvIGEV(32, False, 2, "batch", True, 3, 1, 1, ura, dt, name="spx_4_0")(feats_l[0])
        xspx = conv(32, 3, 1, 1, dt, name="spx_4_1", use_bias=False)(xspx)
        xspx = nn.relu(Norm("batch", None, ura, dt, name="spx_4_bn")(xspx))
        xspx = Conv2xIGEV(32, True, 2, True, True, "batch", True, ura, dt, name="spx_2")(xspx, stem_2x)
        spx_pred = ConvTransposeTorch(9, 2, 4, 2, 1, 0, True, dt, name="spx_0")(xspx)
        spx_pred = jax.nn.softmax(spx_pred.astype(jnp.float32), axis=-1)

        cost_hw = cost[..., 0].transpose(0, 2, 3, 1).astype(jnp.float32)  # (B,H4,W4,D4)
        # pre-regression cost, exposed for hard-bound parity tests (the final
        # disparity additionally depends on top-2 tie-breaks that are fp-order
        # sensitive; the cost itself is not)
        self.sow("intermediates", "cost_volume", cost_hw)
        samples = jnp.broadcast_to(
            jnp.arange(D4, dtype=jnp.float32), cost_hw.shape
        )
        pred = regression_topk(cost_hw, samples, 2)  # (B,H4,W4,1)
        pred_up = context_upsample(pred, spx_pred)  # (B,H,W)

        if self.test_mode:
            return None, -pred_up * 4.0
        # per CGI_Stereo.py:264: [-pred*4 (quarter res), -pred_up*4 (full)]
        return {"disp_preds": [-pred[..., 0] * 4.0, -pred_up * 4.0]}
