"""GWCNet (group-wise correlation network), TPU-native.

Rebuild of meta_arch/gwcnet/gwc_main.py:156-326: PSMNet trunk → 40-group GWC
volume (+ optional concat volume) at 1/4 → pre-hourglass ``dres0/1`` → 3
stacked 3D hourglasses → 4 classifier heads (train) / last head (eval) →
×4 trilinear upsample → softmax + soft-argmin, negated outputs.

Volumes are NDHWC (B, D/4, H/4, W/4, C) — XLA's conv3d-native layout.
The ptrans contrastive projection head (gwc_main.py:174-181,290-300) is
carried as an optional sub-head (``ptrans`` config flag).

BN note: the reference's ``freeze_bn`` is a no-op for GWCNet (gwc_main.py:231)
so its BN layers stay in train mode during fine-tuning; here BN runs with
stored statistics inside the jitted step (``use_running_average=True``) —
set ``train_bn`` and handle the mutable ``batch_stats`` collection for
from-scratch pre-training.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from dkt_stereo_tpu.nn.conv3d import (
    ConvBN3D,
    Hourglass3D,
    RawConv3DParams,
    thin_conv3d,
)
from dkt_stereo_tpu.nn.norms import Norm
from dkt_stereo_tpu.nn.psm import FeatureExtractionPSM
from dkt_stereo_tpu.ops.resize import interp_trilinear_halfpix
from dkt_stereo_tpu.ops.volumes import (
    build_concat_volume,
    build_gwc_volume,
    disparity_regression,
)


@dataclasses.dataclass(frozen=True)
class GWCNetConfig:
    """configs/gwcnet/base_g.json / base_gc.json."""

    maxdisp: int = 192
    use_concat_volume: bool = False
    num_groups: int = 40
    concat_channels: int = 12
    ptrans: bool = False
    mixed_precision: bool = True
    # GWCNet's reference freeze_bn is a no-op (gwc_main.py:231): BN runs in
    # train mode during fine-tuning. train_bn=True reproduces that (apply
    # with mutable=["batch_stats"]); False freezes stats (pure eval).
    train_bn: bool = False

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.mixed_precision else jnp.float32

    @classmethod
    def from_dict(cls, d: dict) -> "GWCNetConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class _Classifier(nn.Module):
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(ConvBN3D(32, 3, 1, 1, self.use_running_average, self.dtype, name="0")(x))
        # 32→1ch tail via thin_conv3d: a direct conv pads the single output
        # channel to a full 128-lane MXU tile (same params/tree as Conv3D)
        k, _ = RawConv3DParams((3, 3, 3, 32, 1), use_bias=False, name="1")()
        return thin_conv3d(x, k, None, self.dtype)


class GWCNet(nn.Module):
    cfg: GWCNetConfig
    iters: int = 0  # unused; registry-uniform signature
    test_mode: bool = False

    @nn.compact
    def __call__(self, image1, image2, flow_init=None, augp1=None, augp2=None):
        cfg = self.cfg
        dt = cfg.compute_dtype
        ura = not (cfg.train_bn and not self.test_mode)
        D4 = cfg.maxdisp // 4

        x1 = (2.0 * (image1 / 255.0) - 1.0).astype(dt)
        x2 = (2.0 * (image2 / 255.0) - 1.0).astype(dt)

        feat = FeatureExtractionPSM(
            cfg.use_concat_volume, cfg.concat_channels, ura, dt, name="feature_extraction"
        )
        fL = feat(x1)
        fR = feat(x2)

        results_extra = {}
        if cfg.ptrans and not self.test_mode and augp1 is not None:
            # patch contrastive projection head (gwc_main.py:174-181, 290-300):
            # augmented patch views through the shared trunk, global-avg-pool,
            # 2-layer projection, L2-normalized embeddings
            Bs, NP, NV = augp1.shape[:3]
            augps = jnp.concatenate([augp1, augp2], axis=2)  # (B,NP,2NV,P,P,3)
            augps = (2.0 * (augps / 255.0) - 1.0).astype(dt)
            flat = augps.reshape(-1, *augps.shape[3:])
            feat_ps = feat(flat)["gwc_feature"].mean(axis=(1, 2))  # GAP → (N,320)
            z = nn.Dense(320, dtype=dt, name="projection_0")(feat_ps)
            z = Norm("batch", None, ura, dt, name="projection_bn")(z[:, None, None, :])[:, 0, 0]
            z = nn.relu(z)
            z = nn.Dense(256, dtype=dt, name="projection_3")(z).astype(jnp.float32)
            z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
            results_extra["z_ps"] = z.reshape(Bs, NP, 2 * NV, 256)

        vol = build_gwc_volume(fL["gwc_feature"], fR["gwc_feature"], D4, cfg.num_groups)
        if cfg.use_concat_volume:
            cvol = build_concat_volume(fL["concat_feature"], fR["concat_feature"], D4, mask_ref=True)
            vol = jnp.concatenate([vol, cvol], axis=-1)
        vol = vol.astype(dt)

        # pre-hourglass (gwc_main.py:183-191)
        c0 = nn.relu(ConvBN3D(32, 3, 1, 1, ura, dt, name="dres0_0")(vol))
        c0 = nn.relu(ConvBN3D(32, 3, 1, 1, ura, dt, name="dres0_1")(c0))
        c1 = nn.relu(ConvBN3D(32, 3, 1, 1, ura, dt, name="dres1_0")(c0))
        c1 = ConvBN3D(32, 3, 1, 1, ura, dt, name="dres1_1")(c1)
        cost0 = c1 + c0

        out1 = Hourglass3D(32, ura, dt, name="dres2")(cost0)
        out2 = Hourglass3D(32, ura, dt, name="dres3")(out1)
        out3 = Hourglass3D(32, ura, dt, name="dres4")(out2)

        B, _, Hc, Wc, _ = cost0.shape
        full = (cfg.maxdisp, Hc * 4, Wc * 4)

        def regress(cost_vol):
            logits = interp_trilinear_halfpix(cost_vol.astype(jnp.float32), full)[..., 0]
            prob = jax.nn.softmax(logits, axis=1)  # over D
            prob_hw_last = prob.transpose(0, 2, 3, 1)  # (B,H,W,D)
            return -disparity_regression(prob_hw_last, cfg.maxdisp)[..., 0]

        if self.test_mode:
            cost3 = _Classifier(ura, dt, name="classif3")(out3)
            return None, regress(cost3)

        preds = []
        for name, c in (("classif0", cost0), ("classif1", out1), ("classif2", out2), ("classif3", out3)):
            preds.append(regress(_Classifier(ura, dt, name=name)(c)))
        return {"disp_preds": jnp.stack(preds), **results_extra}  # (4,B,H,W) negative
