"""IGEV GRU update machinery (rebuild of meta_arch/igev_stereo/update.py).

Scale naming follows IGEV: finest GRU at 1/4 (gru04), cor_planes =
levels·(2r+1)·(8+1) (:76), the disparity is 1-channel, and the block emits a
32-channel mask feature (:117-119) consumed by the spx upsampling path
instead of RAFT's direct convex-mask head."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

import jax

from dkt_stereo_tpu.nn.blocks import _ConvParams, conv
from dkt_stereo_tpu.nn.gru import ConvGRU, FlowHead
from dkt_stereo_tpu.ops.resize import interp_bilinear_align, pool2x


class BasicMotionEncoderIGEV(nn.Module):
    """update.py:73-92 (disp is 1-channel; output 127+1)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, disp, corr):
        cor = nn.relu(conv(64, 1, 1, 0, self.dtype, name="convc1")(corr))
        cor = nn.relu(conv(64, 3, 1, 1, self.dtype, name="convc2")(cor))
        d = nn.relu(conv(64, 7, 1, 3, self.dtype, name="convd1")(disp))
        d = nn.relu(conv(64, 3, 1, 1, self.dtype, name="convd2")(d))
        out = nn.relu(
            conv(127, 3, 1, 1, self.dtype, name="conv")(jnp.concatenate([cor, d], axis=-1))
        )
        return jnp.concatenate([out, disp], axis=-1)


class BasicMultiUpdateBlockIGEV(nn.Module):
    """update.py:104-142."""

    n_gru_layers: int = 3
    hidden_dims: Sequence[int] = (128, 128, 128)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr=None, disp=None,
                 iter04=True, iter08=True, iter16=True, update=True,
                 mask_pred=None):
        hd = self.hidden_dims
        net = list(net)
        gru04 = ConvGRU(hd[2], dtype=self.dtype, name="gru04")
        gru08 = ConvGRU(hd[1], dtype=self.dtype, name="gru08")
        gru16 = ConvGRU(hd[0], dtype=self.dtype, name="gru16")

        if iter16:
            net[2] = gru16(net[2], inp[2], pool2x(net[1]))
        if iter08:
            if self.n_gru_layers > 2:
                net[1] = gru08(net[1], inp[1], pool2x(net[0]),
                               interp_bilinear_align(net[2], net[1].shape[1:3]))
            else:
                net[1] = gru08(net[1], inp[1], pool2x(net[0]))
        if iter04:
            motion = BasicMotionEncoderIGEV(self.dtype, name="encoder")(disp, corr)
            if self.n_gru_layers > 1:
                net[0] = gru04(net[0], inp[0], motion,
                               interp_bilinear_align(net[1], net[0].shape[1:3]))
            else:
                net[0] = gru04(net[0], inp[0], motion)

        if not update:
            return tuple(net)

        delta_disp = FlowHead(256, 1, self.dtype, name="disp_head")(net[0])
        # mask_feat feeds only the spx upsample (update.py:117-119), which in
        # test mode runs only on the FINAL iteration — cond-skip it elsewhere
        # (raw params keep nn.Conv's tree; mask_pred=None = always-on, train)
        mk, mb = _ConvParams(32, net[0].shape[-1], 3, name="mask_feat_4_0")()

        def _mask_feat(h):
            m = jax.lax.conv_general_dilated(
                h.astype(self.dtype), mk.astype(self.dtype), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return nn.relu(m + mb.astype(self.dtype))

        if mask_pred is None:
            mask_feat_4 = _mask_feat(net[0])
        else:
            mask_feat_4 = jax.lax.cond(
                mask_pred, _mask_feat,
                lambda h: jnp.zeros(h.shape[:3] + (32,), self.dtype), net[0]
            )
        return tuple(net), mask_feat_4, delta_disp
