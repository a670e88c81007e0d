"""RAFT-Stereo, TPU-native.

Rebuild of meta_arch/raft_stereo/raft_stereo.py:30-187 as a Flax module whose
iterative refinement loop is an ``nn.scan`` (single compiled step, parameters
broadcast) instead of a Python loop.

Design deltas vs the reference (all behavior-preserving):
  - NHWC layout; disparity tracked as a single x-coordinate channel. The
    reference carries a 2-channel (x, y) flow and zeroes the vertical delta
    every iteration (raft_stereo.py:164); here only x exists. The motion
    encoder and flow head keep their 2-channel flow interface (zeros appended)
    so reference checkpoints import without shape surgery.
  - ``coords1.detach()`` per iteration (:153) → ``stop_gradient`` in the step.
  - train mode emits the per-iteration upsampled disparities as a stacked
    (iters, B, H, W) array (scan ys) rather than a Python list.
  - mixed precision: encoders/GRUs in ``dtype`` (bf16 under the reference's
    autocast policy, :95,156), correlation volume/lookup and convex
    upsampling always fp32 (:116, :177 outside autocast).

Outputs keep the reference's negative-disparity "flow" convention
(core/stereo_datasets.py:136).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from dkt_stereo_tpu.nn.blocks import BasicEncoder, MultiBasicEncoder, ResidualBlock, conv
from dkt_stereo_tpu.nn.gru import BasicMultiUpdateBlock
from dkt_stereo_tpu.ops.corr import (
    corr_lookup,
    corr_lookup_alt,
    corr_pyramid,
    corr_pyramid_fused,
    corr_volume,
    fmap_pyramid,
)
from dkt_stereo_tpu.ops.pallas.corr_alt import corr_lookup_alt_pallas
from dkt_stereo_tpu.ops.pallas.corr_lookup import corr_lookup_pallas
from dkt_stereo_tpu.ops.resize import interp_bilinear_align
from dkt_stereo_tpu.ops.sampler import coords_grid_x
from dkt_stereo_tpu.ops.upsample import convex_upsample


@dataclasses.dataclass(frozen=True)
class RAFTStereoConfig:
    """Field names/defaults follow configs/raft_stereo/base.json + CLI defaults
    (tools/ft_dkt.py:312-344)."""

    backbone_type: str = "default"  # "default" | "interpolate"
    # "reg" (XLA, materialized) | "cosine" | "alt" (XLA, recompute) |
    # "reg_cuda" (Pallas, materialized volume) | "alt_cuda" (Pallas, fused
    # build+lookup, volume never in HBM). alt/alt_cuda == reg numerically.
    corr_implementation: str = "reg"
    shared_backbone: bool = False
    corr_levels: int = 4
    corr_radius: int = 4
    n_downsample: int = 2
    context_norm: str = "batch"
    slow_fast_gru: bool = False
    n_gru_layers: int = 3
    hidden_dims: Tuple[int, ...] = (128, 128, 128)
    mixed_precision: bool = True
    # refinement iterations fused per scan step (params shared, numerics
    # identical); amortizes while-loop carry overhead. iters must divide.
    scan_unroll: int = 1
    # TPU extension (not in the reference config): dtype of the stored
    # correlation pyramid. "bfloat16" halves volume HBM traffic (lookup
    # interpolation stays fp32); "float32" gives exact reference parity.
    corr_dtype: str = "bfloat16"
    # TPU extension: subsampled instance-norm statistics in the feature
    # encoder (perf mode; ~1e-3 relative feature drift). False = exact.
    fast_in_stats: bool = False
    # TPU extension: run the encoders' full-resolution section as the fused
    # Pallas w2d kernel chain (ops/pallas/encoder_conv.py). Trainable since
    # round 4 (encoder_stage_ad custom VJP, pinned against XLA autodiff in
    # tests/test_pallas_encoder.py) — applies to the instance-norm fnet in
    # both modes; cnet's train-mode BatchNorm keeps the XLA path (the fused
    # chain only folds *static* affines). Exact instance-norm statistics;
    # numerics match the XLA path to bf16 accumulation order.
    pallas_encoder: bool = False
    # TPU extension: rematerialize (jax.checkpoint) each refinement
    # iteration in the backward pass. Activation memory of the training
    # step drops from O(iters) to O(1) step activations at the cost of one
    # extra forward per iteration — the idiomatic HBM-for-FLOPs trade for
    # long unrolls / large crops. Numerics identical (pinned by
    # tests/test_remat.py).
    remat_iters: bool = False

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.mixed_precision else jnp.float32

    @classmethod
    def from_dict(cls, d: dict) -> "RAFTStereoConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: tuple(v) if isinstance(v, list) else v for k, v in d.items() if k in known}
        return cls(**kw)


class _IterStep(nn.Module):
    """One refinement iteration; scanned with params broadcast."""

    cfg: RAFTStereoConfig
    collect_up: bool  # train mode: emit upsampled disp each step

    @nn.compact
    def __call__(self, carry, consts, is_last):
        # ``is_last``: (unroll,) flags. Running ``unroll`` refinement
        # iterations per scan step (same submodule → shared params, identical
        # numerics) amortizes the while-loop/carry bookkeeping overhead —
        # ~1 ms/iter at 736×1280 (docs/PERF.md).
        cfg = self.cfg
        block = BasicMultiUpdateBlock(
            cfg.n_gru_layers, cfg.n_downsample, cfg.hidden_dims,
            cfg.compute_dtype, name="update_block",
        )
        ys = []
        for j in range(is_last.shape[0]):
            carry, y = self._one_iter(block, carry, consts, is_last[j])
            ys.append(y)
        return carry, jnp.stack(ys)

    def _one_iter(self, block, carry, consts, is_last):
        cfg = self.cfg
        net, coords1x, _ = carry
        pyramid, inp, coords0x, fmap1 = consts
        dt = cfg.compute_dtype

        coords1x = jax.lax.stop_gradient(coords1x)
        if cfg.corr_implementation in ("reg_cuda", "pallas"):
            # fused Pallas kernel (TPU analogue of the reference's CUDA
            # corr_sampler, core/corr.py:17-29); interpret-mode off-TPU
            interpret = jax.default_backend() == "cpu"
            corr = corr_lookup_pallas(tuple(pyramid), coords1x, cfg.corr_radius, interpret)
        elif cfg.corr_implementation == "alt_cuda":
            # fused build+lookup: the W×W₂ volume never exists in HBM (the
            # reference's alt_cuda_corr memory contract, core/corr.py:212-241);
            # here `pyramid` holds the transposed pooled right features
            interpret = jax.default_backend() == "cpu"
            corr = corr_lookup_alt_pallas(
                fmap1, tuple(pyramid), coords1x, cfg.corr_radius, interpret
            )
        elif cfg.corr_implementation == "alt":
            # memory-efficient: recompute from the pooled feature pyramid
            corr = corr_lookup_alt(fmap1, list(pyramid), coords1x, cfg.corr_radius)
        else:
            corr = corr_lookup(list(pyramid), coords1x, cfg.corr_radius)
        flow_x = coords1x - coords0x
        flow2 = jnp.concatenate([flow_x, jnp.zeros_like(flow_x)], axis=-1)

        if cfg.n_gru_layers == 3 and cfg.slow_fast_gru:
            net = block(net, inp, iter32=True, iter16=False, iter08=False, update=False)
        if cfg.n_gru_layers >= 2 and cfg.slow_fast_gru:
            net = block(
                net,
                inp,
                iter32=cfg.n_gru_layers == 3,
                iter16=True,
                iter08=False,
                update=False,
            )
        net, up_mask, delta = block(
            net,
            inp,
            corr.astype(dt),
            flow2.astype(dt),
            iter32=cfg.n_gru_layers == 3,
            iter16=cfg.n_gru_layers >= 2,
            # test mode: only the final iteration's mask is consumed
            # (raft_stereo.py:168-177) — skip the head on the others
            mask_pred=None if self.collect_up else is_last,
        )
        # stereo: epipolar projection — only the x component of delta survives
        coords1x = coords1x + delta[..., 0:1].astype(jnp.float32)

        # exact banded eval (no-op otherwise): refresh the carried state's
        # halo rows every iteration so GRU contamination never accumulates
        # across the 32-iteration loop (nn/norms.py::band_refresh)
        from dkt_stereo_tpu.nn.norms import band_refresh

        net = tuple(band_refresh(h) for h in net)
        coords1x = band_refresh(coords1x)

        new_carry = (net, coords1x, up_mask)
        if self.collect_up:
            disp_up = convex_upsample(
                coords1x - coords0x, up_mask.astype(jnp.float32), 2**cfg.n_downsample
            )
            return new_carry, disp_up[..., 0]
        # test mode: nothing to collect (mask travels in the carry; only the
        # final iteration's mask is needed, raft_stereo.py:170-177)
        return new_carry, jnp.zeros((), jnp.float32)


class RAFTStereo(nn.Module):
    """Forward: (image1, image2 in [0,255] NHWC) → disparity-as-negative-flow.

    train mode: {"disp_preds": (iters, B, H, W)} — per-iteration upsampled.
    test mode:  (coarse_flow (B,H/f,W/f,1), disp_up (B, H, W)).
    """

    cfg: RAFTStereoConfig
    iters: int = 12
    test_mode: bool = False

    @nn.compact
    def __call__(self, image1, image2, flow_init: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        dt = cfg.compute_dtype
        factor = 2**cfg.n_downsample

        x1 = (2.0 * (image1 / 255.0) - 1.0).astype(dt)
        x2 = (2.0 * (image2 / 255.0) - 1.0).astype(dt)

        cnet = MultiBasicEncoder(
            output_dim=(tuple(cfg.hidden_dims), tuple(cfg.hidden_dims)),
            norm_fn=cfg.context_norm,
            downsample=cfg.n_downsample,
            num_layers=cfg.n_gru_layers,
            dtype=dt,
            name="cnet",
            fused_fullres=cfg.pallas_encoder,
        )

        if cfg.backbone_type == "default":
            if cfg.shared_backbone:
                *cnet_list, x = cnet(jnp.concatenate([x1, x2], axis=0), dual_inp=True)
                x = ResidualBlock(128, 128, "instance", 1, dtype=dt, name="conv2_res")(x)
                x = conv(256, 3, 1, 1, dt, name="conv2_out")(x)
                fmap1, fmap2 = jnp.split(x, 2, axis=0)
            else:
                cnet_list = cnet(x1)
                fnet_norm = "instance_fast" if cfg.fast_in_stats else "instance"
                fnet = BasicEncoder(
                    256, fnet_norm, cfg.n_downsample, dtype=dt, name="fnet",
                    fused_fullres=cfg.pallas_encoder,
                )
                fmap = fnet(jnp.concatenate([x1, x2], axis=0))
                fmap1, fmap2 = jnp.split(fmap, 2, axis=0)
        elif cfg.backbone_type == "interpolate":
            cnet_list = cnet(x1)
            _, H, W, _ = x1.shape
            fmap1 = interp_bilinear_align(x1, (H // factor, W // factor))
            fmap2 = interp_bilinear_align(x2, (H // factor, W // factor))
        else:
            raise ValueError(cfg.backbone_type)

        net = tuple(jnp.tanh(o[0]) for o in cnet_list)
        inp_raw = [nn.relu(o[1]) for o in cnet_list]
        # precompute the GRU context biases once (raft_stereo.py:113-114)
        inp = []
        for i, feat in enumerate(inp_raw[: cfg.n_gru_layers]):
            z = conv(cfg.hidden_dims[i] * 3, 3, 1, 1, dt, name=f"context_zqr_convs_{i}")(feat)
            inp.append(tuple(jnp.split(z, 3, axis=-1)))
        inp = tuple(inp)

        # AMP boundary: bf16 volume storage is a TPU perf choice (halves the
        # HBM/VMEM pyramid traffic; measured ~2e-7 relative effect on eval
        # EPE) that only applies under mixed precision — with AMP off (the
        # reference eval protocol, evaluate_stereo.py:376-380) correlation
        # is exactly fp32; corr_dtype="float32" forces fp32 under AMP too
        corr_dt = (
            jnp.bfloat16
            if (cfg.mixed_precision and cfg.corr_dtype == "bfloat16")
            else jnp.float32
        )
        fmap1 = fmap1.astype(corr_dt)
        fmap2 = fmap2.astype(corr_dt)
        cosine = cfg.corr_implementation in ("cosine", "mix_fmap_image")
        if cfg.corr_implementation == "alt":
            # no volume materialization: the scan recomputes correlations
            # on the fly from the pooled right-feature pyramid
            pyramid = tuple(fmap_pyramid(fmap2.astype(jnp.float32), cfg.corr_levels))
            volume = None
        elif cfg.corr_implementation == "alt_cuda":
            # no-materialization Pallas path: pooled right features,
            # pre-transposed ONCE so every scan iteration's MXU matmul sees a
            # contiguous (D, W2) operand (ops/pallas/corr_alt.py)
            pyramid = tuple(
                jnp.swapaxes(f, -1, -2)
                for f in fmap_pyramid(fmap2, cfg.corr_levels)
            )
            volume = None
        elif cfg.corr_implementation == "mix_fmap_image" and not self.test_mode:
            volume = corr_volume(fmap1, fmap2, normalize=cosine, out_dtype=corr_dt)
        else:
            # materialized modes (reg / reg_cuda / cosine / test-mode mix):
            # build each pyramid level as f1 @ pooled(f2) directly — exact
            # (pooling is linear in fmap2) and skips the volume-pool
            # relayouts (6.1 -> ~1 ms at eval geometry; ops/corr.py)
            pyramid = tuple(
                corr_pyramid_fused(
                    fmap1, fmap2, cfg.corr_levels, normalize=cosine, out_dtype=corr_dt
                )
            )
            volume = None
        if cfg.corr_implementation == "mix_fmap_image" and not self.test_mode:
            # train-time mix of image-level and feature-level cosine volumes
            # with one random blend weight per call (raft_stereo/corr.py:216-228,
            # dispatch raft_stereo.py:133-142); test mode uses features only
            _, H, W, _ = x1.shape
            fi1 = interp_bilinear_align(x1.astype(corr_dt), (H // factor, W // factor))
            fi2 = interp_bilinear_align(x2.astype(corr_dt), (H // factor, W // factor))
            vol_img = corr_volume(fi1, fi2, normalize=True, out_dtype=corr_dt)
            prob = (
                jax.random.uniform(self.make_rng("mix"), ())
                if self.has_rng("mix")
                else jnp.float32(0.5)
            )
            volume = prob * vol_img + (1.0 - prob) * volume
        if volume is not None:
            pyramid = tuple(corr_pyramid(volume, cfg.corr_levels))

        B, Hc, Wc, _ = fmap1.shape
        coords0x = coords_grid_x(B, Hc, Wc)
        coords1x = coords0x if flow_init is None else coords0x + flow_init

        collect = not self.test_mode
        k = cfg.scan_unroll if self.iters % cfg.scan_unroll == 0 else 1
        if k != cfg.scan_unroll:
            import logging

            logging.getLogger(__name__).warning(
                "scan_unroll=%d ignored: iters=%d is not divisible by it "
                "(falling back to unroll=1)", cfg.scan_unroll, self.iters,
            )
        # prevent_cse=False is safe (and faster) under lax.scan
        step_cls = (
            nn.remat(_IterStep, prevent_cse=False) if cfg.remat_iters else _IterStep
        )
        Scan = nn.scan(
            step_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, 0),
            out_axes=0,
            length=self.iters // k,
        )
        step = Scan(cfg, collect, name="step")
        mask0 = jnp.zeros((B, Hc, Wc, factor**2 * 9), cfg.compute_dtype)
        is_last = (jnp.arange(self.iters) == self.iters - 1).reshape(-1, k)
        (net, coords1x, up_mask), ys = step(
            (net, coords1x, mask0),
            (pyramid, inp, coords0x, fmap1.astype(jnp.float32)),
            is_last,
        )
        # (n_steps, k, ...) per-iteration outputs -> (iters, ...)
        ys = ys.reshape(self.iters, *ys.shape[2:])

        if self.test_mode:
            disp_up = convex_upsample(
                coords1x - coords0x, up_mask.astype(jnp.float32), factor
            )[..., 0]
            return coords1x - coords0x, disp_up
        return {"disp_preds": ys}
