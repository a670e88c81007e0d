"""PCVNet (parameterized cost volume network), TPU-native.

Rebuild of meta_arch/pcvnet/model.py:26-196: shared dual-input backbone with
low-frequency head, Gaussian-parameterized correlation lookup, FDM ConvGRU
updates with closed-form μ/σ/w parameter updates, uncertainty-aware
refinement, and cascade (half→full resolution) support.

Sign convention: the reference's PCVNet operates on POSITIVE disparities end
to end, yet the shared eval/DKT drivers compare against negative-flow GT — a
latent inconsistency in the reference (its validate_* masks ``gt < 0`` would
discard everything). This port keeps the internal math positive and negates
at the API boundary so PCVNet plugs into the same harness as the other
models (documented divergence).

Refinement trigger: the reference refines when ``itr == valid_iters-1``
(model.py:157) which leaves ``refined_disp`` undefined when
``iters < valid_iters`` (a crash in train mode). Here refinement always runs
after the final iteration — identical when iters == valid_iters.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from dkt_stereo_tpu.nn.blocks import ResidualBlock, conv
from dkt_stereo_tpu.nn.pcv import (
    BasicMultiUpdateBlockPCV,
    PCVMultiBasicEncoder,
    RefineNet,
    gaussian_corr_lookup,
)
from dkt_stereo_tpu.ops.corr import corr_pyramid_fused
from dkt_stereo_tpu.ops.resize import interp_bilinear_align, interp_nearest
from dkt_stereo_tpu.ops.upsample import convex_upsample


@dataclasses.dataclass(frozen=True)
class PCVNetConfig:
    """configs/pcvnet/base.json (fast.json differs only in n_downsample=3)."""

    corr_levels: int = 3
    corr_radius: int = 4
    n_downsample: int = 2
    context_norm: str = "batch"
    slow_fast_gru: bool = True
    n_gru_layers: int = 3
    hidden_dims: Tuple[int, ...] = (128, 128, 128, 128)
    gauss_num: int = 4
    sample_num: int = 9
    init_sigma: float = 32.0
    init_mu: Tuple[float, ...] = (0.0, 64.0, 128.0, 192.0)
    mixed_precision: bool = True
    valid_iters: int = 32
    # "reg" = XLA gather lookup; "reg_cuda"/"pallas" = fused Pallas sampler
    corr_implementation: str = "reg"
    # volume storage under mixed precision; "float32" = strict reference AMP
    # parity (the reference computes correlation fp32 outside autocast)
    corr_dtype: str = "bfloat16"
    # TPU extension: jax.checkpoint each FDM iteration (activation memory
    # O(1) in iters; numerics identical — tests/test_remat.py)
    remat_iters: bool = False

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.mixed_precision else jnp.float32

    @property
    def compress_factor(self):
        return 4 if self.n_downsample == 2 else 2

    @classmethod
    def from_dict(cls, d: dict) -> "PCVNetConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: tuple(v) if isinstance(v, list) else v for k, v in d.items() if k in known}
        return cls(**kw)


class _PCVIterStep(nn.Module):
    cfg: PCVNetConfig
    collect_up: bool = True  # train mode: emit per-iteration upsampled outputs

    @nn.compact
    def __call__(self, carry, consts, is_last):
        cfg = self.cfg
        net, coords1, sigma, w, _ = carry
        pyramid, inp, coords0 = consts

        coords1 = jax.lax.stop_gradient(coords1)
        sigma_d = jax.lax.stop_gradient(sigma)
        w_d = jax.lax.stop_gradient(w)
        # NB sigma enters the lookup UNdetached (model.py:121-122 detaches
        # only coords1); its gradient flows through the sample positions
        if cfg.corr_implementation in ("reg_cuda", "alt_cuda", "pallas"):
            from dkt_stereo_tpu.nn.pcv import gaussian_corr_lookup_pallas

            corr = gaussian_corr_lookup_pallas(
                tuple(pyramid), coords1, sigma, cfg.sample_num, cfg.compress_factor,
                interpret=jax.default_backend() == "cpu",
            )
        else:
            corr = gaussian_corr_lookup(
                list(pyramid), coords1, sigma, cfg.sample_num, cfg.compress_factor
            )
        mu = jax.lax.stop_gradient(coords0 - coords1)

        fdm = BasicMultiUpdateBlockPCV(
            cfg.n_gru_layers, cfg.n_downsample, cfg.hidden_dims,
            cfg.gauss_num, cfg.sample_num, cfg.corr_levels,
            cfg.compute_dtype, name="FDM",
        )
        mfl = None
        if cfg.n_gru_layers >= 3 and cfg.slow_fast_gru:
            net, mfl = fdm(net, inp, corr, mu, w=w_d, sigma=sigma_d,
                           iter16=True, iter08=False, iter04=False, update=False)
        if cfg.n_gru_layers >= 2 and cfg.slow_fast_gru:
            net, mfl = fdm(net, inp, corr, mu, w=w_d, sigma=sigma_d,
                           iter16=cfg.n_gru_layers >= 3, iter08=True, iter04=False,
                           update=False, motion_features_list=mfl)
        net, up_mask, mu, sigma, w = fdm(
            net, inp, corr, mu=mu, w=w_d, sigma=sigma_d,
            iter16=cfg.n_gru_layers >= 3, iter08=cfg.n_gru_layers >= 2, iter04=True,
            motion_features_list=mfl,
            # test mode: only the final iteration's mask feeds the refinement
            # upsample (model.py:156-162) — skip the head on the others
            mask_pred=None if self.collect_up else is_last,
        )
        coords1 = coords0 - mu
        new_carry = (net, coords1, sigma, w, up_mask)

        if not self.collect_up:
            # test mode: per-iteration outputs are never consumed — the
            # refinement runs off the FINAL carry (model.py:156-162); the
            # four full-resolution convex upsamples (~13ch ×9 taps ×iters of
            # HBM writes) are recomputed once post-scan.
            return new_carry, jnp.zeros((), jnp.float32)

        disp = jnp.sum(w * mu, axis=-1, keepdims=True)  # (B,H,W,1)
        factor = 2**cfg.n_downsample
        mask32 = up_mask.astype(jnp.float32)
        mask_det = jax.lax.stop_gradient(mask32)
        disp_up = convex_upsample(disp, mask32, factor)[..., 0]
        mu_up = convex_upsample(mu, mask_det, factor)
        sigma_up = convex_upsample(sigma, mask_det, factor)
        w_up = convex_upsample(w, mask_det, factor, scale=False)

        ys = (disp_up, mu_up, w_up, sigma_up)
        return new_carry, ys


class PCVNet(nn.Module):
    """train: {"disp_preds": (1,B,H,W) refined (negative), "output_list":
    (refined_up, disp_seq, mu_seq, w_seq, sigma_seq) positive};
    test: (None, −refined_up). ``cascade=True`` adds init_params."""

    cfg: PCVNetConfig
    iters: int = 12
    test_mode: bool = False
    cascade: bool = False

    @nn.compact
    def __call__(self, image1, image2, flow_init=None, init_param: Optional[dict] = None):
        cfg = self.cfg
        dt = cfg.compute_dtype
        G = cfg.gauss_num
        factor = 2**cfg.n_downsample

        x1 = (2.0 * (image1 / 255.0) - 1.0).astype(dt)
        x2 = (2.0 * (image2 / 255.0) - 1.0).astype(dt)

        cnet = PCVMultiBasicEncoder(
            (tuple(cfg.hidden_dims), tuple(cfg.hidden_dims)),
            cfg.context_norm, cfg.n_downsample, cfg.n_gru_layers, True, dt, name="cnet",
        )
        *cnet_list, xfeat, low_f = cnet(jnp.concatenate([x1, x2], axis=0), dual_inp=True)
        xfeat = ResidualBlock(128, 128, "instance", 1, dtype=dt, name="conv2_res")(xfeat)
        xfeat = conv(256, 3, 1, 1, dt, name="conv2_out")(xfeat)
        fmap1, fmap2 = jnp.split(xfeat, 2, axis=0)

        net = tuple(jnp.tanh(o[0]) for o in cnet_list)
        inp = []
        for i, o in enumerate(cnet_list[: cfg.n_gru_layers]):
            z = conv(cfg.hidden_dims[i] * 3, 3, 1, 1, dt, name=f"context_zqr_convs_{i}")(nn.relu(o[1]))
            inp.append(tuple(jnp.split(z, 3, axis=-1)))
        inp = tuple(inp)

        # AMP boundary: bf16 features/volume only under mixed precision —
        # the reference's eval protocol runs the correlation fp32
        # (evaluate_stereo.py:380), and a bf16 volume at O(50) magnitudes
        # costs ~0.25 absolute per entry. corr_dtype="float32" opts into
        # strict fp32 correlation under AMP as well (the reference trains
        # its correlation fp32 outside autocast, pcvnet/model.py:92).
        corr_dt = (
            jnp.bfloat16
            if (cfg.mixed_precision and cfg.corr_dtype == "bfloat16")
            else jnp.float32
        )
        fmap1 = fmap1.astype(corr_dt)
        fmap2 = fmap2.astype(corr_dt)
        # pyramid levels built directly as f1 @ pooled(f2): exact (pooling is
        # linear in fmap2) and skips the volume-pool relayouts — see
        # ops/corr.py::corr_pyramid_fused
        pyramid = tuple(
            corr_pyramid_fused(
                fmap1,
                fmap2,
                cfg.corr_levels,
                out_dtype=corr_dt,
                pool_factor=cfg.compress_factor,
            )
        )

        B, Hc, Wc, _ = fmap1.shape
        gridx = jnp.broadcast_to(
            jnp.arange(Wc, dtype=jnp.float32)[None, None, :, None], (B, Hc, Wc, G)
        )
        coords0 = gridx
        if init_param is not None:
            # cascade second stage (model.py:99-108)
            f_sc = Wc / init_param["mu"].shape[2]
            mu0 = f_sc * interp_bilinear_align(init_param["mu"], (Hc, Wc))
            sigma = f_sc * interp_bilinear_align(init_param["sigma"], (Hc, Wc))
            w = interp_nearest(init_param["w"], (Hc, Wc))
            coords1 = coords0 - mu0
        else:
            start = jnp.asarray(cfg.init_mu, jnp.float32) / factor
            coords1 = gridx - start
            sigma = jnp.full((B, Hc, Wc, G), cfg.init_sigma / factor, jnp.float32)
            w = jnp.full((B, Hc, Wc, G), 1.0 / G, jnp.float32)

        step_cls = (
            nn.remat(_PCVIterStep, prevent_cse=False) if cfg.remat_iters else _PCVIterStep
        )
        Scan = nn.scan(
            step_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, 0),
            out_axes=0,
            length=self.iters,
        )
        step = Scan(cfg, collect_up=not self.test_mode, name="step")
        mask0 = jnp.zeros((B, Hc, Wc, factor**2 * 9), dt)
        is_last = jnp.arange(self.iters) == self.iters - 1
        (net, coords1, sigma, w, up_mask), ys = step(
            (net, coords1, sigma, w, mask0), (pyramid, inp, coords0), is_last
        )
        if not self.test_mode:
            disp_seq, mu_seq, w_seq, sigma_seq = ys

        # final-state refinement (model.py:156-162)
        mu = coords0 - coords1
        disp = jnp.sum(w * mu, axis=-1, keepdims=True)
        refined = RefineNet(G, dt, name="refineNet")(
            jax.lax.stop_gradient(w).astype(dt),
            jax.lax.stop_gradient(sigma).astype(dt),
            jax.lax.stop_gradient(mu).astype(dt),
            jax.lax.stop_gradient(disp).astype(dt),
            low_f,
        ).astype(jnp.float32)
        mask_det = jax.lax.stop_gradient(up_mask.astype(jnp.float32))
        refined_up = convex_upsample(refined, mask_det, factor)[..., 0]  # (B,H,W) positive

        if self.cascade:
            if self.test_mode:
                # recompute the final iteration's upsampled parameters from
                # the carry (identical to disp_seq[-1] etc.: the carry holds
                # the same final mu/sigma/w/up_mask the last ys entry used)
                return {
                    "disp": convex_upsample(disp, mask_det, factor),
                    "sigma": convex_upsample(sigma.astype(jnp.float32), mask_det, factor),
                    "mu": convex_upsample(mu, mask_det, factor),
                    "w": convex_upsample(w.astype(jnp.float32), mask_det, factor, scale=False),
                }
            init_params = {
                "disp": disp_seq[-1][..., None],
                "sigma": sigma_seq[-1],
                "mu": mu_seq[-1],
                "w": w_seq[-1],
            }
            return {
                "disp_preds": -refined_up[None],
                "output_list": (refined_up, disp_seq, mu_seq, w_seq, sigma_seq),
                "init_params": init_params,
            }
        if self.test_mode:
            return None, -refined_up
        return {
            "disp_preds": -refined_up[None],
            "output_list": (refined_up, disp_seq, mu_seq, w_seq, sigma_seq),
        }
