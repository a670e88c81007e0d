"""The DKT teacher–student fine-tuning step, fully jitted.

One compiled function per step reproduces tools/ft_dkt.py:177-248:
  1. EMA teacher ← lerp(EMA, student) (:179-181, before the forwards),
  2. frozen teacher + EMA teacher predict pseudo-labels on the *clean* image
     pair at ``teacher_iters``, test mode, no grad (:191-201),
  3. F&E on GT (withprob + clamp) and on PL (plain) (:204-210),
  4. student forward on the augmented pair at ``train_iters`` (:223),
  5. loss = loss_GT + pl_weight·loss_PL (:227-234), grads, global-norm clip,
     AdamW + OneCycle step (:242-248).

The reference's "``loss is None`` → skip step" guard (:235-237, and the
NaN/Inf early-returns in the loss) becomes a jit-safe ``ok`` flag: when not
ok, the parameter/optimizer updates are discarded wholesale, which leaves the
state exactly as the reference's ``continue`` would.

Data parallelism: this function is pure; jit it with sharded batch inputs
(see parallel/mesh.py) and XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from dkt_stereo_tpu.dkt.ema import ema_update
from dkt_stereo_tpu.dkt.fande import fande_ensemble, fande_filter
from dkt_stereo_tpu.losses.sequence import sequence_loss_raft
from dkt_stereo_tpu.models.raft_stereo import RAFTStereo
from dkt_stereo_tpu.train.state import (
    DKTHyperParams,
    DKTTrainState,
    applied_step_count,
    make_optimizer,
)


def create_dkt_state(
    cfg,
    hyper: DKTHyperParams,
    rng: jax.Array,
    sample_shape: tuple[int, int, int],
    params=None,
    teacher_params=None,
    model_cls=RAFTStereo,
) -> DKTTrainState:
    """Initialize (or adopt restored) params; EMA starts as a copy of the
    student and the frozen teacher defaults to the same weights
    (ft_dkt.py:139-150: student/EMA/teacher all from restore_ckpt)."""
    B, H, W = sample_shape
    model = model_cls(cfg, iters=2, test_mode=False)
    if params is None:
        dummy = jnp.zeros((B, H, W, 3), jnp.float32)
        params = model.init(rng, dummy, dummy)
    if teacher_params is None:
        teacher_params = params
    tx, _ = make_optimizer(hyper)
    # Optimizer state exists only for the trainable 'params' collection:
    # batch_stats are frozen buffers exactly as in the reference, where
    # freeze_bn puts BN in eval mode and the buffers receive no grads
    # (meta_arch/raft_stereo/raft_stereo.py:56-59, tools/ft_dkt.py:155-167).
    return DKTTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=params,
        teacher_params=teacher_params,
        opt_state=tx.init(params["params"]),
    )


def _cascade_upsample2x(out: dict) -> dict:
    """Nearest ×2 upsample (+×2 disparity-valued fields) of a model's train
    outputs — the cascade dw2 transform the reference applies to
    ``results_dw2['disp_preds']`` (ft_dkt.py:217-219), extended to every
    registered model's output contract so the adapter losses see full-res
    shapes: ``disp_preds``/``init_disp`` (RAFT/IGEV/GWC/CGI) and PCVNet's
    ``output_list`` (μ/σ scale with disparity, mixture weights don't)."""

    def up(t, ax):
        return jnp.repeat(jnp.repeat(t, 2, axis=ax), 2, axis=ax + 1)

    out = dict(out)
    if "disp_preds" in out:
        t = out["disp_preds"]
        out["disp_preds"] = 2.0 * up(t, t.ndim - 2)
    if "init_disp" in out:
        t = out["init_disp"]
        out["init_disp"] = 2.0 * up(t, t.ndim - 2)
    if "output_list" in out:
        refined, disp_seq, mu, w, sigma = out["output_list"]
        out["output_list"] = (
            2.0 * up(refined, 1),
            2.0 * up(disp_seq, 2),
            2.0 * up(mu, 2),
            up(w, 2),
            2.0 * up(sigma, 2),
        )
    return out


def make_dkt_train_step(
    cfg,
    hyper: DKTHyperParams,
    model_cls=RAFTStereo,
    loss_adapter=None,
):
    """Returns jitted ``step_fn(state, batch, key) -> (state, metrics)``.

    Model-generic like the reference loop (tools/ft_dkt.py:117-118 builds the
    model and loss from the registry): pass any registered ``model_cls`` and
    a ``loss_adapter(outputs, gt, valid)`` (see models.registry.make_loss_adapter);
    defaults reproduce the RAFT-Stereo configuration.

    ``batch``: dict with img1/img2/img1_clean/img2_clean (B,H,W,3 in [0,255]),
    flow (B,H,W, negative disparity), valid (B,H,W in {0,1})."""
    if loss_adapter is None:
        loss_adapter = lambda out, gt, v: sequence_loss_raft(out["disp_preds"], gt, v)
    student = model_cls(cfg, iters=hyper.train_iters, test_mode=False)
    teacher_cfg = cfg
    if hyper.batched_teachers and getattr(cfg, "pallas_encoder", False):
        # The vmapped dual-teacher forward composes with the Pallas corr
        # kernels (their operands carry the teacher axis at dim 0, which
        # Mosaic lowers as a squeezed grid dim) but NOT with the fused w2d
        # encoder: its (B, Hp, Wcp, C2) stream gets the vmap axis inserted
        # second-to-last, where Mosaic's (8, 128) tiling rule rejects a
        # squeezed block. The teachers therefore run the XLA encoder —
        # perf-neutral at training crops (docs/PERF.md round 4: the fused
        # encoder's value is full-resolution work, and the teacher batch is
        # already amortized by the vmap); the param tree is identical.
        import dataclasses as _dc

        teacher_cfg = _dc.replace(cfg, pallas_encoder=False)
    teacher = model_cls(teacher_cfg, iters=hyper.teacher_iters, test_mode=True)
    tx, schedule = make_optimizer(hyper)

    def step_fn(state: DKTTrainState, batch: dict, key: jax.Array):
        k_fgt, k_egt, k_fpl, k_epl, k_mix_h, k_mix = jax.random.split(key, 6)

        # 1. EMA update (pre-forward, ft_dkt.py:179)
        ema_params = ema_update(state.ema_params, state.params, hyper.ema_decay)

        # 2. teacher pseudo-labels on clean images (no grad). The reference
        # issues two sequential forwards only because DataParallel forces
        # python-level calls (ft_dkt.py:193-199); with batched_teachers the
        # frozen and EMA teachers run as ONE vmapped program over their
        # stacked param trees — one compile, and the latency-bound
        # small-spatial GRU convs are amortized across both teachers
        # (grouped-conv lowering; identical math up to float reassociation).
        if hyper.batched_teachers:
            stacked = jax.tree_util.tree_map(
                lambda a, b: jnp.stack([a, b]), state.teacher_params, ema_params
            )
            disp_both = jax.vmap(
                lambda p: teacher.apply(p, batch["img1_clean"], batch["img2_clean"])[1]
            )(stacked)
            disp_pl, disp_ema = disp_both[0], disp_both[1]
        else:
            _, disp_pl = teacher.apply(
                state.teacher_params, batch["img1_clean"], batch["img2_clean"]
            )
            _, disp_ema = teacher.apply(ema_params, batch["img1_clean"], batch["img2_clean"])
        disp_pl = jax.lax.stop_gradient(disp_pl)
        disp_ema = jax.lax.stop_gradient(disp_ema)
        valid_pl = jnp.ones_like(disp_pl)

        # 3. F&E
        disp_gt, valid_gt = batch["flow"], batch["valid"]
        gt_aug, valid_gt_aug = fande_filter(
            disp_gt, disp_ema, valid_gt, k_fgt, withprob=True, threshold=hyper.tau_gt
        )
        gt_aug = fande_ensemble(
            gt_aug, disp_ema, valid_gt_aug, k_egt, clamp=hyper.clamp, threshold=hyper.tau_gt
        )
        pl_aug, valid_pl_aug = fande_filter(
            disp_pl, disp_ema, valid_pl, k_fpl, withprob=False, threshold=hyper.tau_pl
        )
        pl_aug = fande_ensemble(
            pl_aug, disp_ema, valid_pl_aug, k_epl, clamp=False, threshold=hyper.tau_pl
        )

        # 4./5. student forward + combined loss. Grads are taken over the
        # trainable 'params' collection ONLY; every other collection
        # (batch_stats, …) is a frozen buffer that the optimizer never
        # touches — the jit-level equivalent of the reference's freeze_bn
        # eval-mode buffers (tools/ft_dkt.py:155-167).
        frozen = {k: v for k, v in state.params.items() if k != "params"}

        def loss_fn(trainable):
            params = {"params": trainable, **frozen}
            flow_init = None
            loss_dw2_gt = loss_dw2_pl = 0.0
            ok_dw2 = jnp.asarray(True)
            if hyper.cascade_train:
                # cascade pre-pass at half resolution (ft_dkt.py:213-219).
                # NB the reference's cascade_train is dead code — its models
                # reject the ``cascade`` kwarg and results_dw2['delta'] does
                # not exist; this implements the intended semantics: coarse
                # init from the half-res pass + 0.5-weighted half-res losses
                # computed by the MODEL'S OWN loss on its ×2-upsampled
                # outputs (ft_dkt.py:230-233 applies loss_func to
                # results_dw2, not a hardcoded RAFT loss).
                i1h = batch["img1"][:, ::2, ::2]
                i2h = batch["img2"][:, ::2, ::2]
                out_h = student.apply(params, i1h, i2h, rngs={"mix": k_mix_h})
                preds_h = out_h["disp_preds"]  # (N, B, H/2, W/2) half-res units
                # init for the full-res 1/4 grid: spatial ::2, values /2
                flow_init = jax.lax.stop_gradient(preds_h[-1][:, ::2, ::2] / 2.0)[..., None]
                out_h_up = _cascade_upsample2x(out_h)
                loss_dw2_gt, _, _, ok_dg = loss_adapter(out_h_up, gt_aug, valid_gt_aug)
                loss_dw2_pl, _, _, ok_dp = loss_adapter(out_h_up, pl_aug, valid_pl_aug)
                # the dw2 ok flags MUST gate the update too: a NaN in the
                # half-res pass would otherwise reach the shared params
                # through the dw2 loss despite the full-res ok being True
                ok_dw2 = ok_dg & ok_dp

            # 'mix' rng: the mix_fmap_image corr mode draws one blend weight
            # per forward (raft_stereo/corr.py:225-228); without an rng the
            # model silently degenerates to a constant 0.5 blend
            out = student.apply(
                params, batch["img1"], batch["img2"], flow_init, rngs={"mix": k_mix}
            )
            loss_gt, metrics, _, ok_gt = loss_adapter(out, gt_aug, valid_gt_aug)
            loss_pl, _, _, ok_pl = loss_adapter(out, pl_aug, valid_pl_aug)
            loss_gt = loss_gt + 0.5 * loss_dw2_gt  # (:229-233)
            loss_pl = loss_pl + 0.5 * loss_dw2_pl
            loss = loss_gt + hyper.pl_weight * loss_pl
            return loss, (metrics, ok_gt & ok_pl & ok_dw2, loss_gt, loss_pl)

        (loss, (metrics, ok, loss_gt, loss_pl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params["params"])

        updates, opt_state = tx.update(grads, state.opt_state, state.params["params"])
        new_trainable = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params["params"], updates
        )
        new_params = {"params": new_trainable, **frozen}

        def pick(new, old):
            return jax.tree_util.tree_map(lambda a, b: jnp.where(ok, a, b), new, old)

        new_params = pick(new_params, state.params)
        opt_state = pick(opt_state, state.opt_state)

        def _l2_dist(a, b):
            # global L2 distance over trainable params — the EMA/teacher
            # divergence curves (how far the student has moved from its
            # slow copy and from the frozen stage-2 teacher); costs one
            # tree-reduce, negligible next to the step
            sq = jax.tree_util.tree_map(
                lambda x, y: jnp.sum((x.astype(jnp.float32) - y.astype(jnp.float32)) ** 2),
                a, b,
            )
            return jnp.sqrt(sum(jax.tree_util.tree_leaves(sq)))

        metrics = dict(metrics)
        metrics.update(
            loss=loss,
            loss_GT=loss_gt,
            loss_PL=loss_pl,
            ema_divergence=_l2_dist(new_params["params"], ema_params["params"]),
            teacher_divergence=_l2_dist(
                new_params["params"], state.teacher_params["params"]
            ),
            ok=ok.astype(jnp.float32),
            # schedule position from the optimizer state, NOT state.step:
            # skipped (ok=False) steps revert opt_state, so the logged LR
            # would otherwise drift ahead of the applied LR
            learning_rate=schedule(applied_step_count(state.opt_state)),
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            ema_params=ema_params,
            opt_state=opt_state,
        )
        return new_state, metrics

    return jax.jit(step_fn)
