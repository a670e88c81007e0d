"""NeRF-Stereo training step: supervised fine-tuning on rendered triplets.

The reference carries every NS ingredient — the ``nerf_stereo`` dataloader
branch (core/stereo_datasets.py:528-533), the bi/tri ``collate_fn``
(:449-480) and ``ns_loss`` (meta_arch/nerf_stereo/loss.py:128-181) — but no
runnable trainer: the collate is commented out of fetch_dataloader (:537)
and ``ns_loss``'s signature is incompatible with ft_dkt.py:227's
``loss_func(results, disp_gt, valid, args=args)`` call. This module is the
intended end-to-end capability, one jitted step:

  student forward on the stacked forward pair (augmented views) →
  RAFT sequence loss on the binocular slice + ns_loss (confidence-weighted
  L1 + trinocular photometric) on the trinocular slice → AdamW + OneCycle.

The bi/tri split is STATIC per batch (data/loader.py::MixedStereoLoader) so
the whole step compiles once — the TPU-native replacement for the ragged
torch collate. The EMA tree keeps updating so an NS-pretrained checkpoint
drops straight into stage-2 DKT fine-tuning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dkt_stereo_tpu.dkt.ema import ema_update
from dkt_stereo_tpu.losses.nerf import ns_loss
from dkt_stereo_tpu.losses.sequence import sequence_loss_raft
from dkt_stereo_tpu.train.state import (
    DKTHyperParams,
    DKTTrainState,
    applied_step_count,
    make_optimizer,
)


def make_ns_train_step(
    cfg,
    hyper: DKTHyperParams,
    model_cls,
    nb: int,
    nt: int,
    conf_threshold: float = 0.5,
    disp_threshold: float = 512.0,
    alpha_photometric: float = 0.1,
    num_hosts: int | None = None,
):
    """Returns jitted ``step_fn(state, batch, key) -> (state, metrics)``.

    ``batch`` follows the collate_mixed contract: ``im1_forward``/
    ``im2_forward`` stacked (per HOST: nb/num_hosts bi rows then nt/num_hosts
    tri rows), ``bi.flow``/``bi.valid``, ``tri.{flow, conf, im0, im1, im2}``.
    ``nb``/``nt`` are the loader's static GLOBAL modality split. The model
    must emit the RAFT output contract (``disp_preds``) — NS training targets
    the RAFT-Stereo family, as in the NeRF-Stereo recipe the reference
    imports.

    Multi-host layout: ``shard_batch``'s make_array_from_process_local_data
    concatenates the hosts' local blocks, so the GLOBAL forward stack is
    ``[h0: nb_l bi, nt_l tri | h1: nb_l bi, nt_l tri | ...]`` — the bi rows
    are NOT a contiguous ``[:nb]`` prefix when ``num_hosts > 1``. The loss
    therefore re-slices predictions per host block (reshape to
    ``(num_hosts, nb_l + nt_l)`` and split), which keeps modality alignment
    with the per-modality target arrays (themselves host-block concatenated
    in the same order)."""
    assert nb + nt > 0 and nt >= 0 and nb >= 0
    if num_hosts is None:
        num_hosts = jax.process_count()
    assert nb % num_hosts == 0 and nt % num_hosts == 0, (nb, nt, num_hosts)
    nb_l, nt_l = nb // num_hosts, nt // num_hosts

    def split_modalities(x):
        """(iters, nb+nt, ...) host-block-interleaved → (bi, tri) stacks."""
        if num_hosts == 1 or nb == 0 or nt == 0:
            return x[:, :nb], x[:, nb:]
        s = x.shape
        xr = x.reshape(s[0], num_hosts, nb_l + nt_l, *s[2:])
        bi = xr[:, :, :nb_l].reshape(s[0], nb, *s[2:])
        tri = xr[:, :, nb_l:].reshape(s[0], nt, *s[2:])
        return bi, tri

    student = model_cls(cfg, iters=hyper.train_iters, test_mode=False)
    tx, schedule = make_optimizer(hyper)

    def step_fn(state: DKTTrainState, batch: dict, key: jax.Array):
        ema_params = ema_update(state.ema_params, state.params, hyper.ema_decay)
        frozen = {k: v for k, v in state.params.items() if k != "params"}

        def loss_fn(trainable):
            params = {"params": trainable, **frozen}
            out = student.apply(
                params, batch["im1_forward"], batch["im2_forward"], rngs={"mix": key}
            )
            preds = out["disp_preds"]  # (N, nb+nt, H, W) host-block order
            preds_bi, preds_tri = split_modalities(preds)
            loss = 0.0
            ok = jnp.asarray(True)
            metrics = {}
            if nb:
                loss_bi, m_bi, _, ok_bi = sequence_loss_raft(
                    preds_bi, batch["bi"]["flow"], batch["bi"]["valid"]
                )
                loss = loss + loss_bi
                ok = ok & ok_bi
                metrics.update({f"bi_{k}": v for k, v in m_bi.items()})
                metrics.update(m_bi)  # overwritten by tri metrics when nt>0
            if nt:
                loss_tri, m_tri, _, ok_tri = ns_loss(
                    preds_tri,
                    batch["tri"]["flow"],
                    batch["tri"]["conf"],
                    batch["tri"]["im0"],
                    batch["tri"]["im1"],
                    batch["tri"]["im2"],
                    alpha_photometric=alpha_photometric,
                    conf_threshold=conf_threshold,
                    max_flow=disp_threshold,
                )
                loss = loss + loss_tri
                ok = ok & ok_tri
                metrics.update(m_tri)
                metrics["ns_loss"] = loss_tri
            return loss, (metrics, ok)

        (loss, (metrics, ok)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params["params"]
        )

        updates, opt_state = tx.update(grads, state.opt_state, state.params["params"])
        new_trainable = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params["params"], updates
        )
        new_params = {"params": new_trainable, **frozen}

        def pick(new, old):
            return jax.tree_util.tree_map(lambda a, b: jnp.where(ok, a, b), new, old)

        new_params = pick(new_params, state.params)
        opt_state = pick(opt_state, state.opt_state)

        metrics = dict(metrics)
        metrics.update(
            loss=loss,
            ok=ok.astype(jnp.float32),
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
