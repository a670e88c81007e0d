"""Train state + optimizer for the DKT fine-tune loop.

Optimizer parity (tools/ft_dkt.py:56-63): AdamW(lr, wdecay 1e-5, eps 1e-8) +
OneCycleLR(max_lr, num_steps+100, pct_start 0.01, linear anneal). Torch's
two-phase linear OneCycle is rebuilt with joined linear schedules
(initial lr = max/25, final = max/25/1e4 — torch defaults), and gradient
clipping to global-norm 1.0 (ft_dkt.py:244) is part of the chain.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import optax
from flax import struct


@dataclasses.dataclass(frozen=True)
class DKTHyperParams:
    """CLI defaults from tools/ft_dkt.py:312-344."""

    lr: float = 2e-4
    wdecay: float = 1e-5
    num_steps: int = 200_000
    train_iters: int = 16
    valid_iters: int = 32
    teacher_iters: int = 32  # hardcoded at ft_dkt.py:193,199
    ema_decay: float = 0.99999
    tau_gt: float = 3.0
    tau_pl: float = 3.0
    clamp: float = 1.0
    pl_weight: float = 1.0  # ft_dkt.py:234 "loss_PL * 1.0"
    cascade_train: bool = False
    # Run the frozen + EMA teacher forwards as ONE vmapped call over their
    # stacked param trees instead of two sequential applies.  The reference
    # runs them separately only because DataParallel forces two python calls
    # (tools/ft_dkt.py:193-199); on TPU one batched program amortizes the
    # latency-bound small-spatial GRU convs across both teachers (XLA lowers
    # the vmapped convs to grouped convs / batched dots on the MXU).  Math
    # is identical up to float reassociation (tests/test_dkt.py pins slot
    # independence and closeness to the sequential path); default False so
    # the reference-parity config stays bit-comparable.
    batched_teachers: bool = False


def onecycle_linear(max_lr: float, total_steps: int, pct_start: float = 0.01):
    """torch OneCycleLR(anneal_strategy='linear', three_phase=False) clone,
    matched to torch's exact phase arithmetic: warmup peaks at step
    ``float(pct_start·total)−1`` and the anneal reaches ``min_lr`` at step
    ``total−1`` (an optax join_schedules approximation previously deviated
    by ~1e-5 absolute / up to 9% near the tail)."""
    init = max_lr / 25.0
    min_lr = init / 1e4
    b1 = max(float(pct_start * total_steps) - 1.0, 1e-9)  # phase-1 end step
    span = max(float(total_steps - 1) - b1, 1e-9)

    def schedule(count):
        s = jnp.asarray(count, jnp.float32)
        up = init + (max_lr - init) * jnp.clip(s / b1, 0.0, 1.0)
        down = max_lr + (min_lr - max_lr) * jnp.clip((s - b1) / span, 0.0, 1.0)
        return jnp.where(s <= b1, up, down)

    return schedule


def make_optimizer(hyper: DKTHyperParams):
    schedule = onecycle_linear(hyper.lr, hyper.num_steps + 100)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=hyper.wdecay),
    )
    return tx, schedule


def applied_step_count(opt_state):
    """Number of APPLIED optimizer steps — the adam count inside
    ``make_optimizer``'s chain state. Differs from ``DKTTrainState.step``
    when ok=False steps were skipped: the skip reverts opt_state (matching
    the reference's not calling scheduler.step(), ft_dkt.py:235-237), so
    the schedule position must be read from here, not from step."""
    return opt_state[1][0].count


class DKTTrainState(struct.PyTreeNode):
    """Student params + EMA teacher + frozen teacher + optimizer state.

    The frozen teacher (restore_ckpt_T, ft_dkt.py:144-151) never changes; the
    EMA teacher lerps toward the student every step (:179-181)."""

    step: jnp.ndarray
    params: Any
    ema_params: Any
    teacher_params: Any
    opt_state: Any
