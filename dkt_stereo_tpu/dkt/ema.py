"""EMA teacher update — pure pytree lerp (tools/ft_dkt.py:179-181).

On TPU this runs inside the jitted train step over replicated/sharded params,
so all replicas stay identical by construction (SURVEY.md §2.7)."""

from __future__ import annotations

import jax


def ema_update(teacher_params, student_params, decay: float):
    """t ← decay·t + (1−decay)·s, leaf-wise."""
    return jax.tree_util.tree_map(
        lambda t, s: decay * t + (1.0 - decay) * s, teacher_params, student_params
    )
