"""F&E (Filter-and-Ensemble) pseudo-label / GT augmentation.

Rebuild of FandE/__init__.py:4-39 as pure jnp functions with explicit
``jax.random`` keys (the reference draws from the global python/torch RNGs:
``random.random()`` at :10, ``torch.rand`` at :32 — SURVEY.md §7 "randomness
plumbing").

Array convention: disparity maps are (B, H, W) single-channel (the reference
carries an explicit channel dim of 1; its per-pixel channel-L2 ‖t−s‖ reduces
to ``abs``). ``valid`` is (B, H, W) in {0, 1}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fande_filter(
    source: jnp.ndarray,
    target: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    withprob: bool = False,
    threshold: float = 3.0,
):
    """FandE_Filter (FandE/__init__.py:24-39).

    Keeps source pixels consistent with target (|t−s| < τ). With
    ``withprob=True`` (the GT path), *inconsistent* pixels are stochastically
    re-admitted image-wise: a whole-image Bernoulli with
    p = (#consistent / #valid) per batch element (:29-35).

    Returns (filtered_source, new_valid), both (B, H, W).
    """
    valid = valid.astype(jnp.float32)
    consistent = (jnp.abs(target - source) < threshold).astype(jnp.float32) * valid
    source = source * valid
    if withprob:
        num_consistent = consistent.reshape(consistent.shape[0], -1).sum(axis=-1)
        num_valid = valid.reshape(valid.shape[0], -1).sum(axis=-1)
        p = num_consistent / jnp.maximum(num_valid, 1.0)
        u = jax.random.uniform(key, p.shape)
        select = (u < p).astype(jnp.float32)[:, None, None]
        readmit = select * (1.0 - consistent) * valid
        new_valid = (consistent + (1.0 - consistent) * readmit) * valid
    else:
        new_valid = consistent
    return source * new_valid, new_valid


def fande_ensemble(
    source: jnp.ndarray,
    target: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    clamp: float | bool = False,
    threshold: float = 3.0,
) -> jnp.ndarray:
    """FandE_Ensemble (FandE/__init__.py:4-21).

    Where source and target are consistent, moves source toward target by
    ``U(0,1)·|s−t|`` — ONE uniform scalar per call (:9-12), not per pixel —
    optionally clamped (GT path: 1.0 px). Signed direction from the
    post-masking comparison (:15-17)."""
    valid = valid.astype(jnp.float32)
    consistent = (jnp.abs(target - source) < threshold).astype(jnp.float32) * valid
    source = source * valid
    target = target * valid
    offset = jnp.abs(source - target)
    prob = jax.random.uniform(key, ())
    offset = prob * offset
    if clamp:
        offset = jnp.minimum(offset, float(clamp))
    direction = jnp.sign(target - source)
    aug = direction * offset * consistent
    return (source + aug) * valid
