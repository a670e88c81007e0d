"""Input padding to divisibility constraints.

TPU-native replacement for the reference's ``InputPadder``
(``core/utils/utils.py:7-26``): pure functions over NHWC arrays; the pad spec
is a static tuple so everything stays jit-compatible at a fixed image size.

Two modes, as in the reference:
  - ``"sintel"``: symmetric pad (H and W centered),
  - otherwise:    bottom-pad H, centered W.
Padding is replicate ("edge"), matching ``F.pad(mode='replicate')``.
"""

from __future__ import annotations

import jax.numpy as jnp


def pad_dims(ht: int, wd: int, divis_by: int = 8, mode: str = "sintel"):
    """Compute ((top, bottom), (left, right)) pads.

    Mirrors core/utils/utils.py:10-16 exactly, including the ``% divis_by``
    that makes already-divisible dims pad by zero.
    """
    pad_ht = (((ht // divis_by) + 1) * divis_by - ht) % divis_by
    pad_wd = (((wd // divis_by) + 1) * divis_by - wd) % divis_by
    if mode == "sintel":
        return (pad_ht // 2, pad_ht - pad_ht // 2), (pad_wd // 2, pad_wd - pad_wd // 2)
    return (0, pad_ht), (pad_wd // 2, pad_wd - pad_wd // 2)


def pad_input(x: jnp.ndarray, divis_by: int = 8, mode: str = "sintel") -> tuple[jnp.ndarray, tuple]:
    """Replicate-pad NHWC ``x`` so H, W are multiples of ``divis_by``.

    Returns (padded, pad_spec); feed pad_spec to :func:`unpad_input`.
    """
    _, ht, wd, _ = x.shape
    (pt, pb), (pl, pr) = pad_dims(ht, wd, divis_by, mode)
    padded = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)), mode="edge")
    return padded, ((pt, pb), (pl, pr))


def unpad_input(x: jnp.ndarray, pad_spec: tuple) -> jnp.ndarray:
    """Crop an NHWC array back (inverse of :func:`pad_input`)."""
    (pt, pb), (pl, pr) = pad_spec
    _, ht, wd, _ = x.shape
    return x[:, pt : ht - pb, pl : wd - pr, :]
