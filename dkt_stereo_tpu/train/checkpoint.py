"""Checkpointing: Orbax for native state + a torch ``.pth`` importer.

The importer consumes the reference's checkpoints (torch ``state_dict`` with
DataParallel ``module.`` prefixes, optionally nested under a ``state_dict``
key — tools/ft_dkt.py:136-139) and produces this framework's flax variables
(params + batch_stats), enabling numerical parity evaluation against released
DKT/RAFT-Stereo weights (SURVEY.md §5 checkpoint/resume).

Key mapping (torch → flax):
  conv ``weight`` (O,I,kH,kW) → ``kernel`` (kH,kW,I,O); norm ``weight`` →
  ``scale``; running stats → the ``batch_stats`` collection;
  ``downsample.0/1`` → ``downsample_conv``/``norm3``; ``outputsXX.i.0/1`` →
  ``outputsXX_i/res``/``conv``; ``mask.0/2`` → ``mask_conv1/2``;
  ``update_block`` lives under the scan scope ``step/update_block``.
"""

from __future__ import annotations

import os
import re
from typing import Any

import numpy as np


def _map_torch_key(tokens: list[str]) -> list[str]:
    """Map reference module-path tokens to flax scope tokens (no leaf)."""
    out: list[str] = []
    i = 0
    if tokens[0] == "update_block":
        out += ["step", "update_block"]
        i = 1
    while i < len(tokens):
        t = tokens[i]
        if re.fullmatch(r"outputs(08|16|32)", t):
            idx = tokens[i + 1]
            head = f"{t}_{idx}"
            if t == "outputs32":
                out.append(head)
                i += 2
            else:
                sub = tokens[i + 2]
                out += [head, "res" if sub == "0" else "conv"]
                i += 3
            continue
        if t == "context_zqr_convs":
            out.append(f"context_zqr_convs_{tokens[i + 1]}")
            i += 2
            continue
        if t == "downsample":
            out.append("downsample_conv" if tokens[i + 1] == "0" else "norm3")
            i += 2
            continue
        if t == "mask":
            out.append({"0": "mask_conv1", "2": "mask_conv2"}[tokens[i + 1]])
            i += 2
            continue
        out.append(t)
        i += 1
    return out


def _get(tree: dict, path: list[str]):
    for k in path:
        if not isinstance(tree, dict) or k not in tree:
            return None
        tree = tree[k]
    return tree


def _set(tree: dict, path: list[str], value) -> None:
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def import_reference_pth(path_or_state, template_vars: dict) -> dict:
    """Convert a reference ``.pth`` state dict into flax variables matching
    ``template_vars`` (the output of ``model.init``). Raises on any reference
    tensor that cannot be placed, and on any template leaf left unfilled
    (mirrors the reference's strict loading, tools/ft_dkt.py:139)."""
    import torch

    if isinstance(path_or_state, (str, os.PathLike)):
        state = torch.load(path_or_state, map_location="cpu", weights_only=True)
    else:
        state = path_or_state
    if "state_dict" in state:
        state = state["state_dict"]

    def to_mutable(d):
        return {k: to_mutable(v) if isinstance(v, dict) else None for k, v in d.items()}

    out = to_mutable(template_vars)
    filled, skipped = 0, []

    for key, tensor in state.items():
        key = key.removeprefix("module.")
        *mods, leaf = key.split(".")
        if leaf == "num_batches_tracked":
            continue
        scope = _map_torch_key(mods)
        arr = np.asarray(tensor.detach().cpu().numpy())

        if leaf == "weight" and arr.ndim == 4:
            path = ["params", *scope, "kernel"]
            arr = arr.transpose(2, 3, 1, 0)
        elif leaf in ("weight", "bias") and arr.ndim == 1:
            # norm affine or conv bias — disambiguate via the template
            norm_scope = _norm_scope(template_vars.get("params", {}), scope)
            if norm_scope is not None and leaf == "weight":
                path = ["params", *norm_scope, "scale"]
            elif norm_scope is not None and _get(template_vars["params"], scope + ["bias"]) is None:
                path = ["params", *norm_scope, "bias"]
            else:
                path = ["params", *scope, "bias"]
        elif leaf == "running_mean":
            norm_scope = _norm_scope(template_vars.get("batch_stats", {}), scope)
            path = ["batch_stats", *(norm_scope or scope), "mean"]
        elif leaf == "running_var":
            norm_scope = _norm_scope(template_vars.get("batch_stats", {}), scope)
            path = ["batch_stats", *(norm_scope or scope), "var"]
        else:
            skipped.append(key)
            continue

        target = _get(template_vars, path)
        if target is None:
            skipped.append(key)
            continue
        assert target.shape == arr.shape, (key, target.shape, arr.shape)
        _set(out, path, arr.astype(np.asarray(target).dtype))
        filled += 1

    if skipped:
        raise ValueError(f"unmapped reference tensors: {skipped[:10]} (+{len(skipped)-10 if len(skipped)>10 else 0})")

    missing = []

    def check(d, prefix):
        for k, v in d.items():
            if isinstance(v, dict):
                check(v, prefix + [k])
            elif v is None:
                missing.append("/".join(prefix + [k]))

    check(out, [])
    if missing:
        raise ValueError(f"template leaves not filled from checkpoint: {missing[:10]}")
    return out


def _norm_scope(tree: dict, scope: list[str]):
    """If ``scope`` names a Norm wrapper, return the scope extended with the
    flax inner module name (BatchNorm_0 / GroupNorm_0)."""
    node = _get(tree, scope)
    if isinstance(node, dict):
        for inner in ("BatchNorm_0", "GroupNorm_0", "LayerNorm_0"):
            if inner in node:
                return scope + [inner]
    return None


# ---------------------------------------------------------------------------
# Orbax native checkpointing of DKTTrainState
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, state, step: int | None = None) -> str:
    """Save {step, params, ema_params, teacher_params, opt_state}."""
    import orbax.checkpoint as ocp

    step = int(state.step) if step is None else step
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, target_state):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target_state)
