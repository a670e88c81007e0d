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

import numpy as np


# Regex rewrites from torch module paths to flax scope paths. Where a torch
# name is ambiguous across models (e.g. ``downsample.1`` is ``norm3`` in the
# RAFT ResidualBlock but ``downsample_bn`` in the PSM BasicBlock) the rule
# yields ``A|B`` alternatives resolved against the template tree.
_NAME_RULES: list[tuple[str, str]] = [
    # RAFT-Stereo (core/extractor.py, core/update.py, raft_stereo.py)
    (r"^update_block\.", "step.update_block."),
    # IGEV's encoder copy names its heads by true scale (outputs04/08/16,
    # igev_stereo/extractor.py) where RAFT/PCV use outputs08/16/32; map onto
    # our shared scale-indexed names with template-resolved alternatives
    (r"outputs04\.(\d+)\.0\.", r"outputs08_\1.res."),
    (r"outputs04\.(\d+)\.1\.", r"outputs08_\1.conv."),
    (r"outputs16\.(\d+)\.(weight|bias)$", r"outputs32_\1.\2"),  # IGEV coarsest (plain conv)
    (r"outputs08\.(\d+)\.0\.", r"outputs08_\1.res.|outputs16_\1.res."),
    (r"outputs08\.(\d+)\.1\.", r"outputs08_\1.conv.|outputs16_\1.conv."),
    (r"outputs16\.(\d+)\.0\.", r"outputs16_\1.res."),
    (r"outputs16\.(\d+)\.1\.", r"outputs16_\1.conv."),
    (r"outputs32\.(\d+)\.", r"outputs32_\1."),
    (r"context_zqr_convs\.(\d+)\.", r"context_zqr_convs_\1."),
    (r"(^|\.)mask\.0\.", r"\1mask_conv1."),  # anchored: not conv_softmask.0
    (r"(^|\.)mask\.2\.", r"\1mask_conv2."),
    # GWCNet (gwcnet/gwc_main.py, submodules.py)
    (r"firstconv\.(\d+)\.0\.", lambda m: f"firstconv_{int(m.group(1)) // 2}.conv."),
    (r"firstconv\.(\d+)\.1\.", lambda m: f"firstconv_{int(m.group(1)) // 2}.bn."),
    (r"lastconv\.0\.0\.", "lastconv_0.conv."),
    (r"lastconv\.0\.1\.", "lastconv_0.bn."),
    (r"lastconv\.2\.", "lastconv_1."),
    (r"(dres[01])\.(\d+)\.0\.", lambda m: f"{m.group(1)}_{int(m.group(2)) // 2}.conv."),
    (r"(dres[01])\.(\d+)\.1\.", lambda m: f"{m.group(1)}_{int(m.group(2)) // 2}.bn."),
    (r"(conv[1-4])\.0\.0\.", r"\1.conv."),  # hourglass convbn_3d in Sequential
    (r"(conv[1-4])\.0\.1\.", r"\1.bn."),
    (r"(conv[56])\.0\.", r"\1_deconv."),
    (r"(conv[56])\.1\.", r"\1_bn."),
    (r"(redir[12])\.0\.", r"\1.conv."),
    (r"(redir[12])\.1\.", r"\1.bn."),
    (r"(classif\d)\.0\.0\.", r"\1.0.conv."),
    (r"(classif\d)\.0\.1\.", r"\1.0.bn."),
    (r"(classif\d)\.2\.", r"\1.1."),
    # IGEV-Stereo (igev_stereo/igev_stereo.py, extractor.py, submodule.py);
    # timm block indices map to flax trunk stage_block names (Feature slices
    # model.blocks into block0..block4 with block3 = stages 3+4)
    # (IGEV nests the trunk under feature/trunk; CGI's trunk is top-level
    # feature_trunk — both offered as template-resolved alternatives)
    (r"^feature\.(conv_stem|bn1)\.", r"feature.trunk.\1.|feature_trunk.\1."),
    (
        r"^feature\.block(\d)\.(\d)\.(\d+)\.",
        (
            lambda m: "feature.trunk.blocks_{}_{}.".format(
                {0: 0, 1: 1, 2: 2, 3: 3, 4: 5}[int(m.group(1))] + int(m.group(2)),
                m.group(3),
            ),
            lambda m: "feature_trunk.blocks_{}_{}.".format(
                {0: 0, 1: 1, 2: 2, 3: 3, 4: 5}[int(m.group(1))] + int(m.group(2)),
                m.group(3),
            ),
        ),
    ),
    (r"stem_([24])\.2\.", r"stem_\1_bn."),  # CGI BN stems (IGEV .2 is IN, no params)
    (r"stem_([24])\.(\d)\.", r"stem_\1_\2."),
    (r"spx\.0\.", "spx_0."),
    (r"^spx_gru\.0\.", "step.spx_gru_0."),
    (r"^spx_2_gru\.", "step.spx_2_gru."),
    (r"spx_4\.2\.", "spx_4_bn."),  # CGI spx_4 BatchNorm
    (r"spx_4\.(\d)\.", r"spx_4_\1."),
    (r"(agg_[01])\.(\d)\.", r"\1_\2."),
    (r"feat_att\.(\d)\.", r"feat_att_\1."),
    (r"(^|\.)att\.(\d)\.", r"\1att_\2."),  # CGI CGF attention sequential
    (r"mask_feat_4\.0\.", "mask_feat_4_0."),
    # CGI-Stereo extras (cgi/CGI_Stereo.py)
    (r"^semantic\.0\.", "semantic_0."),
    (r"^semantic\.1\.", "semantic_1."),
    (r"semantic\.0\.", "semantic_0."),
    (r"semantic\.1\.", "semantic_1."),
    (r"^feature_up\.", ""),  # FeatUp modules live at top level here
    # PCVNet (pcvnet/model.py, update.py, refinement.py, extractor.py)
    (r"^FDM\.", "step.FDM."),
    (r"^conv2\.0\.", "conv2_res."),  # shared-backbone head Sequential
    (r"^conv2\.1\.", "conv2_out."),
    (r"low_level_conv\.(\d)\.", r"low_level_conv_\1."),
    (r"(conv\d_out)\.0\.", r"\1_0."),  # FDM conv2_out/conv3_out Sequential
    (r"conv_softmask\.0\.", "conv_softmask_0."),
    (r"conv_disp\.0\.", "conv_disp_0."),
    # shared / ambiguous Sequential indices: PSM convbn (conv+bn) vs PCV
    # Sequential(conv, relu) — resolved against the template
    (r"(conv[0-9])\.0\.", r"\1.conv.|\1_0."),
    (r"(conv[0-9])\.1\.", r"\1.bn.|\1_1."),
    (r"(conv[0-9])\.2\.", r"\1_2."),  # refineNet conv0.2
    (r"(layer\d)\.(\d+)\.", r"\1_\2.|\1.\2."),  # PSM flat vs RAFT nested stages
    # shared / ambiguous
    (r"downsample\.0\.", "downsample_conv."),
    (r"downsample\.1\.", "norm3.|downsample_bn."),
]


def _map_candidates(key: str) -> list[list[str]]:
    """Apply rules; '|'-separated (or tuple-of-callable) replacements fan out
    into alternative paths resolved against the template."""
    keys = [key]
    for pat, repl in _NAME_RULES:
        if isinstance(repl, str):
            alts = repl.split("|")
        elif isinstance(repl, tuple):
            alts = list(repl)
        else:
            alts = [repl]
        next_keys = []
        for k in keys:
            if not re.search(pat, k):
                next_keys.append(k)
                continue
            for alt in alts:
                next_keys.append(re.sub(pat, alt, k))
        keys = next_keys
    return [k.split(".") for k in keys]


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

    # Parameters the reference *creates* but never uses in forward — its
    # BasicConv always instantiates self.bn even with bn=False (igev/cgi
    # submodule.py:10-36); the hourglass final deconvs have bn=False.
    known_unused = re.compile(r"conv1_up\.bn\.")
    # Modules defined but never called in the reference's forward (their
    # params exist in checkpoints but influence nothing): CGI's Feature
    # defines deconv32_16 that only FeatUp uses (CGI_Stereo.py:58,71-96).
    # Skipped only when no template path resolves (IGEV genuinely uses its
    # feature.deconv32_16).
    known_optional = re.compile(r"^feature\.deconv32_16\.")

    for key, tensor in state.items():
        key = key.removeprefix("module.")
        if key.endswith("num_batches_tracked"):
            continue
        if known_unused.search(key):
            continue
        arr = np.asarray(tensor.detach().cpu().numpy())

        resolved = []
        for tokens in _map_candidates(key):
            *scope, leaf = tokens
            path, value = _resolve_leaf(template_vars, scope, leaf, arr)
            if path is not None:
                resolved.append((path, value))
        if not resolved:
            if known_optional.search(key):
                continue
            skipped.append(key)
            continue
        # among valid candidates prefer an unfilled slot (scale-shifted head
        # names like IGEV's outputs04/08/16 can alias several templates)
        path, value = next(
            ((p, v) for p, v in resolved if _get(out, p) is None), resolved[0]
        )
        target = _get(template_vars, path)
        assert target.shape == value.shape, (key, path, target.shape, value.shape)
        _set(out, path, value.astype(np.asarray(target).dtype))
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


def _resolve_leaf(template_vars: dict, scope: list[str], leaf: str, arr: np.ndarray):
    """Return (flax path, transformed array) for one torch tensor, or
    (None, None) when the candidate scope doesn't exist in the template."""
    if leaf == "weight" and arr.ndim == 4:  # Conv2d OIHW → HWIO
        path = ["params", *scope, "kernel"]
        return (path, arr.transpose(2, 3, 1, 0)) if _get(template_vars, path) is not None else (None, None)
    if leaf == "weight" and arr.ndim == 5:  # Conv3d OIDHW → DHWIO; and
        # ConvTranspose3d IO(DHW) → our (k,k,k,O,I): same permutation
        path = ["params", *scope, "kernel"]
        return (path, arr.transpose(2, 3, 4, 1, 0)) if _get(template_vars, path) is not None else (None, None)
    if leaf == "weight" and arr.ndim == 2:  # Linear (O,I) → (I,O)
        path = ["params", *scope, "kernel"]
        return (path, arr.T) if _get(template_vars, path) is not None else (None, None)
    if leaf in ("weight", "bias") and arr.ndim == 1:
        norm_scope = _norm_scope(template_vars.get("params", {}), scope)
        if norm_scope is not None:
            path = ["params", *norm_scope, "scale" if leaf == "weight" else "bias"]
        else:
            path = ["params", *scope, "bias"]
        return (path, arr) if _get(template_vars, path) is not None else (None, None)
    if leaf in ("running_mean", "running_var"):
        norm_scope = _norm_scope(template_vars.get("batch_stats", {}), scope)
        path = ["batch_stats", *(norm_scope or scope), "mean" if leaf == "running_mean" else "var"]
        return (path, arr) if _get(template_vars, path) is not None else (None, None)
    return None, None


def _norm_scope(tree: dict, scope: list[str]):
    """If ``scope`` names a Norm wrapper, return the scope extended with the
    flax inner module name (BatchNorm_0 / GroupNorm_0)."""
    node = _get(tree, scope)
    if isinstance(node, dict):
        for inner in ("BatchNorm_0", "GroupNorm_0", "LayerNorm_0"):
            if inner in node:
                return scope + [inner]
    return None


def _find_trunk_scope(params: dict, prefix=()) -> list[str] | None:
    """Depth-first search for the MobileNetV2 trunk subtree (the dict that
    owns 'conv_stem'): ['feature', 'trunk'] in IGEV, ['feature_trunk'] in
    CGI."""
    for k, v in params.items():
        if not isinstance(v, dict):
            continue
        if "conv_stem" in v:
            return list(prefix) + [k]
        found = _find_trunk_scope(v, prefix + (k,))
        if found is not None:
            return found
    return None


def import_timm_mobilenetv2(path_or_state, template_vars: dict) -> dict:
    """Load a RAW timm ``mobilenetv2_100`` checkpoint into the MobileNetV2
    trunk of an IGEV/CGI variables tree (the ImageNet-pretrained trunk the
    reference gets from ``timm.create_model(..., pretrained=True)``,
    meta_arch/igev_stereo/extractor.py:330, meta_arch/cgi/CGI_Stereo.py:44).

    Accepts a ``.pth`` path (torch pickle), an ``.npz`` path, or a dict of
    arrays/tensors. Strict against the vendored manifest
    (nn/mobilenetv2_manifest.py): every feature tensor of stages 0..5 must
    be present, shape-correct, and placed; stage-6/classifier-head tensors —
    which the reference discards by slicing ``model.blocks[0:6]``
    (extractor.py:338-342) — are tolerated and ignored. Returns a full copy
    of ``template_vars`` with the trunk leaves replaced."""
    import copy

    from dkt_stereo_tpu.nn.mobilenetv2_manifest import (
        HEAD_KEY_PREFIXES,
        timm_mobilenetv2_100_manifest,
    )

    if isinstance(path_or_state, (str, os.PathLike)):
        p = os.fspath(path_or_state)
        if p.endswith(".npz"):
            state = dict(np.load(p))
        else:
            import torch

            state = torch.load(p, map_location="cpu", weights_only=True)
            if "state_dict" in state:
                state = state["state_dict"]
    else:
        state = path_or_state

    def as_np(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    manifest = timm_mobilenetv2_100_manifest()
    needed = {
        k: s
        for k, s in manifest.items()
        if not k.startswith("blocks.6.") and not k.endswith("num_batches_tracked")
    }
    missing = sorted(set(needed) - set(state))
    if missing:
        raise ValueError(f"checkpoint is missing mobilenetv2 tensors: {missing[:10]}")

    trunk = _find_trunk_scope(template_vars.get("params", {}))
    if trunk is None:
        raise ValueError("template has no MobileNetV2 trunk (no conv_stem found)")

    out = copy.deepcopy(template_vars)
    placed = []
    for key, tensor in state.items():
        if (
            key.startswith(HEAD_KEY_PREFIXES)
            or key.startswith("blocks.6.")
            or key.endswith("num_batches_tracked")
        ):
            continue
        arr = as_np(tensor)
        if key in manifest and tuple(arr.shape) != tuple(manifest[key]):
            raise ValueError(f"{key}: shape {arr.shape} != manifest {manifest[key]}")
        # timm 'blocks.S.B.rest' -> flax 'blocks_S_B.rest'
        tokens = key.split(".")
        if tokens[0] == "blocks":
            tokens = ["blocks_{}_{}".format(tokens[1], tokens[2])] + tokens[3:]
        *rel_scope, leaf = tokens
        path, value = _resolve_leaf(template_vars, trunk + rel_scope, leaf, arr)
        if path is None:
            raise ValueError(f"cannot place mobilenetv2 tensor {key}")
        target = _get(template_vars, path)
        assert target.shape == value.shape, (key, path, target.shape, value.shape)
        _set(out, path, value.astype(np.asarray(target).dtype))
        placed.append(path)

    # every trunk leaf (params + batch_stats) must have been overwritten
    placed_set = {tuple(p) for p in placed}
    unfilled = []
    for coll in ("params", "batch_stats"):
        sub = _get(template_vars, [coll, *trunk])
        if sub is None:
            continue

        def walk(d, prefix):
            for k, v in d.items():
                if isinstance(v, dict):
                    walk(v, prefix + [k])
                elif tuple(prefix + [k]) not in placed_set:
                    unfilled.append("/".join(prefix + [k]))

        walk(sub, [coll, *trunk])
    if unfilled:
        raise ValueError(f"trunk leaves not covered by checkpoint: {unfilled[:10]}")
    return out


def export_reference_pth(variables, reference_template, path=None):
    """Inverse of :func:`import_reference_pth`: write this framework's flax
    variables back into a reference-format torch ``state_dict`` — so a model
    fine-tuned here can be consumed by the reference's own tools
    (tools/evaluate_stereo.py:366-371 strict ``load_state_dict``).

    ``reference_template`` (a ``.pth`` path or state dict) supplies the
    reference key set — normally the checkpoint that was originally imported.
    Its tensors also pass through verbatim for the reference-only slots this
    framework has no state for: ``num_batches_tracked`` counters and the
    BN params the reference creates but never runs (igev/cgi
    submodule.py:10-36 instantiate ``self.bn`` even with bn=False).

    Every torch key is resolved through the same name rules as import (with
    the same first-unused disambiguation, so aliased heads like IGEV's
    outputs04/08/16 land back on their original tensors), and every flax
    params/batch_stats leaf must be consumed — a two-sided strictness
    mirroring the importer's. Returns the state dict; also ``torch.save``\\ s
    it (DataParallel prefixes and any ``state_dict`` nesting preserved from
    the template) when ``path`` is given."""
    import torch

    if isinstance(reference_template, (str, os.PathLike)):
        tmpl = torch.load(reference_template, map_location="cpu", weights_only=True)
    else:
        tmpl = reference_template
    wrapper = {k: v for k, v in tmpl.items() if k != "state_dict"} if "state_dict" in tmpl else None
    if "state_dict" in tmpl:
        tmpl = tmpl["state_dict"]

    known_unused = re.compile(r"conv1_up\.bn\.")
    known_optional = re.compile(r"^feature\.deconv32_16\.")

    def to_torch_layout(val, leaf, tndim):
        if leaf == "weight" and tndim == 4:  # HWIO → OIHW (convT: (k,k,O,I) → IO(HW))
            return val.transpose(3, 2, 0, 1)
        if leaf == "weight" and tndim == 5:  # DHWIO → OIDHW
            return val.transpose(4, 3, 0, 1, 2)
        if leaf == "weight" and tndim == 2:  # (I,O) → (O,I)
            return val.T
        return val

    out = {}
    used: set = set()
    for key, tensor in tmpl.items():
        bare = key.removeprefix("module.")
        tarr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        if bare.endswith("num_batches_tracked") or known_unused.search(bare):
            out[key] = torch.as_tensor(tarr)
            continue
        resolved = []
        for tokens in _map_candidates(bare):
            *scope, leaf_name = tokens
            p, _ = _resolve_leaf(variables, scope, leaf_name, tarr)
            if p is not None:
                resolved.append((p, tokens[-1]))
        if not resolved:
            if known_optional.search(bare):
                out[key] = torch.as_tensor(tarr)
                continue
            raise ValueError(f"cannot resolve reference tensor {key!r} against the variables tree")
        p, leaf_name = next(
            ((p, l) for p, l in resolved if tuple(p) not in used), resolved[0]
        )
        used.add(tuple(p))
        val = np.asarray(_get(variables, p))
        val = to_torch_layout(val, leaf_name, tarr.ndim).astype(tarr.dtype)
        assert val.shape == tarr.shape, (key, p, val.shape, tarr.shape)
        out[key] = torch.as_tensor(np.ascontiguousarray(val))

    unconsumed = []

    def walk(d, prefix):
        for k, v in d.items():
            if isinstance(v, dict):
                walk(v, prefix + [k])
            elif tuple(prefix + [k]) not in used:
                unconsumed.append("/".join(prefix + [k]))

    for coll in ("params", "batch_stats"):
        if coll in variables:
            walk(variables[coll], [coll])
    if unconsumed:
        raise ValueError(
            f"flax leaves not covered by the reference template: {unconsumed[:10]}"
            f" (+{max(0, len(unconsumed) - 10)})"
        )

    if wrapper is not None:
        full = dict(wrapper)
        full["state_dict"] = out
    else:
        full = out
    if path is not None:
        torch.save(full, path)
    return full


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


def restore_variables(path, template_vars: dict, which: str = "student") -> dict:
    """Flax variables from ANY checkpoint this framework meets: a reference
    ``.pth`` (imported against ``template_vars``), a bare-variables Orbax
    checkpoint, or a full DKT train-state Orbax checkpoint — for the last,
    ``which`` selects the student/ema/teacher weights. This is what lets
    ``cli.eval``/``cli.demo`` consume ``cli.train``'s own checkpoints
    directly (previously a typed restore against a bare-variables template
    crashed on the train-state tree)."""
    if os.fspath(path).endswith(".pth"):
        return import_reference_pth(path, template_vars)
    import orbax.checkpoint as ocp

    tree = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    if "ema_params" in tree:  # full DKTTrainState layout
        field = {"student": "params", "ema": "ema_params", "teacher": "teacher_params"}[which]
        tree = tree[field]
    return tree


def latest_checkpoint(ckpt_dir: str) -> str | None:
    """Newest completed ``step_N`` Orbax checkpoint under ``ckpt_dir`` (the
    layout :func:`save_checkpoint` writes), or None. In-progress Orbax saves
    live in ``*.orbax-checkpoint-tmp-*`` directories, which the strict
    ``step_(\\d+)`` match excludes — only committed checkpoints qualify."""
    import glob
    import re as _re

    best, best_step = None, -1
    for p in glob.glob(os.path.join(ckpt_dir, "step_*")):
        m = _re.fullmatch(r"step_(\d+)", os.path.basename(p))
        if m and os.path.isdir(p) and int(m.group(1)) > best_step:
            best_step, best = int(m.group(1)), p
    return best
