"""Benchmark validators (rebuild of tools/evaluate_stereo.py:46-336).

Per-benchmark protocol preserved exactly (masks, thresholds, aggregation):

| benchmark   | mask                                           | thresh | D1 aggregation |
|-------------|------------------------------------------------|--------|----------------|
| ETH3D       | valid ∧ gt<0 ∧ nocc==255                       | >1 px  | per-image mean |
| KITTI 12/15 | valid ∧ −maxdisp<gt<0                          | >3 px  | per-pixel concat (+FPS after 50 warm-up) |
| Things TEST | valid ∧ gt>−maxdisp  (NB: no gt<0 bound, :200) | >1 px  | per-pixel concat, NaN frames skipped |
| Middlebury  | valid ∧ −maxdisp<gt<0 ∧ nocc==255              | >2 px  | per-image mean |
| Booster-Q   | valid ∧ −maxdisp<gt<0                          | >2 px  | per-image mean |

All images processed at batch 1, padded to multiples of ``divide_factor``
(32, tools/evaluate_stereo.py:37) with symmetric replicate padding, disparity
as negative flow-x. The reference's validate_middlebury NameError on its final
print (:274, undefined ``split``) is fixed, not reproduced.

``make_forward_fn`` builds the jitted (img1, img2) → disp callable once; each
distinct padded shape triggers one XLA compile (KITTI shapes mostly coincide).
"""

from __future__ import annotations

import logging
import time

import numpy as np

from dkt_stereo_tpu.data import readers
from dkt_stereo_tpu.data.datasets import (
    Booster,
    ETH3D,
    KITTI,
    Middlebury,
    SceneFlowDatasets,
)

logger = logging.getLogger(__name__)


# One compiled executable per (model class, config, iters) — params enter as
# a jit ARGUMENT, so swapping weights (the train loop validates every
# validation_frequency steps with fresh params) reuses the compile instead of
# re-tracing with the weights baked in as constants (minutes per validator
# per shape on TPU).
_FWD_CACHE: dict = {}


def make_forward_fn(model_cls, cfg, params, iters=32):
    """Jitted eval forward: (img1, img2 NHWC [0,255]) → disp (B,H,W)."""
    import jax

    key = (model_cls, cfg, iters)
    if key not in _FWD_CACHE:
        model = model_cls(cfg, iters=iters, test_mode=True)

        @jax.jit
        def forward(p, img1, img2):
            _, disp = model.apply(p, img1, img2)
            return disp

        _FWD_CACHE[key] = forward

    fwd = _FWD_CACHE[key]
    return lambda img1, img2: fwd(params, img1, img2)


def _run_one(forward, img1, img2, divide_factor):
    import jax.numpy as jnp

    from dkt_stereo_tpu.ops.pad import pad_input, unpad_input

    x1, spec = pad_input(jnp.asarray(img1[None]), divide_factor, "sintel")
    x2, _ = pad_input(jnp.asarray(img2[None]), divide_factor, "sintel")
    t0 = time.perf_counter()
    disp = forward(x1, x2)
    disp = np.asarray(unpad_input(disp[..., None], spec))[0, ..., 0]
    dt = time.perf_counter() - t0
    return disp, dt


def _require_frames(ds, data_root):
    # An absent/empty dataset must fail loudly (train-loop validation logs a
    # "skipped" warning) instead of aggregating to NaN metrics.
    if len(ds) == 0:
        raise FileNotFoundError(f"no frames found under {data_root!r}")


def resolve_eval_dataset(name, data_root):
    """Single source of the eval-CLI dataset-name grammar (``eth3d``,
    ``middlebury-H``, ``kitti-2012``, ``booster-Q``, ``things``), shared by
    ``preflight`` and ``run_validator`` so the two cannot drift. Returns
    ``(kind, variant, root)``."""
    if name == "eth3d":
        return "eth3d", None, f"{data_root}/ETH3D"
    if name.startswith("middlebury"):
        return "middlebury", name.split("-")[1] if "-" in name else "H", f"{data_root}/Middlebury"
    if name.startswith("kitti"):
        return "kitti", name.split("-")[1] if "-" in name else "2015", f"{data_root}/KITTI"
    if name.startswith("booster"):
        return "booster", name.split("-")[1] if "-" in name else "Q", f"{data_root}/Booster_dataset"
    if name == "things":
        return "things", None, f"{data_root}/sceneflow"
    raise ValueError(name)


def _dataset_for(kind, variant, root):
    if kind == "eth3d":
        return ETH3D(None, root=root)
    if kind == "middlebury":
        return Middlebury(None, root=root, resolution=variant)
    if kind == "kitti":
        return KITTI(None, root=root, split=variant)
    if kind == "booster":
        return Booster(None, root=root, resolution=variant)
    return SceneFlowDatasets(None, root=root, dstype="frames_finalpass", things_test=True)


def run_validator(name, forward, data_root, divide_factor=32):
    """Dispatch one eval-CLI dataset name to its validator."""
    kind, variant, root = resolve_eval_dataset(name, data_root)
    if kind == "eth3d":
        return validate_eth3d(forward, root, divide_factor)
    if kind == "middlebury":
        return validate_middlebury(forward, variant, root, divide_factor=divide_factor)
    if kind == "kitti":
        return validate_kitti(forward, variant, root, divide_factor=divide_factor)
    if kind == "booster":
        return validate_booster(forward, variant, root, divide_factor=divide_factor)
    return validate_things(forward, root, divide_factor=divide_factor)


def preflight(names, data_root):
    """Fail fast on empty/absent eval datasets BEFORE the minutes-long TPU
    compile (dataset construction is a cheap filesystem glob)."""
    for name in names:
        kind, variant, root = resolve_eval_dataset(name, data_root)
        _require_frames(_dataset_for(kind, variant, root), f"{root} ({name})")


def validate_eth3d(forward, data_root="data/ETH3D", divide_factor=32):
    """tools/evaluate_stereo.py:46-104."""
    ds = ETH3D(None, root=data_root)
    _require_frames(ds, data_root)
    out_list, epe_list = [], []
    for i in range(len(ds)):
        img1, img2, flow_gt, valid_gt = ds.get_sample(i)
        occ = np.array(
            readers.read_gen(ds.disparity_list[i].replace("disp0GT.pfm", "mask0nocc.png"))
        )
        pred, _ = _run_one(forward, img1, img2, divide_factor)
        epe = np.abs(pred - flow_gt)
        val = (valid_gt >= 0.5) & (flow_gt < 0) & (occ == 255)
        out = epe > 1.0
        epe_list.append(epe[val].mean())
        out_list.append(out[val].mean())
        logger.info("ETH3D %d/%d EPE %.4f D1 %.4f", i + 1, len(ds), epe_list[-1], out_list[-1])
    return {"eth3d-epe": float(np.mean(epe_list)), "eth3d-d1": 100 * float(np.mean(out_list))}


def validate_kitti(forward, split="2015", data_root="data/KITTI", maxdisp=192, divide_factor=32):
    """tools/evaluate_stereo.py:108-171 (incl. warm-up-excluded FPS)."""
    ds = KITTI(None, root=data_root, split=split)
    _require_frames(ds, f"{data_root} (split {split})")
    out_list, epe_list, elapsed = [], [], []
    for i in range(len(ds)):
        img1, img2, flow_gt, valid_gt = ds.get_sample(i)
        pred, dt = _run_one(forward, img1, img2, divide_factor)
        if i > 50:
            elapsed.append(dt)
        epe = np.abs(pred - flow_gt)
        val = (valid_gt >= 0.5) & (flow_gt > -maxdisp) & (flow_gt < 0)
        out = epe > 3.0
        epe_list.append(epe[val].mean())
        out_list.append(out[val])
    d1 = 100 * float(np.mean(np.concatenate(out_list)))
    res = {f"kitti-{split}-epe": float(np.mean(epe_list)), f"kitti-{split}-d1": d1}
    if elapsed:
        res[f"kitti-{split}-fps"] = 1.0 / float(np.mean(elapsed))
    return res


def validate_things(forward, data_root="data/sceneflow", maxdisp=192, divide_factor=32):
    """tools/evaluate_stereo.py:175-213."""
    ds = SceneFlowDatasets(None, root=data_root, dstype="frames_finalpass", things_test=True)
    _require_frames(ds, data_root)
    out_list, epe_list = [], []
    for i in range(len(ds)):
        img1, img2, flow_gt, valid_gt = ds.get_sample(i)
        pred, _ = _run_one(forward, img1, img2, divide_factor)
        epe = np.abs(pred - flow_gt)
        val = (valid_gt >= 0.5) & (flow_gt > -maxdisp)
        m = epe[val].mean()
        if np.isnan(m):
            continue  # :203-204
        epe_list.append(m)
        out_list.append((epe > 1.0)[val])
    return {
        "things-epe": float(np.mean(epe_list)),
        "things-d1": 100 * float(np.mean(np.concatenate(out_list))),
    }


def validate_middlebury(forward, resolution="H", data_root="data/Middlebury", maxdisp=192, divide_factor=32):
    """tools/evaluate_stereo.py:216-275 (final print NameError fixed)."""
    ds = Middlebury(None, root=data_root, resolution=resolution)
    _require_frames(ds, data_root)
    out_list, epe_list = [], []
    for i in range(len(ds)):
        img1, img2, flow_gt, valid_gt = ds.get_sample(i)
        occ = np.array(
            readers.read_gen(ds.image_list[i][0].replace("im0.png", "mask0nocc.png")).convert("L"),
            dtype=np.float32,
        )
        pred, _ = _run_one(forward, img1, img2, divide_factor)
        epe = np.abs(pred - flow_gt)
        val = (valid_gt >= 0.5) & (flow_gt > -maxdisp) & (flow_gt < 0) & (occ == 255)
        epe_list.append(epe[val].mean())
        out_list.append((epe > 2.0)[val].mean())
    return {
        f"middlebury{resolution}-epe": float(np.mean(epe_list)),
        f"middlebury{resolution}-d1": 100 * float(np.mean(out_list)),
    }


def validate_booster(forward, resolution="Q", data_root="data/Booster_dataset", maxdisp=192, divide_factor=32):
    """tools/evaluate_stereo.py:279-336."""
    ds = Booster(None, root=data_root, resolution=resolution)
    _require_frames(ds, data_root)
    out_list, epe_list = [], []
    for i in range(len(ds)):
        img1, img2, flow_gt, valid_gt = ds.get_sample(i)
        pred, _ = _run_one(forward, img1, img2, divide_factor)
        epe = np.abs(pred - flow_gt)
        val = (valid_gt >= 0.5) & (flow_gt > -maxdisp) & (flow_gt < 0)
        epe_list.append(epe[val].mean())
        out_list.append((epe > 2.0)[val].mean())
    return {
        "Booster-epe": float(np.mean(epe_list)),
        "Booster-d1": 100 * float(np.mean(out_list)),
    }
