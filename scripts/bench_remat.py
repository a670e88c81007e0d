"""Remat memory evidence: DKT train-step HBM with and without remat_iters.

``remat_iters`` (models/{raft_stereo,igev_stereo,pcvnet}.py) wraps the
scanned refinement step in ``nn.remat`` so the backward pass recomputes the
per-iteration activations instead of storing all ``train_iters`` of them —
the idiomatic XLA HBM-for-FLOPs trade (SURVEY.md §5 "long-context"; the
reference has no equivalent: its AMP is the only memory lever,
tools/ft_dkt.py:242-248).

This script compiles the FULL DKT train step (three forwards + backward,
train/dkt_step.py) at the reference's training geometry (batch 8 crop
320×704 per chip, train_iters 16 / teacher 32) for remat off/on and reports
XLA's compile-time ``memory_analysis()`` — peak temp allocation is exactly
the quantity remat trades — plus one executed step each way for a wall-clock
cost number. Writes REMAT_r03.json. Run on the real chip: nohup + poll
(compiles are minutes on axon).
"""

from __future__ import annotations

import json
import time

import numpy as np


def measure(name: str, remat: bool, B, H, W, results: list):
    import jax
    import jax.numpy as jnp

    from dkt_stereo_tpu.models import get_model
    from dkt_stereo_tpu.models.registry import make_loss_adapter
    from dkt_stereo_tpu.train import (
        DKTHyperParams,
        create_dkt_state,
        make_dkt_train_step,
    )

    hyper = DKTHyperParams(train_iters=16, teacher_iters=32, num_steps=1000)
    model_cls, cfg_cls, _ = get_model(name)
    cfg = cfg_cls.from_dict({"remat_iters": remat})

    rng = np.random.default_rng(0)
    batch = {
        "img1": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "img2": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "img1_clean": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "img2_clean": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "flow": jnp.asarray(-rng.uniform(0, 60, (B, H, W)).astype(np.float32)),
        "valid": jnp.ones((B, H, W), jnp.float32),
    }
    state = create_dkt_state(cfg, hyper, jax.random.PRNGKey(0), (B, H, W), model_cls=model_cls)
    step_fn = make_dkt_train_step(
        cfg, hyper, model_cls=model_cls, loss_adapter=make_loss_adapter(name, cfg)
    )

    rec = {"model": name, "remat": remat, "geometry": [B, H, W]}
    try:
        lowered = step_fn.lower(state, batch, jax.random.PRNGKey(1))
        compiled = lowered.compile()
    except Exception as e:
        # a compile-time HBM OOM without remat at the reference training
        # geometry IS the finding: the step does not fit on one chip at all
        import re

        m = re.search(r"Ran out of memory[^.]*\.[^.]*\.", str(e))
        rec["compile_error"] = (m.group(0) if m else f"{type(e).__name__}: {e}"[:400])
        results.append(rec)
        print(json.dumps(rec), flush=True)
        return
    mem = compiled.memory_analysis()
    rec.update(
        temp_bytes=int(getattr(mem, "temp_size_in_bytes", -1)),
        argument_bytes=int(getattr(mem, "argument_size_in_bytes", -1)),
        output_bytes=int(getattr(mem, "output_size_in_bytes", -1)),
    )

    try:
        new_state, metrics = compiled(state, batch, jax.random.PRNGKey(1))
        _ = np.asarray(metrics["loss"])  # axon: block_until_ready lies
        t0 = time.perf_counter()
        new_state, metrics = compiled(new_state, batch, jax.random.PRNGKey(2))
        loss = float(np.asarray(metrics["loss"]))
        rec["step_ms"] = (time.perf_counter() - t0) * 1000
        rec["loss"] = loss
        dev = jax.devices()[0]
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats:
            rec["peak_bytes_in_use"] = int(stats.get("peak_bytes_in_use", -1))
    except Exception as e:  # OOM without remat at this size IS the finding
        rec["run_error"] = f"{type(e).__name__}: {e}"[:400]

    results.append(rec)
    print(json.dumps(rec), flush=True)


def main():
    import sys

    sys.path.insert(0, ".")
    smoke = "--cpu-smoke" in sys.argv
    if smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
    results: list = []
    # reference default batch/crop (width /32); tiny under --cpu-smoke
    B, H, W = (1, 64, 96) if smoke else (8, 320, 704)
    # remat FIRST: device peak_bytes_in_use is monotonic per process, so the
    # smaller-footprint run must come first for its number to mean anything.
    families = ["RAFTStereo"] if smoke else ["RAFTStereo", "IGEVStereo"]
    for name in families:
        for remat in (True, False):
            measure(name, remat, B, H, W, results)
    if smoke:
        t_on, t_off = results[0]["temp_bytes"], results[1]["temp_bytes"]
        print(f"smoke: temp bytes remat on/off = {t_on}/{t_off}")
        return
    with open("REMAT_r03.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote REMAT_r03.json", flush=True)


if __name__ == "__main__":
    main()
