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
cost number.

Round-4 fix (VERDICT r3 weak #2): the r3 remat=false arms died with
``HTTP 500: tpu_compile_helper subprocess exit code 1`` — an infra crash,
not a clean XLA OOM — so the comparison had no counterfactual. Each arm now
(a) retries infra-flavored failures, (b) classifies the terminal failure as
``xla_oom`` (the genuine finding: the un-remat step does not fit) vs
``infra`` (compile-helper crash, no conclusion), and (c) on failure bisects
the batch 8→4→2→1 until BOTH arms compile, so temp_bytes remat-on/off is
actually compared at the largest common geometry. Writes REMAT_r04.json.
Run on the real chip: nohup + poll (compiles are minutes on axon).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _classify(err: str) -> str:
    """Name the failure mode: a genuine XLA OOM is a finding; an infra crash
    (axon compile-helper subprocess death, HTTP tunnel errors) is not."""
    low = err.lower()
    if "ran out of memory" in low or "resource_exhausted" in low or "oom" in low:
        return "xla_oom"
    if "tpu_compile_helper" in low or "http" in low or "subprocess" in low:
        return "infra"
    return "other"


def measure(name: str, remat: bool, B, H, W, results: list, retries: int = 2):
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
    # round 4: measure the SHIPPED training path (Pallas corr lookup w/
    # custom VJP + fused Pallas encoder — TRAIN_PROF_r04: 10× faster than
    # the r3 "reg" baseline, which is also what crashed the r3 remat=false
    # compiles). r3 remat=true rows used "reg"; not directly comparable.
    cfg = cfg_cls.from_dict(
        {"remat_iters": remat, "corr_implementation": "reg_cuda", "pallas_encoder": True}
    )

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
    compiled = None
    for attempt in range(retries + 1):
        try:
            lowered = step_fn.lower(state, batch, jax.random.PRNGKey(1))
            compiled = lowered.compile()
            break
        except Exception as e:
            # a compile-time HBM OOM without remat at the reference training
            # geometry IS the finding: the step does not fit on one chip.
            # An infra crash (r3's HTTP 500 compile-helper death) is NOT —
            # retry those, and name the failure mode either way.
            import re

            err = f"{type(e).__name__}: {e}"
            cause = _classify(err)
            m = re.search(r"Ran out of memory[^.]*\.[^.]*\.", err)
            rec["compile_error"] = m.group(0) if m else err[:400]
            rec["failure_cause"] = cause
            rec["attempt"] = attempt
            if cause == "xla_oom" or attempt == retries:
                results.append(rec)
                print(json.dumps(rec), flush=True)
                return rec
            print(json.dumps({"retrying": rec["compile_error"][:120]}), flush=True)
            time.sleep(20)
    rec.pop("compile_error", None)
    rec.pop("failure_cause", None)
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
        rec["failure_cause"] = _classify(rec["run_error"])

    results.append(rec)
    print(json.dumps(rec), flush=True)
    return rec


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
    summary = {}
    for name in families:
        # bisect batch until BOTH arms have temp_bytes at a common geometry,
        # so the remat counterfactual is measured, not assumed
        b = B
        while b >= 1:
            recs = [measure(name, remat, b, H, W, results) for remat in (True, False)]
            if all(r and "temp_bytes" in r for r in recs):
                on, off = recs
                summary[name] = {
                    "common_geometry": [b, H, W],
                    "temp_bytes_remat_on": on["temp_bytes"],
                    "temp_bytes_remat_off": off["temp_bytes"],
                    "temp_savings_ratio": off["temp_bytes"] / max(on["temp_bytes"], 1),
                    "step_ms_remat_on": on.get("step_ms"),
                    "step_ms_remat_off": off.get("step_ms"),
                }
                break
            failed = [r for r in recs if r and "temp_bytes" not in r]
            causes = {r.get("failure_cause", "other") for r in failed}
            if b == 1 or causes == {"infra"} and b <= B // 4:
                summary[name] = {
                    "unresolved": True,
                    "last_geometry": [b, H, W],
                    "failure_causes": sorted(causes),
                }
                break
            b //= 2
    if smoke:
        t_on, t_off = results[0]["temp_bytes"], results[1]["temp_bytes"]
        print(f"smoke: temp bytes remat on/off = {t_on}/{t_off}")
        return
    out = {"rows": results, "counterfactual": summary}
    with open("REMAT_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote REMAT_r04.json", flush=True)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
