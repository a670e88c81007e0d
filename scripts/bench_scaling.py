"""DP scaling evidence → SCALING_r05.json (BASELINE.md: ≥85% DP efficiency).

Round-2's single-shot virtual-mesh ratios were dominated by XLA-CPU
scheduling noise (sub-1.0 "overheads"); this version produces evidence that
holds up:

1. **Virtual-mesh wiring check, with statistics**: the sharded n-device DKT
   step vs the unsharded 1-device step at the SAME global batch runs the
   same FLOPs on the same silicon, so the ratio isolates partitioning +
   gradient-psum overhead — but on shared CPU cores it is noisy, so each
   configuration is timed ``reps`` times and the MEDIAN with IQR is
   reported. This validates that the sharded program is not structurally
   slower; it is NOT an efficiency projection.

2. **Analytic collective-cost bound for the real topology** (the scaling
   projection): DP all-reduces exactly one gradient per step — ``2·P·(N−1)/N``
   bytes per chip on a bidirectional ring. With the step's measured
   single-chip compute time (REMAT_r03.json, reference train geometry) and
   the v5e ICI figures, projected efficiency = t_comp / (t_comp + t_ar),
   conservatively assuming ZERO overlap of the all-reduce with backward
   compute (XLA in fact overlaps it). Cross-host (DCN) rows use the
   per-host NIC bound with all 8 ICI-attached chips sharing it.

Run:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py            # writes SCALING_r05.json
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# v5e figures (jax-ml.github.io/scaling-book, "TPU v5e"): 1.97e14 bf16
# FLOP/s peak per chip; ICI one-way 4.5e10 B/s per link, 2 links usable by a
# 1-D all-reduce ring (bidirectional) => 9e10 B/s effective; 8 chips per
# host sharing a DCN NIC at 2.5e10 B/s. Sensitivity rows at 0.5x/2x cover
# figure uncertainty.
V5E = {
    "peak_bf16_flops": 1.97e14,
    "measured_matmul_flops": 1.348e14,  # docs/PERF.md chip calibration
    "ici_allreduce_Bps": 9.0e10,
    "dcn_per_host_Bps": 2.5e10,
    "chips_per_host": 8,
}


def _virtual_overhead(results: dict):
    import jax

    from dkt_stereo_tpu.models import RAFTStereoConfig
    from dkt_stereo_tpu.parallel import make_mesh, replicate, shard_batch
    from dkt_stereo_tpu.train import DKTHyperParams, create_dkt_state, make_dkt_train_step

    n_dev = len(jax.devices())
    cfg = RAFTStereoConfig(mixed_precision=False)
    hyper = DKTHyperParams(train_iters=4, teacher_iters=4, num_steps=1000)
    H, W = 96, 160
    rng = np.random.default_rng(0)
    reps = 5

    def make_batch(B):
        return {
            "img1": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
            "img2": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
            "img1_clean": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
            "img2_clean": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
            "flow": -rng.uniform(0, 20, (B, H, W)).astype(np.float32),
            "valid": np.ones((B, H, W), np.float32),
        }

    def times(n_mesh, B):
        mesh = make_mesh(n_mesh)
        state = create_dkt_state(cfg, hyper, jax.random.PRNGKey(0), (B, H, W))
        state = replicate(state, mesh)
        batch = shard_batch(make_batch(B), mesh)
        step_fn = make_dkt_train_step(cfg, hyper)
        key = jax.random.PRNGKey(1)
        s, m = step_fn(state, batch, key)  # compile + warm
        float(m["loss"])
        out = []
        for _ in range(reps):
            t0 = time.perf_counter()
            s, m = step_fn(s, batch, key)
            float(m["loss"])
            out.append(time.perf_counter() - t0)
        return np.asarray(out)

    rows = []
    for n in (2, 4, 8):
        if n > n_dev:
            continue
        B = n  # per-device batch 1 — fixed per-device work across rows
        t_sharded = times(n, B)
        t_dense = times(1, B)
        med_s, med_d = float(np.median(t_sharded)), float(np.median(t_dense))
        rows.append({
            "devices": n,
            "global_batch": B,
            "sharded_ms": {
                "median": round(med_s * 1e3, 1),
                "iqr": [round(float(np.percentile(t_sharded, q)) * 1e3, 1) for q in (25, 75)],
                "reps": reps,
            },
            "dense_1dev_ms": {
                "median": round(med_d * 1e3, 1),
                "iqr": [round(float(np.percentile(t_dense, q)) * 1e3, 1) for q in (25, 75)],
                "reps": reps,
            },
            "overhead_median": round(med_s / med_d, 3),
        })
        print(json.dumps(rows[-1]), flush=True)
    results["virtual_mesh_overhead"] = {
        "protocol": "sharded n-device DKT step vs unsharded 1-device step, "
                    "SAME global batch (same FLOPs, same silicon); median of "
                    f"{reps} reps with IQR. Validates the sharded program "
                    "introduces no structural slowdown; NOT an efficiency "
                    "projection (virtual devices share 4 CPU cores).",
        "config": {"model": "RAFTStereo", "train_iters": 4, "teacher_iters": 4,
                   "H": H, "W": W, "per_device_batch": 1},
        "rows": rows,
    }


def _analytic(results: dict):
    """Collective-cost bound: grad bytes vs step compute at train geometry."""
    import jax
    import jax.numpy as jnp

    from dkt_stereo_tpu.models import RAFTStereoConfig, RAFTStereo
    from dkt_stereo_tpu.train import DKTHyperParams, create_dkt_state

    cfg = RAFTStereoConfig(mixed_precision=False)
    hyper = DKTHyperParams(train_iters=16, teacher_iters=32, num_steps=1000)
    state = create_dkt_state(cfg, hyper, jax.random.PRNGKey(0), (1, 64, 64))
    p_bytes = sum(
        int(np.prod(x.shape)) * 4 for x in jax.tree_util.tree_leaves(state.params["params"])
    )
    p_count = p_bytes // 4

    # step FLOPs at the reference train geometry (batch 8, 320x704,
    # student 16 iters + two teachers at 32): XLA HLO cost analysis of the
    # lowered train step (trace only — no run)
    from dkt_stereo_tpu.train import make_dkt_train_step

    B, H, W = 8, 320, 704
    batch = {
        k: jnp.zeros((B, H, W, 3), jnp.float32)
        for k in ("img1", "img2", "img1_clean", "img2_clean")
    }
    batch["flow"] = jnp.zeros((B, H, W), jnp.float32)
    batch["valid"] = jnp.ones((B, H, W), jnp.float32)
    step_fn = make_dkt_train_step(cfg, hyper)
    flops = None
    try:
        lowered = step_fn.lower(state, batch, jax.random.PRNGKey(1))
        ca = lowered.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)

    # measured single-chip step time at the same geometry (chip evidence).
    # Source order: the SHIPPED recipe's measured step (TRAIN_PROF:
    # batched-teachers + Pallas corr + fused encoder — what a user actually
    # runs), then the remat-row step from REMAT_rN. Round-3's artifact
    # amortized against the 13.4 s pre-Pallas step, 10x stale by round 4;
    # recording the source makes that staleness visible in the artifact.
    step_ms, step_src = None, None
    for art in ("TRAIN_PROF_r05.json",):
        if step_ms is not None or not os.path.exists(art):
            continue
        try:
            rows = json.load(open(art))
            pref = [
                "shipped_recipe_attrib",  # configs/raft_stereo/train.json as shipped
                "pallas_corr",
                "pallas_corr_enc",
            ]
            by_label = {r.get("config"): r for r in rows if "full_step_ms" in r}
            for label in pref:
                if label in by_label:
                    step_ms = float(by_label[label]["full_step_ms"])
                    step_src = f"{art}:{label}"
                    break
        except Exception as e:
            print(f"{art} unreadable: {e}", file=sys.stderr)
    for art in ("REMAT_r04.json", "REMAT_r03.json"):
        if step_ms is not None or not os.path.exists(art):
            continue
        try:
            rem = json.load(open(art))
            rows = rem if isinstance(rem, list) else rem.get("rows", rem.get("results", []))
            # prefer the remat=True row: the shipped training recipe
            # remats, so the remat step IS the real single-chip step time
            for r in sorted(
                (r for r in rows if r.get("model") == "RAFTStereo" and "step_ms" in r),
                key=lambda r: not r.get("remat"),
            ):
                step_ms = float(r["step_ms"])
                step_src = f"{art}:remat_row"
                break
        except Exception as e:
            print(f"{art} unreadable: {e}", file=sys.stderr)
    if step_ms is None and flops:
        # fall back to the FLOP estimate at the measured matmul rate — an
        # UNDERestimate of step time (bandwidth-bound ops run below it), so
        # an OVERestimate of communication share: still a valid lower bound
        # on efficiency
        step_ms = flops / V5E["measured_matmul_flops"] * 1e3

    grad_bytes = p_bytes  # one fp32 gradient all-reduce per step
    rows = []
    for n_chips, medium, bw in (
        (8, "ici", V5E["ici_allreduce_Bps"]),
        (16, "ici", V5E["ici_allreduce_Bps"]),
        (64, "ici", V5E["ici_allreduce_Bps"]),
        (256, "ici+dcn", V5E["dcn_per_host_Bps"] / V5E["chips_per_host"]),
    ):
        for scale, label in ((1.0, "nominal"), (0.5, "bandwidth_half")):
            t_ar_ms = 2 * grad_bytes * (n_chips - 1) / n_chips / (bw * scale) * 1e3
            eff = step_ms / (step_ms + t_ar_ms) if step_ms else None
            rows.append({
                "chips": n_chips,
                "medium": medium,
                "assumption": label,
                "allreduce_ms": round(t_ar_ms, 3),
                "step_ms_measured": round(step_ms, 1) if step_ms else None,
                "projected_dp_efficiency": round(eff, 4) if eff else None,
            })
    results["analytic_bound"] = {
        "protocol": "ring all-reduce cost 2·P·(N−1)/N bytes/chip vs the "
                    "measured single-chip DKT step time at reference train "
                    "geometry (batch 8, 320x704, student 16 iters + 2 "
                    "teachers at 32). Zero-overlap assumption (XLA overlaps "
                    "the gradient all-reduce with backward compute, so real "
                    "efficiency is HIGHER). DCN row: 8 chips share one host "
                    "NIC.",
        "hardware_model": V5E,
        "param_count": p_count,
        "grad_bytes_fp32": grad_bytes,
        "step_flops_cost_analysis": flops,
        "step_ms_source": step_src,
        "rows": rows,
    }
    for r in rows:
        print(json.dumps(r), flush=True)


def main():
    sys.path.insert(0, ".")
    # the axon plugin ignores the JAX_PLATFORMS env var (CLAUDE.md) — force
    # the CPU backend programmatically so this never grabs the chip, and
    # request the 8 virtual devices before jax initializes
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    results = {}
    _analytic(results)
    _virtual_overhead(results)
    ok = all(
        (r["projected_dp_efficiency"] or 0) >= 0.85
        for r in results["analytic_bound"]["rows"]
        if r["projected_dp_efficiency"] is not None
    )
    results["conclusion"] = {
        "baseline_target": ">=85% DP efficiency",
        "met_under_all_assumptions": ok,
        "basis": "analytic_bound rows (measured compute, zero-overlap "
                 "collective model, half-bandwidth sensitivity included)",
        "caveat": "the efficiency projection amortizes the all-reduce "
                  "against the MEASURED single-chip step time; a faster "
                  "step shrinks the margin proportionally (e.g. a ~2 s "
                  "step against the worst-case 3.5 ms all-reduce still "
                  "projects >99.8%, so the >=85% conclusion survives any "
                  "realistic step-time improvement, but the headroom "
                  "quoted in the rows is conditional on the step time "
                  "they cite)",
    }
    out_path = sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv else "SCALING_r05.json"
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"written": out_path, "met": ok}))


if __name__ == "__main__":
    main()
