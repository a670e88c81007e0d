"""Data-parallel scaling benchmark (BASELINE.md: ≥85% DP efficiency).

Measures the jitted DKT train step at a fixed per-device batch over meshes of
1, 2, 4, ... devices and reports samples/s + efficiency vs linear scaling.
With one real TPU chip available, run on the virtual CPU mesh for the
collective-overhead shape check:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py

Prints one JSON line per mesh size.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, ".")
    import jax

    from dkt_stereo_tpu.models import RAFTStereoConfig
    from dkt_stereo_tpu.parallel import make_mesh, replicate, shard_batch
    from dkt_stereo_tpu.train import DKTHyperParams, create_dkt_state, make_dkt_train_step

    n_dev = len(jax.devices())
    cfg = RAFTStereoConfig(
        mixed_precision=jax.default_backend() != "cpu",
        context_norm="instance",
    )
    hyper = DKTHyperParams(train_iters=4, teacher_iters=4, num_steps=1000)
    per_device = 1
    H, W = 96, 160

    rng = np.random.default_rng(0)
    results = []
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    base_rate = None
    for n in sizes:
        mesh = make_mesh(n)
        B = per_device * n
        state = create_dkt_state(cfg, hyper, jax.random.PRNGKey(0), (B, H, W))
        state = replicate(state, mesh)
        batch = {
            "img1": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
            "img2": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
            "img1_clean": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
            "img2_clean": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
            "flow": -rng.uniform(0, 20, (B, H, W)).astype(np.float32),
            "valid": np.ones((B, H, W), np.float32),
        }
        batch = shard_batch(batch, mesh)
        step_fn = make_dkt_train_step(cfg, hyper)
        key = jax.random.PRNGKey(1)
        state, m = step_fn(state, batch, key)  # compile
        float(m["loss"])
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            state, m = step_fn(state, batch, key)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / reps
        rate = B / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        rec = {
            "metric": "dp_scaling",
            "devices": n,
            "samples_per_sec": round(rate, 3),
            "step_ms": round(dt * 1000, 1),
            "efficiency": round(eff, 3),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    return results


if __name__ == "__main__":
    main()
