"""Inference throughput for every model in the zoo at 736x1280 (single chip,
reference eval protocols: 32 GRU iterations for the iterative models
(tools/evaluate_stereo.py:128-133 timing semantics: warm-up excluded,
device-synced), single shot for GWCNet/CGI). Prints one JSON line per model
and writes BENCH_MODELS_r05.json."""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    from dkt_stereo_tpu.models import (
        CGIStereo, CGIStereoConfig, GWCNet, GWCNetConfig,
        IGEVStereo, IGEVStereoConfig, PCVNet, PCVNetConfig,
        RAFTStereo, RAFTStereoConfig,
    )

    B, H, W = 1, 736, 1280
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))

    cases = [
        ("RAFTStereo", RAFTStereo, RAFTStereoConfig(corr_implementation="reg_cuda", pallas_encoder=True), 32),
        ("IGEVStereo", IGEVStereo, IGEVStereoConfig(corr_implementation="reg_cuda"), 32),
        ("CGI_Stereo", CGIStereo, CGIStereoConfig(), 0),
        ("GWCNet", GWCNet, GWCNetConfig(), 0),
        ("PCVNet", PCVNet, PCVNetConfig(valid_iters=32, corr_implementation="reg_cuda"), 32),
    ]
    # optional positional filter: `python scripts/bench_models.py IGEVStereo`
    # benches one model (rows merge into the artifact, others preserved)
    only = next((a for a in sys.argv[1:] if not a.startswith("-")), None)
    if only:
        cases = [c for c in cases if c[0] == only]

    rows = []
    for name, cls, cfg, iters in cases:
        try:
            model = cls(cfg, iters=iters, test_mode=True)
            params = model.init(jax.random.PRNGKey(0), jnp.zeros((B, 64, 64, 3)), jnp.zeros((B, 64, 64, 3)))
            fwd = jax.jit(lambda p, a, b: model.apply(p, a, b)[1])
            t0 = time.perf_counter()
            np.asarray(fwd(params, img1, img2))
            compile_s = time.perf_counter() - t0
            # two warm runs: the first post-compile call through the axon
            # tunnel can carry hundreds of ms of residual transfer skew
            # (measured: a single-warm IGEV run read 547 ms vs the true 200)
            for _ in range(2):
                np.asarray(fwd(params, img1, img2))
            # bench.py protocol: batches of 10 frames, best batch + overall
            # mean (reference warm-up-excluded FPS, tools/evaluate_stereo.py
            # :128-133; one device sync per batch amortizes the ~3.7 MB
            # disparity download through the axon tunnel over 10 frames)
            n, batches = 10, 3
            times = []
            for _ in range(batches):
                t0 = time.perf_counter()
                for _ in range(n):
                    out = fwd(params, img1, img2)
                np.asarray(out)
                times.append((time.perf_counter() - t0) / n)
            dt = min(times)
            rows.append({
                "model": name, "ms_per_frame": round(dt * 1000), "fps": round(1 / dt, 2),
                "mean_fps": round(n * batches / (n * sum(times)), 2),
                "iters": iters, "compile_s": round(compile_s, 1),
            })
            print(json.dumps(rows[-1]), flush=True)
            del params, fwd
        except Exception as e:  # keep the sweep going
            rows.append({"model": name, "error": str(e)[:200]})
            print(json.dumps(rows[-1]), flush=True)
    # merge with any existing artifact rows (single-model runs keep the rest)
    path = "BENCH_MODELS_r05.json"
    old_rows = []
    try:
        with open(path) as f:
            old_rows = json.load(f).get("rows", [])
    except Exception:
        pass
    done = {r.get("model") for r in rows}
    rows = [r for r in old_rows if r.get("model") not in done] + rows
    out = {
        "protocol": "736x1280 batch 1, reference eval timing semantics "
                    "(warm-up excluded, np.asarray device sync), mean of 5 "
                    "frames; perf-mode configs (Pallas kernels, bf16 "
                    "policy) as shipped in configs/*/pallas.json",
        "rows": rows,
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path}))


if __name__ == "__main__":
    main()
