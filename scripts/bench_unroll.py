"""A/B: RAFT headline bench at scan_unroll 1 vs 2 vs 4 (single chip).

The scan body is compiled once per unroll factor; unrolling k iterations per
scan step removes (k-1)/k of the loop's fixed overhead (carry shuffling,
~1 ms/iter measured in round 1) at the cost of a k× larger step program.
Prints one JSON line per variant.

Run: nohup python scripts/bench_unroll.py > /tmp/bench_unroll.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, ".")
    import dataclasses

    import bench

    bench._enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig

    B, H, W = 1, 736, 1280
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))

    base = RAFTStereoConfig(corr_implementation="reg_cuda", pallas_encoder=True)
    params = None
    for k in (1, 2, 4):
        cfg = dataclasses.replace(base, scan_unroll=k)
        model = RAFTStereo(cfg, iters=32, test_mode=True)
        if params is None:
            params = model.init(
                jax.random.PRNGKey(0), jnp.zeros((B, 64, 64, 3)), jnp.zeros((B, 64, 64, 3))
            )

        fwd = jax.jit(lambda p, a, b, m=model: m.apply(p, a, b)[1])
        for _ in range(3):
            out = np.asarray(fwd(params, img1, img2))
        # adoption gate: unrolling shares the same step submodule/params, so
        # the disparity must be BIT-identical to the k=1 run
        if k == 1:
            ref_out = out
            max_abs = 0.0
        else:
            max_abs = float(np.max(np.abs(out - ref_out)))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(10):
                out = fwd(params, img1, img2)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / 10)
        print(
            json.dumps(
                {
                    "scan_unroll": k,
                    "fps": round(1.0 / best, 3),
                    "max_abs_vs_unroll1": max_abs,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
