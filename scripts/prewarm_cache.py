"""Pre-warm the persistent XLA compile cache for the driver bench.

Runs exactly the forward that ``bench.py`` times (same config file, same
shapes, same dtypes) so its compiled executable lands in ``.jax_cache/``.
Run this after ANY change to kernel/model code that could invalidate the
cache — the driver's end-of-round ``python bench.py`` must never pay a cold
Mosaic/XLA compile (round 3 lost its perf artifact that way, BENCH_r03.json
rc 124).

Usage: python scripts/prewarm_cache.py  (takes minutes when cold, seconds
when already warm; prints the compile wall time so warmness is auditable).
"""

from __future__ import annotations

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import bench

    bench._enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from dkt_stereo_tpu.cli.config import load_model_config
    from dkt_stereo_tpu.models import get_model

    config = load_model_config("configs/raft_stereo/pallas.json")
    model_cls, cfg_cls, _ = get_model(config["model"])
    cfg = cfg_cls.from_dict(config)
    model = model_cls(cfg, iters=32, test_mode=True)

    B, H, W = 1, 736, 1280
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, 64, 64, 3)), jnp.zeros((B, 64, 64, 3))
    )

    @jax.jit
    def forward(params, img1, img2):
        _, disp = model.apply(params, img1, img2)
        return disp

    t0 = time.perf_counter()
    np.asarray(forward(params, img1, img2))
    print(f"prewarm: first forward (compile+run) {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    np.asarray(forward(params, img1, img2))
    print(f"prewarm: steady-state forward {time.perf_counter() - t0:.3f}s")


if __name__ == "__main__":
    main()
