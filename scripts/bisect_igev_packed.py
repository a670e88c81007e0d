"""Bisect the round-5 packed-IGEV regression: fixed cost vs per-iter slope,
packed vs direct (one JSON line per measurement)."""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def timeit(fn, *args, reps=3, warm=2):
    import jax

    for _ in range(warm):
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps * 1000


def main():
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    from dkt_stereo_tpu.models import IGEVStereo, IGEVStereoConfig

    B, H, W = 1, 736, 1280
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))

    for packed in (True, False):
        cfg = IGEVStereoConfig(corr_implementation="reg_cuda", agg_packed=packed)
        params = None
        for iters in (2, 32):
            model = IGEVStereo(cfg, iters=iters, test_mode=True)
            if params is None:
                params = model.init(
                    jax.random.PRNGKey(0), jnp.zeros((B, 64, 64, 3)), jnp.zeros((B, 64, 64, 3))
                )
            fwd = jax.jit(lambda p, a, b, m=model: jnp.sum(m.apply(p, a, b)[1]))
            ms = timeit(fwd, params, img1, img2)
            print(json.dumps({"packed": packed, "iters": iters, "ms": round(ms, 1)}), flush=True)


if __name__ == "__main__":
    main()
