"""Microbenchmarks for the fnet full-res stage + GRU iteration cost.

Explores TPU-friendlier formulations of the stride-1 full-resolution convs
(the frame-budget ceiling, docs/PERF.md): space-to-depth polyphase
re-expression, channel padding, dtype. One JSON line per experiment.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def timeit(fn, *args, reps=10, warm=2):
    import jax

    for _ in range(warm):
        np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    B, H, W = 2, 736, 1280
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    x64 = jnp.asarray(rng.standard_normal((B, H, W, 64)).astype(np.float32)).astype(dt)
    k64 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)).astype(np.float32)).astype(dt)

    def conv(x, k, stride=1):
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    # baseline: 3x3 64->64 stride-1 at full res (the layer1 conv)
    f = jax.jit(lambda x, k: jnp.sum(conv(x, k).astype(jnp.float32)))
    r = {"exp": "conv3x3_64_fullres", "ms": timeit(f, x64, k64)}
    print(json.dumps(r), flush=True)

    # space-to-depth equivalent shape: 2x2 256->256 at quarter area
    xs2d = jnp.asarray(
        rng.standard_normal((B, H // 2, W // 2, 256)).astype(np.float32)
    ).astype(dt)
    ks2d = jnp.asarray(rng.standard_normal((2, 2, 256, 256)).astype(np.float32)).astype(dt)
    f = jax.jit(lambda x, k: jnp.sum(conv(x, k).astype(jnp.float32)))
    print(json.dumps({"exp": "conv2x2_256_s2d", "ms": timeit(f, xs2d, ks2d)}), flush=True)

    # 3x3 256->256 at quarter area (4x the FLOPs of baseline)
    k3 = jnp.asarray(rng.standard_normal((3, 3, 256, 256)).astype(np.float32)).astype(dt)
    print(json.dumps({"exp": "conv3x3_256_quarter", "ms": timeit(f, xs2d, k3)}), flush=True)

    # channel-padded baseline: 3x3 128->128 at full res (4x FLOPs of baseline)
    x128 = jnp.asarray(rng.standard_normal((B, H, W, 128)).astype(np.float32)).astype(dt)
    k128 = jnp.asarray(rng.standard_normal((3, 3, 128, 128)).astype(np.float32)).astype(dt)
    print(json.dumps({"exp": "conv3x3_128_fullres", "ms": timeit(f, x128, k128)}), flush=True)

    # 7x7 stem s1: 3->64 full res
    x3 = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32)).astype(dt)
    k7 = jnp.asarray(rng.standard_normal((7, 7, 3, 64)).astype(np.float32)).astype(dt)
    print(json.dumps({"exp": "conv7x7_3to64_fullres", "ms": timeit(f, x3, k7)}), flush=True)

    # stem as s2d: 4x4 12->256 at half res (equiv content, off-by-phase)
    x12 = jnp.asarray(
        rng.standard_normal((B, H // 2, W // 2, 12)).astype(np.float32)
    ).astype(dt)
    k4 = jnp.asarray(rng.standard_normal((4, 4, 12, 256)).astype(np.float32)).astype(dt)
    print(json.dumps({"exp": "conv4x4_12to256_s2d_stem", "ms": timeit(f, x12, k4)}), flush=True)

    # instance-norm cost at full res, 64 ch
    def inorm(x):
        m = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
        c = x - m.astype(x.dtype)
        v = jnp.mean(c * c, axis=(1, 2), keepdims=True, dtype=jnp.float32)
        return jnp.sum((c * jax.lax.rsqrt(v + 1e-5).astype(x.dtype)).astype(jnp.float32))

    print(json.dumps({"exp": "instance_norm_64_fullres", "ms": timeit(jax.jit(inorm), x64)}), flush=True)

    # GRU-iteration-shaped convs: 1/4 res 184x320
    Hc, Wc = H // 4, W // 4
    xg = jnp.asarray(rng.standard_normal((1, Hc, Wc, 256)).astype(np.float32)).astype(dt)
    kg = jnp.asarray(rng.standard_normal((3, 3, 256, 256)).astype(np.float32)).astype(dt)
    print(json.dumps({"exp": "conv3x3_256_quarterres_b1", "ms": timeit(f, xg, kg)}), flush=True)


if __name__ == "__main__":
    main()
