"""Isolate the depth-to-lane packed aggregation stages on chip (debugging
the round-5 packed path; prints one JSON line per stage)."""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def timeit(fn, *args, reps=5, warm=2):
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

    from dkt_stereo_tpu.nn.conv3d_packed import conv3d_packed, deconv3d_packed
    from dkt_stereo_tpu.nn.igev_blocks import BasicConvIGEV, FeatureAtt, HourglassIGEV

    dt = jnp.bfloat16
    B, H4, W4, D4, C = 1, 184, 320, 48, 8
    rng = np.random.default_rng(0)

    def arr(*shape, d=dt):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(d)

    def scalar(tree):
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(tree))

    x = arr(B, H4, W4, D4, C)
    results = {}

    # bare packed conv 8->8 (the corr_stem conv)
    k = arr(3, 3, 3, 8, 8, d=jnp.float32)

    @jax.jit
    def f_conv(x, k):
        return scalar(conv3d_packed(x, k, (1, 1, 1), (1, 1, 1), dt))

    results["packed_conv_8_8"] = timeit(f_conv, x, k)

    # packed stride-2 conv 8->16 (hourglass conv1_0)
    k2 = arr(3, 3, 3, 8, 16, d=jnp.float32)

    @jax.jit
    def f_conv_s2(x, k2):
        return scalar(conv3d_packed(x, k2, (2, 2, 2), (1, 1, 1), dt))

    results["packed_conv_s2_8_16"] = timeit(f_conv_s2, x, k2)

    # packed deconv 16->8 full-res (hourglass conv1_up)
    x24 = arr(B, 92, 160, 24, 16)
    kd = arr(4, 4, 4, 8, 16, d=jnp.float32)

    @jax.jit
    def f_deconv(x24, kd):
        return scalar(deconv3d_packed(x24, kd, (2, 2, 2), (1, 1, 1), (0, 0, 0), dt))

    results["packed_deconv_16_8"] = timeit(f_deconv, x24, kd)

    # full packed corr_stem + att
    feats = [arr(B, H4, W4, 96), arr(B, 92, 160, 64), arr(B, 46, 80, 192), arr(B, 23, 40, 160)]
    stem = BasicConvIGEV(8, False, 3, "batch", True, 3, 1, 1, True, dt, True)
    sp = stem.init(jax.random.PRNGKey(0), x)
    att = FeatureAtt(8, True, dt, True)
    ap = att.init(jax.random.PRNGKey(0), x, feats[0])

    @jax.jit
    def f_stem(x, f0):
        return scalar(att.apply(ap, stem.apply(sp, x), f0))

    results["packed_stem_att"] = timeit(f_stem, x, feats[0])

    # full packed hourglass
    hg = HourglassIGEV(8, True, dt, True)
    hp = hg.init(jax.random.PRNGKey(0), x, feats)

    @jax.jit
    def f_hg(x, feats):
        return scalar(hg.apply(hp, x, feats))

    results["packed_hourglass"] = timeit(f_hg, x, feats)

    for kk, v in results.items():
        print(json.dumps({"stage": kk, "ms": round(float(v), 2)}), flush=True)


if __name__ == "__main__":
    main()
