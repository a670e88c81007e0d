"""IGEV-Stereo stage profiler (single chip, 736x1280 eval geometry).

Times each fixed-cost stage in isolation plus the GRU loop scanned x32 with
a real carry dependency, using the scalar-output protocol (the axon tunnel
download would otherwise dominate). Prints one JSON line per measurement.

Run: nohup python scripts/profile_igev.py > /tmp/profile_igev.log 2>&1 &
(first compiles take minutes on axon — poll the log).
"""

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
    return (time.perf_counter() - t0) / reps * 1000  # ms


def main():
    sys.path.insert(0, ".")
    smoke = "--cpu-smoke" in sys.argv
    import jax

    if smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dkt_stereo_tpu.nn.igev_blocks import (
        BasicConvIGEV,
        FeatureAtt,
        HourglassIGEV,
        IGEVFeature,
    )
    from dkt_stereo_tpu.nn.conv3d import thin_conv3d
    from dkt_stereo_tpu.nn.igev_update import BasicMultiUpdateBlockIGEV
    from dkt_stereo_tpu.ops.volumes import build_gwc_volume, disparity_regression

    dt = jnp.bfloat16
    B, H, W = (1, 64, 128) if smoke else (1, 736, 1280)
    H4, W4 = H // 4, W // 4
    H8, W8 = H // 8, W // 8
    H16, W16 = H // 16, W // 16
    H32, W32 = H // 32, W // 32
    D4 = 48
    R = 4
    interpret = smoke
    rng = np.random.default_rng(0)

    def arr(*shape, d=dt):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(d)

    def scalar(tree):
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(tree))

    results = {}
    img = arr(B, H, W, 3)

    # --- feature trunk (both views) ---
    feat = IGEVFeature(True, dt)
    fp = feat.init(jax.random.PRNGKey(0), img)

    @jax.jit
    def run_feature(x1, x2):
        return scalar((feat.apply(fp, x1), feat.apply(fp, x2)))

    results["feature_x2"] = timeit(run_feature, img, arr(B, H, W, 3))

    feats = [arr(B, H4, W4, 96), arr(B, H8, W8, 64), arr(B, H16, W16, 192), arr(B, H32, W32, 160)]

    # --- GWC volume build ---
    ml, mr = arr(B, H4, W4, 96), arr(B, H4, W4, 96)

    @jax.jit
    def run_gwc(ml, mr):
        return scalar(build_gwc_volume(ml, mr, D4, 8).astype(dt))

    results["gwc_build"] = timeit(run_gwc, ml, mr)

    # --- corr_stem + FeatureAtt ---
    gwc = arr(B, D4, H4, W4, 8)
    stem = BasicConvIGEV(8, False, 3, "batch", True, 3, 1, 1, True, dt)
    sp = stem.init(jax.random.PRNGKey(0), gwc)
    att = FeatureAtt(8, True, dt)
    ap = att.init(jax.random.PRNGKey(0), gwc, feats[0])

    @jax.jit
    def run_stem_att(gwc, f0):
        return scalar(att.apply(ap, stem.apply(sp, gwc), f0))

    results["corr_stem_att"] = timeit(run_stem_att, gwc, feats[0])

    # --- hourglass ---
    hg = HourglassIGEV(8, True, dt)
    hp = hg.init(jax.random.PRNGKey(0), gwc, feats)

    @jax.jit
    def run_hg(gwc, feats):
        return scalar(hg.apply(hp, gwc, feats))

    results["hourglass"] = timeit(run_hg, gwc, feats)

    # --- classifier + init regression ---
    ck = arr(3, 3, 3, 8, 1, d=jnp.float32)

    @jax.jit
    def run_cls(geo):
        logits = thin_conv3d(geo, ck, None, dt)[..., 0]
        prob = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
        return scalar(disparity_regression(prob.transpose(0, 2, 3, 1), D4))

    results["classifier_init"] = timeit(run_cls, gwc)

    # --- GRU loop x32 (geo lookup + update block, test mode) ---
    from dkt_stereo_tpu.ops.pallas.geo_lookup import geo_lookup_pallas

    geo_pyr = (arr(B, H4, W4, D4, 8, d=jnp.bfloat16), arr(B, H4, W4, D4 // 2, 8, d=jnp.bfloat16))
    corr_pyr = (arr(B, H4, W4, W4, d=jnp.bfloat16), arr(B, H4, W4, W4 // 2, d=jnp.bfloat16))
    coords = jnp.broadcast_to(jnp.arange(W4, dtype=jnp.float32)[None, None, :, None], (B, H4, W4, 1))
    net = (arr(B, H4, W4, 128), arr(B, H8, W8, 128), arr(B, H16, W16, 128))
    inp = tuple(
        (arr(B, h, w, 128), arr(B, h, w, 128), arr(B, h, w, 128))
        for h, w in ((H4, W4), (H8, W8), (H16, W16))
    )
    disp0 = jnp.zeros((B, H4, W4, 1), jnp.float32) + 10.0

    ub = BasicMultiUpdateBlockIGEV(3, (128, 128, 128), dt)
    geo0 = geo_lookup_pallas(geo_pyr, corr_pyr, disp0, coords, R, interpret)
    up = ub.init(jax.random.PRNGKey(0), net, inp, geo0.astype(dt), disp0.astype(dt),
                 iter16=True, iter08=True)

    @jax.jit
    def run_loop(net, disp0):
        def step(c, _):
            net, disp = c
            geo = geo_lookup_pallas(geo_pyr, corr_pyr, disp, coords, R, interpret)
            net, mask_feat, delta = ub.apply(up, net, inp, geo.astype(dt), disp.astype(dt),
                                             iter16=True, iter08=True)
            return (net, disp + delta.astype(jnp.float32)), ()

        out, _ = jax.lax.scan(step, (net, disp0), None, length=32)
        return scalar(out)

    results["gru_loop_x32"] = timeit(run_loop, net, disp0)

    # lookup alone x32
    @jax.jit
    def run_lookup(disp0):
        def step(d, _):
            geo = geo_lookup_pallas(geo_pyr, corr_pyr, d, coords, R, interpret)
            return d + jnp.mean(geo, axis=-1, keepdims=True) * 1e-6, ()

        out, _ = jax.lax.scan(step, disp0, None, length=32)
        return scalar(out)

    results["geo_lookup_x32"] = timeit(run_lookup, disp0)

    for k, v in results.items():
        print(json.dumps({"stage": k, "ms": round(float(v), 2)}), flush=True)

    if not smoke:
        with open("IGEV_PROF_r05.json", "w") as f:
            json.dump(
                {
                    "protocol": "per-stage isolation at eval geometry "
                    "(736x1280, 32 iters, test mode), scalar-output sync. "
                    "Reference: meta_arch/igev_stereo/igev_stereo.py:120-222.",
                    "stages_ms": {k: round(float(v), 2) for k, v in results.items()},
                },
                f,
                indent=1,
            )
        print("wrote IGEV_PROF_r05.json", flush=True)


if __name__ == "__main__":
    main()
