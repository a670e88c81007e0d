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

    # --- per-call dispatch floor (axon tunnel) ---
    # a single bare jit call costs ~5-6 ms of host-side dispatch that
    # CANNOT overlap for these one-op stage probes (measured: one 4096^3
    # bf16 matmul = 137 GF times at ~6.2 ms = 22 TF/s vs the 134.8 TF/s
    # the same matmul sustains inside a chained loop). Every stage number
    # below carries ~this floor; whole-model numbers are honest because
    # dispatch overlaps the ~200 ms of device compute.
    tiny = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def run_tiny(t):
        return jnp.sum(t)

    results["dispatch_floor"] = timeit(run_tiny, tiny)

    # --- feature trunk (both views) ---
    feat = IGEVFeature(True, dt)
    fp = feat.init(jax.random.PRNGKey(0), img)

    @jax.jit
    def run_feature(x1, x2):
        return scalar((feat.apply(fp, x1), feat.apply(fp, x2)))

    results["feature_x2"] = timeit(run_feature, img, arr(B, H, W, 3))

    # --- feature trunk, both views as ONE batch-2 call (round-5 model path)
    @jax.jit
    def run_feature_b2(x12):
        return scalar(feat.apply(fp, x12))

    results["feature_b2"] = timeit(run_feature_b2, arr(2 * B, H, W, 3))

    # --- context encoder ---
    from dkt_stereo_tpu.nn.blocks import MultiBasicEncoder

    cnet = MultiBasicEncoder(
        output_dim=((128, 128, 128), (128, 128, 128)), norm_fn="batch",
        downsample=2, num_layers=3, dtype=dt,
    )
    cp = cnet.init(jax.random.PRNGKey(0), jnp.zeros((B, 64, 64, 3), dt))

    @jax.jit
    def run_cnet(x):
        return scalar(cnet.apply(cp, x))

    results["cnet"] = timeit(run_cnet, img)

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

    # --- packed stages (round-5 depth-to-lane path; default agg_packed) ---
    from dkt_stereo_tpu.nn.conv3d_packed import conv3d_packed
    from dkt_stereo_tpu.ops.volumes import build_gwc_volume

    gwc_p = arr(B, H4, W4, D4, 8)

    @jax.jit
    def run_gwc_packed(ml, mr):
        return scalar(build_gwc_volume(ml, mr, D4, 8, layout="nhwdc").astype(dt))

    results["gwc_build_packed_layout"] = timeit(run_gwc_packed, ml, mr)

    stem_p = BasicConvIGEV(8, False, 3, "batch", True, 3, 1, 1, True, dt, True)
    spp = stem_p.init(jax.random.PRNGKey(0), gwc_p)
    att_p = FeatureAtt(8, True, dt, True)
    app = att_p.init(jax.random.PRNGKey(0), gwc_p, feats[0])

    @jax.jit
    def run_stem_att_packed(g, f0):
        return scalar(att_p.apply(app, stem_p.apply(spp, g), f0))

    results["corr_stem_att_packed"] = timeit(run_stem_att_packed, gwc_p, feats[0])

    hg_p = HourglassIGEV(8, True, dt, True)
    hpp = hg_p.init(jax.random.PRNGKey(0), gwc_p, feats)

    @jax.jit
    def run_hg_packed(g, feats):
        return scalar(hg_p.apply(hpp, g, feats))

    results["hourglass_packed"] = timeit(run_hg_packed, gwc_p, feats)

    from dkt_stereo_tpu.nn.conv3d_packed import thin_conv3d_packed

    @jax.jit
    def run_cls_packed(geo):
        logits = thin_conv3d_packed(geo, ck, 1, 1, dt)  # shipped packed path
        prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return scalar(disparity_regression(prob, D4))

    results["classifier_init_packed"] = timeit(run_cls_packed, gwc_p)

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
