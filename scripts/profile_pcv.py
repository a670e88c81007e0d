"""PCVNet stage profiler (single chip, 736x1280 eval geometry).

Splits the frame into fixed cost vs per-iteration cost by sweeping the
iteration count on the FULL model (test mode, reg_cuda lookup), then times
the per-iteration components in isolation (gaussian lookup, motion encoder,
parameter updater) scanned x32 with a carry dependency. Scalar-output
protocol (axon tunnel downloads poison timings). One JSON line per number.

Run: nohup python scripts/profile_pcv.py > /tmp/profile_pcv.log 2>&1 &
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

    from dkt_stereo_tpu.models import PCVNet, PCVNetConfig
    from dkt_stereo_tpu.nn.pcv import (
        BasicMotionEncoderPCV,
        ParametersUpdater,
        RefineNet,
        gaussian_corr_lookup_pallas,
    )

    dt = jnp.bfloat16
    B, H, W = (1, 64, 128) if smoke else (1, 736, 1280)
    H4, W4 = H // 4, W // 4
    G, S, L = 4, 9, 3
    interpret = smoke
    rng = np.random.default_rng(0)

    def arr(*shape, d=dt):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(d)

    def scalar(tree):
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(tree))

    results = {}
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))

    # per-call dispatch floor (axon tunnel): every isolated stage below
    # carries ~this; the full_itersN rows are one call each and honest
    # (docs/PERF.md round 5)
    @jax.jit
    def run_tiny(t):
        return jnp.sum(t)

    results["dispatch_floor"] = timeit(run_tiny, jnp.zeros((8, 128), jnp.float32))

    # --- full model at several iteration counts (fixed vs per-iter split) ---
    cfg = PCVNetConfig(corr_implementation="reg" if smoke else "reg_cuda")
    params = None
    for iters in (1, 8, 32):
        model = PCVNet(cfg, iters=iters, test_mode=True)
        if params is None:
            params = model.init(
                jax.random.PRNGKey(0), jnp.zeros((B, 64, 128, 3)), jnp.zeros((B, 64, 128, 3))
            )

        fwd = jax.jit(lambda p, a, b, m=model: scalar(m.apply(p, a, b)[1]))
        results[f"full_iters{iters}"] = timeit(fwd, params, img1, img2, reps=3)

    t1, t32 = results["full_iters1"], results["full_iters32"]
    results["per_iter_ms"] = (t32 - t1) / 31.0
    results["fixed_ms"] = t1 - results["per_iter_ms"]

    # --- gaussian lookup x32 ---
    pyramid = tuple(
        arr(B, H4, W4, W4 // (4**i), d=jnp.bfloat16) for i in range(L)
    )
    mu0 = jnp.broadcast_to(
        jnp.arange(W4, dtype=jnp.float32)[None, None, :, None], (B, H4, W4, G)
    ) * 0.5
    sig0 = jnp.full((B, H4, W4, G), 8.0, jnp.float32)

    @jax.jit
    def run_lookup(mu0, sig0):
        def step(c, _):
            mu, sig = c
            corr = gaussian_corr_lookup_pallas(pyramid, mu, sig, S, 4, interpret)
            return (mu + jnp.mean(corr, -1, keepdims=True) * 1e-6, sig), ()

        out, _ = jax.lax.scan(step, (mu0, sig0), None, length=32)
        return scalar(out)

    results["gauss_lookup_x32"] = timeit(run_lookup, mu0, sig0)

    # --- motion encoder x32 ---
    me = BasicMotionEncoderPCV(G, S, L, dt)
    corr0 = arr(B, H4, W4, L * G * S)
    mu_f = mu0.astype(dt)
    mp = me.init(jax.random.PRNGKey(0), mu_f, corr0, mu_f, mu_f)

    @jax.jit
    def run_me(mu, corr):
        def step(m, _):
            out = me.apply(mp, m, corr, m, m)
            return m + jnp.mean(out, -1, keepdims=True).astype(m.dtype) * 0, ()

        out, _ = jax.lax.scan(step, mu, None, length=32)
        return scalar(out)

    results["motion_x32"] = timeit(run_me, mu_f, corr0)

    # --- full update block x32 (slow-fast 3-call sequence, mask head off):
    # encoder + gru16x3 + gru08x2 + gru04 + updater + cross-scale glue ---
    from dkt_stereo_tpu.nn.pcv import BasicMultiUpdateBlockPCV

    H8, W8, H16, W16 = H // 8, W // 8, H // 16, W // 16
    fdm = BasicMultiUpdateBlockPCV(3, 2, (128, 128, 128, 128), G, S, L, dt)
    net0 = (arr(B, H4, W4, 128), arr(B, H8, W8, 128), arr(B, H16, W16, 128))
    inp0 = tuple(
        (arr(B, h, w, 128), arr(B, h, w, 128), arr(B, h, w, 128))
        for h, w in ((H4, W4), (H8, W8), (H16, W16))
    )
    w0f = jnp.full((B, H4, W4, G), 0.25, jnp.float32)
    # init via the FULL call (all scales + updater + mask head) so the
    # param tree is the superset the update=False slow-fast calls reuse
    fdm_p = fdm.init(
        jax.random.PRNGKey(0), net0, inp0, corr0, mu=mu0, w=w0f, sigma=sig0,
        iter16=True, iter08=True, iter04=True,
    )

    @jax.jit
    def run_fdm(net, corr):
        def step(c, is_last):
            net, mu, sig, w = c
            n, mfl = fdm.apply(fdm_p, net, inp0, corr, mu, w=w, sigma=sig,
                               iter16=True, iter08=False, iter04=False, update=False)
            n, mfl = fdm.apply(fdm_p, n, inp0, corr, mu, w=w, sigma=sig,
                               iter16=True, iter08=True, iter04=False,
                               update=False, motion_features_list=mfl)
            n, mask, mu, sig, w = fdm.apply(
                fdm_p, n, inp0, corr, mu=mu, w=w, sigma=sig,
                iter16=True, iter08=True, iter04=True,
                motion_features_list=mfl, mask_pred=is_last,
            )
            return (n, mu, sig, w), ()

        is_last = jnp.arange(32) == 31
        out, _ = jax.lax.scan(step, (net, mu0, sig0, w0f), is_last)
        return scalar(out)

    results["update_block_x32"] = timeit(run_fdm, net0, corr0)

    # --- parameters updater (flow head + closed form) x32 ---
    pu = ParametersUpdater(G, dt)
    hid = arr(B, H4, W4, 128)
    w0 = jnp.full((B, H4, W4, G), 0.25, jnp.float32)
    pp = pu.init(jax.random.PRNGKey(0), hid, mu0, sig0, w0)

    @jax.jit
    def run_pu(hid, mu0, sig0, w0):
        def step(c, _):
            mu, sig, w = c
            mu, w, sig = pu.apply(pp, hid, mu, sig, w)
            return (mu, sig, w), ()

        out, _ = jax.lax.scan(step, (mu0, sig0, w0), None, length=32)
        return scalar(out)

    results["updater_x32"] = timeit(run_pu, hid, mu0, sig0, w0)

    # --- refinement (once) ---
    rn = RefineNet(G, dt)
    low_f = arr(B, H4, W4, 32)
    wq = jnp.full((B, H4, W4, G), 0.25, dt)
    dq = arr(B, H4, W4, 1)
    rp = rn.init(jax.random.PRNGKey(0), wq, wq, wq, dq, low_f)

    @jax.jit
    def run_rn(wq, dq, low_f):
        return scalar(rn.apply(rp, wq, wq, wq, dq, low_f))

    results["refine_once"] = timeit(run_rn, wq, dq, low_f)

    for k, v in results.items():
        print(json.dumps({"stage": k, "ms": round(float(v), 2)}), flush=True)

    if not smoke:
        import json as _json

        with open("PCV_PROF_r05.json", "w") as f:
            _json.dump(
                {
                    "protocol": "per-stage isolation at eval geometry "
                    "(736x1280, 32 iters, test mode, reg_cuda), scalar-output "
                    "sync; full-model iteration sweep gives the fixed/per-iter "
                    "split. Reference: meta_arch/pcvnet/model.py:75-196.",
                    "stages_ms": {k: round(float(v), 2) for k, v in results.items()},
                },
                f,
                indent=1,
            )
        print("wrote PCV_PROF_r05.json", flush=True)


if __name__ == "__main__":
    main()
