"""Fine-grained RAFT-Stereo frame-budget profiler (single chip, 736x1280).

Times each stage in isolation (own jit, np.asarray sync) plus iters=2 vs
iters=32 whole-model runs to separate fixed cost from per-iteration slope.
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def timeit(fn, *args, reps=5, warm=2):
    for _ in range(warm):
        np.asarray(jax_block(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax_block(out))
    return (time.perf_counter() - t0) / reps * 1000  # ms


def jax_block(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    return leaves[0]


def main():
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig
    from dkt_stereo_tpu.nn.blocks import BasicEncoder, MultiBasicEncoder
    from dkt_stereo_tpu.ops.corr import corr_pyramid, corr_volume

    # profiles the SHIPPED headline config (configs/raft_stereo/pallas.json):
    # fused Pallas encoder + exact IN stats. (The former --exact flag is
    # gone: fast_in_stats was dropped in round 2 when the fused encoder made
    # exact statistics free, so there is no fast/exact split to toggle.)
    cfg = RAFTStereoConfig(corr_implementation="reg_cuda", pallas_encoder=True)
    B, H, W = 1, 736, 1280
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    dt = cfg.compute_dtype
    x1 = (2.0 * (img1 / 255.0) - 1.0).astype(dt)
    x12 = jnp.concatenate([x1, x1], axis=0)

    results = {}

    # whole model at various iteration counts
    for iters in (2, 32):
        model = RAFTStereo(cfg, iters=iters, test_mode=True)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((B, 64, 64, 3)), jnp.zeros((B, 64, 64, 3))
        )
        # scalar output: returning the full-res disparity would time the
        # axon tunnel download (~3.7 MB), not the compute
        fwd = jax.jit(lambda p, a, b: jnp.sum(model.apply(p, a, b)[1]))
        results[f"model_iters{iters}"] = timeit(fwd, params, img1, img2)

    per_iter = (results["model_iters32"] - results["model_iters2"]) / 30.0
    results["per_iter"] = per_iter
    results["fixed_cost"] = results["model_iters2"] - 2 * per_iter

    # fnet alone (dual-image batch, as the model runs it; fused w2d chain)
    fnet = BasicEncoder(256, "instance", cfg.n_downsample, dtype=dt,
                        fused_fullres=cfg.pallas_encoder)
    fp = fnet.init(jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3), dt))
    f_fwd = jax.jit(lambda p, x: jnp.sum(fnet.apply(p, x)))  # scalar out: avoid tunnel download cost
    results["fnet_dual"] = timeit(f_fwd, fp, x12)

    # cnet alone
    cnet = MultiBasicEncoder(
        output_dim=(tuple(cfg.hidden_dims), tuple(cfg.hidden_dims)),
        norm_fn=cfg.context_norm,
        downsample=cfg.n_downsample,
        num_layers=cfg.n_gru_layers,
        dtype=dt,
    )
    cp = cnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), dt))
    c_fwd = jax.jit(lambda p, x: sum(jnp.sum(o) for lvl in cnet.apply(p, x) for o in lvl))
    results["cnet"] = timeit(c_fwd, cp, x1)

    # correlation volume + pyramid
    Hc, Wc = H // 4, W // 4
    fm = jnp.asarray(rng.standard_normal((B, Hc, Wc, 256)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    @jax.jit
    def vol(f1, f2):
        v = corr_volume(f1, f2, out_dtype=jnp.bfloat16)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in corr_pyramid(v, cfg.corr_levels))

    results["corr_volume_pyramid"] = timeit(vol, fm, fm)

    for k, v in results.items():
        print(json.dumps({"stage": k, "ms": round(float(v), 2)}), flush=True)


if __name__ == "__main__":
    main()
