"""Compiled (Mosaic) validation of the fused-encoder custom VJP on chip.

The CPU suite pins encoder_stage_ad's VJP in interpret mode
(tests/test_pallas_encoder.py: single-stage vs autodiff at 1e-5 rel,
model-level vs the XLA encoder at 4e-3 rel); this script repeats the
model-level comparison COMPILED on the real chip at a training-scale
geometry — the same interpret-vs-Mosaic gap that bit three kernels in
round 3 (VERDICT r3). Writes ENCODER_VJP_r05.json.

Run: nohup python scripts/validate_encoder_vjp.py > /tmp/enc_vjp.log 2>&1 &
(compiles are minutes on the axon tunnel).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, ".")
    import bench

    bench._enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from dkt_stereo_tpu.nn.blocks import BasicEncoder

    t0 = time.perf_counter()
    rows = []
    # training-scale geometry: the 320×704 crop the DKT recipe uses.
    # fp32 case runs BOTH sides at matmul precision HIGHEST — at DEFAULT the
    # TPU MXU truncates f32 operands to bf16 mantissas and the dense-w2d
    # reformulation rounds differently from the XLA conv, which the IN
    # chains amplify to ~1e-1 leaf divergence (measured; neither side is
    # "right" at DEFAULT). The shipped bf16 path is a genuine bf16-vs-bf16
    # comparison and needs no override.
    B, H, W = 2, 320, 704
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))

    def grads(dtype, fused_flag):
        m = BasicEncoder(256, "instance", 2, dtype=dtype, fused_fullres=fused_flag)
        params = BasicEncoder(256, "instance", 2, dtype=dtype).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
        )
        loss = lambda p, xx: jnp.sum(m.apply(p, xx).astype(jnp.float32) ** 2) / (H * W)
        return jax.jit(jax.grad(loss))(params, x)

    def is_zero_bias(key):
        # conv-bias grads are mathematically ZERO for every conv that feeds
        # an InstanceNorm (shift invariance cancels the bias) — ALL convs in
        # this encoder except the final un-normed 1×1 head ("conv2" at top
        # level). The fused section returns exact 0; elsewhere both paths
        # return rounding noise, so relative comparison is noise-vs-noise.
        return "['bias']" in key and not (
            "['conv2']['bias']" in key and "layer" not in key
        )

    def worst_rel(gref, g, gmax):
        worst, worst_leaf, zero_ok = 0.0, None, True
        for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(gref), jax.tree_util.tree_leaves(g)
        ):
            key = jax.tree_util.keystr(path)
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            if is_zero_bias(key):
                zero_ok &= float(np.abs(b).max()) <= 2e-2 * gmax
                continue
            scale = max(float(np.abs(a).max()), 1e-2 * gmax)
            d = float(np.abs(a - b).max() / scale)
            if d > worst:
                worst, worst_leaf = d, key
        return worst, worst_leaf, zero_ok

    # ---- fp32 case: both sides at matmul precision HIGHEST — at DEFAULT
    # the MXU truncates f32 operands to bf16 mantissas and the dense-w2d
    # reformulation rounds differently from the XLA conv, which the IN
    # chains amplify to ~1e-1 leaf divergence (measured; neither side is
    # "right" at DEFAULT). This run is also the TRUTH for the bf16 case.
    jax.config.update("jax_default_matmul_precision", "highest")
    truth = grads(jnp.float32, False)
    gmax = max(
        float(np.abs(np.asarray(a, np.float32)).max())
        for a in jax.tree_util.tree_leaves(truth)
    )
    g_fused32 = grads(jnp.float32, True)
    worst, leaf, zero_ok = worst_rel(truth, g_fused32, gmax)
    rows.append(
        {
            "kernel": "encoder_conv_vjp", "case": "fp32_320x704_highest",
            "worst_rel_leaf_err": worst, "worst_leaf": leaf, "bound": 1e-2,
            "ok": worst < 1e-2 and zero_ok, "math_zero_bias_leaves_ok": zero_ok,
            "geometry": [B, H, W], "grad_scale": gmax,
        }
    )
    print(json.dumps(rows[-1]), flush=True)

    # ---- bf16 case (the shipped mixed-precision path): bf16-vs-bf16 is
    # noise-vs-noise through the IN chains, so instead measure EACH path's
    # deviation from the fp32-HIGHEST truth — the fused path must not be
    # meaningfully noisier than the XLA path it replaces.
    jax.config.update("jax_default_matmul_precision", None)
    dev_xla = worst_rel(truth, grads(jnp.bfloat16, False), gmax)
    dev_fused = worst_rel(truth, grads(jnp.bfloat16, True), gmax)
    ok = dev_fused[0] <= 2.0 * dev_xla[0] + 1e-3 and dev_fused[2]
    rows.append(
        {
            "kernel": "encoder_conv_vjp", "case": "bf16_320x704_vs_fp32_truth",
            "xla_bf16_dev_from_truth": dev_xla[0],
            "fused_bf16_dev_from_truth": dev_fused[0],
            "worst_leaf": dev_fused[1],
            "bound": "fused_dev <= 2*xla_dev + 1e-3",
            "ok": ok, "math_zero_bias_leaves_ok": dev_fused[2],
            "geometry": [B, H, W],
        }
    )
    print(json.dumps(rows[-1]), flush=True)

    out = {
        "protocol": "compiled (Mosaic) fused-encoder grads vs XLA-encoder "
                    "grads, all param leaves, training geometry",
        "device": str(jax.devices()[0]),
        "results": rows,
        "all_ok": all(r["ok"] for r in rows),
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    with open("ENCODER_VJP_r05.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"all_ok": out["all_ok"]}), flush=True)


if __name__ == "__main__":
    main()
