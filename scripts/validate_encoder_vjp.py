"""Compiled (Mosaic) validation of the fused-encoder custom VJP on chip.

The CPU suite pins encoder_stage_ad's VJP in interpret mode
(tests/test_pallas_encoder.py: single-stage vs autodiff at 1e-5 rel,
model-level vs the XLA encoder at 4e-3 rel); this script repeats the
model-level comparison COMPILED on the real chip at a training-scale
geometry — the same interpret-vs-Mosaic gap that bit three kernels in
round 3 (VERDICT r3). Writes ENCODER_VJP_r04.json.

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
    for case, (B, H, W), dtype, tol, prec in [
        ("fp32_320x704_highest", (2, 320, 704), jnp.float32, 1e-2, "highest"),
        ("bf16_320x704", (2, 320, 704), jnp.bfloat16, 2e-1, None),
    ]:
        jax.config.update("jax_default_matmul_precision", prec)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))
        ref = BasicEncoder(256, "instance", 2, dtype=dtype)
        fused = BasicEncoder(256, "instance", 2, dtype=dtype, fused_fullres=True)
        params = ref.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

        def loss(m):
            return lambda p, xx: jnp.sum(m.apply(p, xx).astype(jnp.float32) ** 2) / (H * W)

        g0 = jax.jit(jax.grad(loss(ref)))(params, x)
        g1 = jax.jit(jax.grad(loss(fused)))(params, x)
        leaves0 = jax.tree_util.tree_leaves_with_path(g0)
        gmax = max(float(np.abs(np.asarray(a, np.float32)).max()) for _, a in leaves0)
        worst, worst_leaf = 0.0, None
        zero_ok = True
        for (path, a), b in zip(leaves0, jax.tree_util.tree_leaves(g1)):
            key = jax.tree_util.keystr(path)
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            # conv-bias grads inside the fused section are mathematically
            # ZERO (instance norm is shift-invariant, so the bias cancels):
            # the fused path returns exact 0 while the XLA path returns
            # bf16 rounding noise — compare these leaves ABSOLUTELY (both
            # must be ≤2% of the global grad scale), not relatively
            fused_bias = ("['conv1']['bias']" in key and "layer" not in key) or (
                "['layer1']" in key and "['bias']" in key
            )
            if fused_bias:
                zero_ok &= float(np.abs(b).max()) <= 2e-2 * gmax
                zero_ok &= float(np.abs(a).max()) <= 2e-2 * gmax
                continue
            scale = max(float(np.abs(a).max()), 1e-2 * gmax)
            d = float(np.abs(a - b).max() / scale)
            if d > worst:
                worst, worst_leaf = d, jax.tree_util.keystr(path)
        rows.append(
            {
                "kernel": "encoder_conv_vjp",
                "case": case,
                "worst_rel_leaf_err": worst,
                "worst_leaf": worst_leaf,
                "bound": tol,
                "ok": worst < tol and zero_ok,
                "math_zero_bias_leaves_ok": zero_ok,
                "geometry": [B, H, W],
                "grad_scale": gmax,
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    jax.config.update("jax_default_matmul_precision", None)

    out = {
        "protocol": "compiled (Mosaic) fused-encoder grads vs XLA-encoder "
                    "grads, all param leaves, training geometry",
        "device": str(jax.devices()[0]),
        "results": rows,
        "all_ok": all(r["ok"] for r in rows),
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    with open("ENCODER_VJP_r04.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"all_ok": out["all_ok"]}), flush=True)


if __name__ == "__main__":
    main()
