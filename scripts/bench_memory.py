"""Memory-contract bench: materialized vs fused no-materialization corr.

VERDICT #7 evidence, two layers:

1. FULL MODEL at Middlebury-F size (1984×2880, 32 iters, batch 1) on ONE
   chip — both corr paths compile and run (needs ``pallas_encoder=True``;
   the XLA instance-norm encoder materializes multi-GB relayout temps at
   this size and exceeds HBM). Peak temp here is set by the fused encoder's
   full-res w2d stages, so the corr contrast is measured separately:

2. CORR SECTION ONLY (the tensors the corr_implementation choice controls),
   features at 1/4 res (496×720×256) with 32 varying-coord lookups:
     - "reg_cuda": build W×W₂ bf16 volume pyramid in HBM + Pallas lookups
       (large frames auto-route to the per-level W1-chunked kernel)
     - "alt_cuda": pooled transposed right features only; each lookup
       computes its row-block volume on the MXU in VMEM
       (ops/pallas/corr_alt.py) — the reference alt_cuda_corr contract
       (core/corr.py:212-241).
   Plus a direct single-lookup agreement check between the two kernels
   (full-model disparity deltas at random init are meaningless: 32
   chaotic GRU iterations amplify bf16-volume-vs-fp32-dot rounding).

Writes MEMORY_r02.json. Run on the real chip; nohup + poll.
"""

from __future__ import annotations

import json
import time

import numpy as np


def full_model(results, size, iters):
    import jax
    import jax.numpy as jnp

    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig

    H, W = size
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))

    for impl in ["alt_cuda", "reg_cuda"]:
        cfg = RAFTStereoConfig(corr_implementation=impl, pallas_encoder=True)
        model = RAFTStereo(cfg, iters=iters, test_mode=True)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))
        )

        def forward(params, a, b):
            _, d = model.apply(params, a, b)
            return d

        t0 = time.perf_counter()
        compiled = jax.jit(forward).lower(params, img1, img2).compile()
        t_compile = time.perf_counter() - t0
        mem = compiled.memory_analysis()
        np.asarray(compiled(params, img1, img2))  # warm-up + sync
        t0 = time.perf_counter()
        out = np.asarray(compiled(params, img1, img2))
        row = {
            "compile_s": round(t_compile, 1),
            "temp_gb": round(mem.temp_size_in_bytes / 2**30, 3),
            "frame_s": round(time.perf_counter() - t0, 3),
        }
        results["full_model"][impl] = row
        print("full_model", impl, row, flush=True)


def corr_section(results, size, iters):
    import jax
    import jax.numpy as jnp

    from dkt_stereo_tpu.ops.corr import corr_pyramid, corr_volume, fmap_pyramid
    from dkt_stereo_tpu.ops.pallas.corr_alt import corr_lookup_alt_pallas
    from dkt_stereo_tpu.ops.pallas.corr_lookup import corr_lookup_pallas

    Hc, Wc, D, L = size[0] // 4, size[1] // 4, 256, 4
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.standard_normal((1, Hc, Wc, D)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    f2 = jnp.asarray(rng.standard_normal((1, Hc, Wc, D)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    coords = jnp.asarray(
        rng.uniform(0, Wc, (1, Hc, Wc, 1)).astype(np.float32)
    )

    def reg(f1, f2, coords):
        vol = corr_volume(f1, f2, out_dtype=jnp.bfloat16)
        pyr = tuple(corr_pyramid(vol, L))
        acc = jnp.zeros((1, Hc, Wc, L * 9), jnp.float32)
        for i in range(iters):  # distinct coords per iter so XLA can't CSE
            acc = acc + corr_lookup_pallas(pyr, coords + 0.37 * i, 4, False)
        return acc

    def alt(f1, f2, coords):
        pyr = tuple(
            jnp.swapaxes(f, -1, -2) for f in fmap_pyramid(f2, L)
        )
        acc = jnp.zeros((1, Hc, Wc, L * 9), jnp.float32)
        for i in range(iters):
            acc = acc + corr_lookup_alt_pallas(f1, pyr, coords + 0.37 * i, 4, False)
        return acc

    outs = {}
    for name, fn in [("alt_cuda", alt), ("reg_cuda", reg)]:
        compiled = jax.jit(fn).lower(f1, f2, coords).compile()
        mem = compiled.memory_analysis()
        np.asarray(compiled(f1, f2, coords))
        t0 = time.perf_counter()
        outs[name] = np.asarray(compiled(f1, f2, coords))
        row = {
            "temp_gb": round(mem.temp_size_in_bytes / 2**30, 3),
            "run_s_32_lookups": round(time.perf_counter() - t0, 3),
        }
        results["corr_section"][name] = row
        print("corr_section", name, row, flush=True)

    d = np.abs(outs["alt_cuda"] - outs["reg_cuda"])
    scale = np.abs(outs["reg_cuda"]).mean()
    results["kernel_agreement"] = {
        "max_abs": float(d.max()),
        "mean_abs": float(d.mean()),
        "mean_magnitude": float(scale),
        "note": "bf16-volume rounding vs fp32 MXU accumulation; alt is the "
        "more precise of the two",
    }
    results["corr_temp_ratio_alt_over_reg"] = round(
        results["corr_section"]["alt_cuda"]["temp_gb"]
        / max(results["corr_section"]["reg_cuda"]["temp_gb"], 1e-9),
        3,
    )
    # the contract itself: bytes of correlation state that must persist in
    # HBM across all GRU iterations (bf16). reg grows O(W1·ΣW2) — quadratic
    # in image width; alt O((W1+ΣW2)·D) — linear.
    w2s = [Wc // (2**i) for i in range(L)]
    results["persistent_state_gb"] = {
        "reg_cuda_volume_pyramid": round(Hc * Wc * sum(w2s) * 2 / 2**30, 3),
        "alt_cuda_features": round(Hc * (Wc + sum(w2s)) * D * 2 / 2**30, 3),
    }


def run(size=(1984, 2880), iters=32):
    results = {
        "size": list(size),
        "iters": iters,
        "full_model": {},
        "corr_section": {},
        "note_full_model": "peak temp dominated by the fused full-res encoder "
        "stages (both paths ~equal); the corr contrast is corr_section. "
        "XLA (non-pallas) encoder exceeds HBM at this size.",
    }
    full_model(results, size, iters)
    corr_section(results, size, iters)
    with open("MEMORY_r02.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    import sys

    size = (1984, 2880)
    if len(sys.argv) == 3:
        size = (int(sys.argv[1]), int(sys.argv[2]))
    run(size)
