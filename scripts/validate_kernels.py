"""On-chip Pallas kernel validation → KERNELS_r03.json.

Every Pallas kernel in ops/pallas/ runs COMPILED (Mosaic, interpret=False)
on the real chip at eval geometry (736×1280 → 184×320 at 1/4 features;
Middlebury-F 1984×2880 → 496×720 for the chunked corr path) against its XLA
reference op, forward AND custom-VJP backward. The CPU suite exercises the
same comparisons in interpret mode (tests/test_pallas_*.py); this artifact
catches Mosaic-vs-interpret divergence that suite cannot see.

Model-level rows additionally pin each kernel in situ: RAFT reg_cuda vs reg,
RAFT alt_cuda vs reg, RAFT pallas_encoder on/off (exercises
ops/pallas/encoder_conv.py, which is inference-only — no VJP row), IGEV
reg_cuda vs reg, PCV pallas row-sampler vs reg. fp32 features / fp32
volumes throughout so the bounds measure KERNEL divergence, not the bf16
storage policy.

Run on the chip (one TPU process at a time):
  nohup python scripts/validate_kernels.py > /tmp/kernels.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _maxabs(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))))


def main():
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    from dkt_stereo_tpu.ops import corr_lookup, corr_pyramid, corr_volume
    from dkt_stereo_tpu.ops.corr import corr_lookup_alt, fmap_pyramid
    from dkt_stereo_tpu.ops.geometry import CombinedGeoEncodingVolume
    from dkt_stereo_tpu.ops.pallas import corr_lookup_pallas
    from dkt_stereo_tpu.ops.pallas.corr_alt import corr_lookup_alt_pallas
    from dkt_stereo_tpu.ops.pallas.corr_lookup import _VMEM_BYTES, _pick_rows
    from dkt_stereo_tpu.ops.pallas.geo_lookup import geo_lookup_pallas
    from dkt_stereo_tpu.ops.pallas.row_sample import row_sample_pallas
    from dkt_stereo_tpu.ops.sampler import sample_row_1d

    rows = []
    rng = np.random.default_rng(0)
    t_all = time.perf_counter()

    def record(kernel, case, err, bound, extra=None):
        rec = {
            "kernel": kernel,
            "case": case,
            "max_abs_err": err,
            "bound": bound,
            "ok": bool(err <= bound),
            **(extra or {}),
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    # ---- corr_lookup (materialized pyramid), eval geometry ---------------
    B, H, W, D = 1, 184, 320, 256
    f1 = jnp.asarray(rng.standard_normal((B, H, W, D)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((B, H, W, D)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-2, W + 2, (B, H, W, 1)).astype(np.float32))
    vol = corr_volume(f1, f2)
    pyr = tuple(corr_pyramid(vol, 4))
    direct = _pick_rows(B * H) * W * sum(v.shape[-1] * v.dtype.itemsize for v in pyr) <= _VMEM_BYTES
    want = np.asarray(jax.jit(lambda p, c: corr_lookup(list(p), c, 4))(pyr, coords))
    t0 = time.perf_counter()
    got = np.asarray(jax.jit(lambda p, c: corr_lookup_pallas(p, c, 4))(pyr, coords))
    record("corr_lookup", "fwd_eval_184x320", _maxabs(got, want), 1e-4,
           {"path": "direct" if direct else "chunked",
            "compile_s": round(time.perf_counter() - t0, 1)})

    g_x = jax.jit(jax.grad(lambda p: (corr_lookup(list(p), coords, 4) ** 2).sum()))(pyr)
    g_p = jax.jit(jax.grad(lambda p: (corr_lookup_pallas(p, coords, 4) ** 2).sum()))(pyr)
    err = max(_maxabs(a, b) for a, b in zip(g_p, g_x))
    # grad magnitudes here are O(1e2) (sum-of-squares over 5.9e7 taps);
    # bound relative to the gradient scale
    gscale = max(float(np.abs(np.asarray(v)).max()) for v in g_x)
    record("corr_lookup", "vjp_eval_184x320", err, 1e-4 * max(gscale, 1.0),
           {"grad_scale": gscale})
    del vol, pyr, g_x, g_p

    # ---- corr_lookup, Middlebury-F geometry → forces the chunked path ----
    Bm, Hm, Wm = 1, 496, 720
    f1m = jnp.asarray(rng.standard_normal((Bm, Hm, Wm, 64)).astype(np.float32))
    f2m = jnp.asarray(rng.standard_normal((Bm, Hm, Wm, 64)).astype(np.float32))
    cm = jnp.asarray(rng.uniform(-2, Wm + 2, (Bm, Hm, Wm, 1)).astype(np.float32))
    volm = corr_volume(f1m, f2m)
    pyrm = tuple(corr_pyramid(volm, 4))
    chunked = _pick_rows(Bm * Hm) * Wm * sum(v.shape[-1] * v.dtype.itemsize for v in pyrm) > _VMEM_BYTES
    want = np.asarray(jax.jit(lambda p, c: corr_lookup(list(p), c, 4))(pyrm, cm))
    got = np.asarray(jax.jit(lambda p, c: corr_lookup_pallas(p, c, 4))(pyrm, cm))
    record("corr_lookup", "fwd_middF_496x720", _maxabs(got, want), 1e-4,
           {"path": "chunked" if chunked else "direct"})
    g_x = jax.jit(jax.grad(lambda p: (corr_lookup(list(p), cm, 4) ** 2).sum()))(pyrm)
    g_p = jax.jit(jax.grad(lambda p: (corr_lookup_pallas(p, cm, 4) ** 2).sum()))(pyrm)
    err = max(_maxabs(a, b) for a, b in zip(g_p, g_x))
    gscale = max(float(np.abs(np.asarray(v)).max()) for v in g_x)
    record("corr_lookup", "vjp_middF_496x720", err, 1e-4 * max(gscale, 1.0),
           {"grad_scale": gscale, "path": "chunked" if chunked else "direct"})

    # bf16 pyramid VJP at the chunked geometry: the hot training path stores
    # the pyramid in bf16 (corr_dtype default), and the backward chunk budget
    # must account for fp32 in-kernel temps that do NOT shrink with bf16
    # inputs (round-4 advisor finding — the fp32-only rows above never
    # exercised the doubled chunk limit this configuration used to get)
    pyrb = tuple(v.astype(jnp.bfloat16) for v in pyrm)
    g_x = jax.jit(jax.grad(lambda p: (corr_lookup(list(p), cm, 4) ** 2).sum()))(pyrb)
    g_p = jax.jit(jax.grad(lambda p: (corr_lookup_pallas(p, cm, 4) ** 2).sum()))(pyrb)
    err = max(_maxabs(a, b) for a, b in zip(g_p, g_x))
    gscale = max(float(np.abs(np.asarray(v, np.float32)).max()) for v in g_x)
    record("corr_lookup", "vjp_middF_496x720_bf16", err, 1e-2 * max(gscale, 1.0),
           {"grad_scale": gscale, "dtype": "bfloat16"})
    del volm, pyrm, pyrb, f1m, f2m, cm, g_x, g_p

    # ---- corr_alt (fused, no materialization), eval geometry -------------
    pyr2 = fmap_pyramid(f2, 4)
    f2t = tuple(jnp.swapaxes(f, -1, -2) for f in pyr2)
    want = np.asarray(jax.jit(lambda a, p, c: corr_lookup_alt(a, list(p), c, 4))(f1, tuple(pyr2), coords))
    got = np.asarray(jax.jit(lambda a, p, c: corr_lookup_alt_pallas(a, p, c, 4))(f1, f2t, coords))
    record("corr_alt", "fwd_eval_184x320", _maxabs(got, want), 2e-4)

    def loss_xla(a, b):
        return (corr_lookup_alt(a, fmap_pyramid(b, 4), coords, 4) ** 2).sum()

    def loss_pl(a, b):
        f2t_ = tuple(jnp.swapaxes(f, -1, -2) for f in fmap_pyramid(b, 4))
        return (corr_lookup_alt_pallas(a, f2t_, coords, 4) ** 2).sum()

    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))(f1, f2)
    gp = jax.jit(jax.grad(loss_pl, argnums=(0, 1)))(f1, f2)
    err = max(_maxabs(a, b) for a, b in zip(gp, gx))
    gscale = max(float(np.abs(np.asarray(v)).max()) for v in gx)
    record("corr_alt", "vjp_eval_184x320", err, 1e-4 * max(gscale, 1.0),
           {"grad_scale": gscale})
    del f1, f2, coords, pyr2, f2t, gx, gp

    # ---- geo_lookup (IGEV dual pyramid), eval geometry --------------------
    Dg, Cg = 48, 8
    g1 = jnp.asarray(rng.standard_normal((B, H, W, 96)).astype(np.float32))
    g2 = jnp.asarray(rng.standard_normal((B, H, W, 96)).astype(np.float32))
    geo = jnp.asarray(rng.standard_normal((B, Dg, H, W, Cg)).astype(np.float32))
    fn = CombinedGeoEncodingVolume(g1, g2, geo, num_levels=2, radius=4)
    disp = jnp.asarray(rng.uniform(0, Dg, (B, H, W, 1)).astype(np.float32))
    cgrid = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.float32)[None, None, :, None], (B, H, W, 1)
    )
    geo_pyr, corr_pyr = tuple(fn.geo_pyramid), tuple(fn.init_corr_pyramid)
    want = np.asarray(jax.jit(fn)(disp, cgrid))
    got = np.asarray(
        jax.jit(lambda gp_, cp_, d, c: geo_lookup_pallas(gp_, cp_, d, c, 4))(
            geo_pyr, corr_pyr, disp, cgrid
        )
    )
    record("geo_lookup", "fwd_eval_184x320_D48", _maxabs(got, want), 2e-4)

    # pyramid grads only (argnums 0,1): the kernel's VJP intentionally
    # returns zero for disp/coords — the model detaches disp before every
    # lookup (models/igev_stereo.py, reference igev_stereo.py:201) and the
    # reference's CUDA sampler likewise returns no coordinate gradient
    # (core/corr.py:25-29), so a disp-grad comparison against the bare XLA
    # closure (which IS differentiable through the tap weights) would flag
    # a difference no model path can observe.
    def gl_xla(gp_, cp_):
        f = CombinedGeoEncodingVolume.__new__(CombinedGeoEncodingVolume)
        f.geo_pyramid, f.init_corr_pyramid = list(gp_), list(cp_)
        f.num_levels, f.radius = 2, 4
        return (f(disp, cgrid) ** 2).sum()

    def gl_pl(gp_, cp_):
        return (geo_lookup_pallas(gp_, cp_, disp, cgrid, 4) ** 2).sum()

    gx = jax.jit(jax.grad(gl_xla, argnums=(0, 1)))(geo_pyr, corr_pyr)
    gp = jax.jit(jax.grad(gl_pl, argnums=(0, 1)))(geo_pyr, corr_pyr)
    err = max(
        _maxabs(a, b)
        for ta, tb in zip(gp, gx)
        for a, b in zip(jax.tree_util.tree_leaves(ta), jax.tree_util.tree_leaves(tb))
    )
    gscale = max(
        float(np.abs(np.asarray(v)).max()) for v in jax.tree_util.tree_leaves(gx)
    )
    record("geo_lookup", "vjp_eval_184x320_D48", err, 1e-4 * max(gscale, 1.0),
           {"grad_scale": gscale})

    # bf16 dual-pyramid VJP (default corr_dtype hot path) — exercises the
    # >=fp32 chunk budget in _geo_bwd_impl with bf16 inputs
    geo_pyr_b = tuple(v.astype(jnp.bfloat16) for v in geo_pyr)
    corr_pyr_b = tuple(v.astype(jnp.bfloat16) for v in corr_pyr)
    gx = jax.jit(jax.grad(gl_xla, argnums=(0, 1)))(geo_pyr_b, corr_pyr_b)
    gp = jax.jit(jax.grad(gl_pl, argnums=(0, 1)))(geo_pyr_b, corr_pyr_b)
    err = max(
        _maxabs(a, b)
        for ta, tb in zip(gp, gx)
        for a, b in zip(jax.tree_util.tree_leaves(ta), jax.tree_util.tree_leaves(tb))
    )
    gscale = max(
        float(np.abs(np.asarray(v, np.float32)).max())
        for v in jax.tree_util.tree_leaves(gx)
    )
    record("geo_lookup", "vjp_eval_184x320_D48_bf16", err, 1e-2 * max(gscale, 1.0),
           {"grad_scale": gscale, "dtype": "bfloat16"})
    del g1, g2, geo, fn, geo_pyr, corr_pyr, geo_pyr_b, corr_pyr_b, gx, gp

    # ---- row_sample (PCV gaussian lookup), eval geometry ------------------
    K = 36  # 4 gaussians × 9 sample points
    volr = jnp.asarray(rng.standard_normal((B, H, W, W)).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-3, W + 2, (B, H, W, K)).astype(np.float32))
    want = np.asarray(jax.jit(sample_row_1d)(volr, pos))
    got = np.asarray(jax.jit(lambda v, p: row_sample_pallas(v, p))(volr, pos))
    record("row_sample", "fwd_eval_184x320_K36", _maxabs(got, want), 2e-4)

    gx = jax.jit(jax.grad(lambda v, p: (sample_row_1d(v, p) ** 2).sum(), argnums=(0, 1)))(volr, pos)
    gp = jax.jit(jax.grad(lambda v, p: (row_sample_pallas(v, p) ** 2).sum(), argnums=(0, 1)))(volr, pos)
    err = max(_maxabs(a, b) for a, b in zip(gp, gx))
    gscale = max(float(np.abs(np.asarray(v)).max()) for v in gx)
    record("row_sample", "vjp_eval_184x320_K36", err, 1e-4 * max(gscale, 1.0),
           {"grad_scale": gscale})
    del volr, pos, gx, gp

    # ---- model-level, full eval frames (736×1280, fp32 policy) -----------
    from dkt_stereo_tpu.models import get_model

    Hf, Wf = 736, 1280
    i1 = jnp.asarray(rng.uniform(0, 255, (1, Hf, Wf, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 255, (1, Hf, Wf, 3)).astype(np.float32))

    def model_disp(name, iters, **cfg_kw):
        cls, cfg_cls, _ = get_model(name)
        cfg = cfg_cls.from_dict({"mixed_precision": False, **cfg_kw})
        m = cls(cfg, iters=iters, test_mode=True)
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
        out = np.asarray(jax.jit(lambda a, b: m.apply(p, a, b)[1])(i1, i2))
        return out

    # These rows pin IN-SITU WIRING (the kernel path runs inside the full
    # jitted model and lands within the chaos envelope); the PRECISION
    # evidence is the kernel-level rows above. Rationale: random-init GRU
    # refinement is a chaotic map that amplifies any fp difference
    # exponentially (measured on-chip: a bf16-vs-fp32 pyramid delta grows
    # 1.5 -> 19 -> 82 -> 185 over iters 1/2/4/8 through IGEV; the fused-alt
    # and w2d-encoder reformulation deltas back-solve to the ~1e-6 iter-0
    # values the kernel rows measure directly). Kernels that are the exact
    # same two-tap arithmetic as the XLA path come out BIT-IDENTICAL
    # through 8 full iterations (err 0.0 at fp32) and carry a tight
    # relative bound; reformulated kernels (different but equally-valid
    # accumulation order) run iters=2 against a relative bound that the
    # measured amplification justifies.
    cases = [
        ("encoder_conv", "raft_pallas_encoder_vs_xla",
         dict(corr_implementation="reg", corr_dtype="float32", pallas_encoder=True),
         dict(corr_implementation="reg", corr_dtype="float32"), "RAFTStereo", 2, 5e-2),
        ("corr_lookup", "raft_reg_cuda_vs_reg",
         dict(corr_implementation="reg_cuda", corr_dtype="float32"),
         dict(corr_implementation="reg", corr_dtype="float32"), "RAFTStereo", 8, 1e-4),
        ("corr_alt", "raft_alt_cuda_vs_reg",
         dict(corr_implementation="alt_cuda"),
         dict(corr_implementation="reg", corr_dtype="float32"), "RAFTStereo", 2, 1e-2),
        # corr_dtype float32 so both sides store fp32 pyramids (the Pallas
        # hot path defaults to bf16 storage — a policy delta, not a kernel
        # delta)
        ("geo_lookup", "igev_reg_cuda_vs_reg",
         dict(corr_implementation="reg_cuda", corr_dtype="float32"),
         dict(corr_implementation="reg"), "IGEVStereo", 2, 1e-4),
        ("row_sample", "pcv_reg_cuda_vs_reg",
         dict(corr_implementation="reg_cuda"),
         dict(corr_implementation="reg"), "PCVNet", 8, 1e-4),
    ]
    for kernel, case, cfg_pl, cfg_ref, model, iters, rel_bound in cases:
        try:
            a = model_disp(model, iters, **cfg_pl)
            b = model_disp(model, iters, **cfg_ref)
            scale = float(np.abs(b).max())
            record(kernel, case, _maxabs(a, b), rel_bound * max(scale, 1.0),
                   {"model": model, "iters": iters, "disp_scale": scale,
                    "rel_bound": rel_bound, "protocol": "in-situ wiring pin"})
        except Exception as e:
            rows.append({"kernel": kernel, "case": case, "error": str(e)[:300], "ok": False})
            print(json.dumps(rows[-1]), flush=True)

    out = {
        "protocol": "compiled (Mosaic) Pallas kernels vs XLA reference ops, "
                    "fwd + custom-VJP, fp32 AND bf16-pyramid, eval geometry "
                    "184x320 (1/4 of 736x1280) + Middlebury-F 496x720 chunked "
                    "path + full-frame model-level pins",
        "device": str(jax.devices()[0]),
        "results": rows,
        "all_ok": all(r.get("ok") for r in rows),
        "wall_s": round(time.perf_counter() - t_all, 1),
    }
    out_path = sys.argv[1] if len(sys.argv) > 1 else "KERNELS_r04.json"
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"all_ok": out["all_ok"], "n": len(rows)}), flush=True)


if __name__ == "__main__":
    main()
