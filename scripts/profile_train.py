"""DKT train-step attribution + config A/B (single chip, training geometry).

Gives training the treatment scripts/profile_update.py gave inference
(VERDICT r3 weak #3): the measured DKT fine-tune step (REMAT_r03: 13.4 s
RAFT / 21.6 s IGEV at batch 8, 320×704) is decomposed into phases —

  teacher forward (32 iters, eval)   ×2 per step (frozen + EMA), or ONE
                                     vmapped dual-teacher call when
                                     batched_teachers is set
  student forward (16 iters, train)  (a) summed pred stack, (b) to-loss
  student forward+backward           (bwd = this minus the to-loss forward)
  F&E + EMA lerp + AdamW update      (the non-model remainder)

— each timed as its own jitted function on the real chip, with XLA's
compile-time FLOP estimate (``compiled.cost_analysis()``) converted to TF/s
per phase. A config A/B then measures the step under the training levers:
XLA "reg" corr (the REMAT_r03 baseline) vs Pallas "reg_cuda" corr (the
custom-VJP kernels validate_kernels.py pins) vs fused encoder vs batched
teachers vs scan_unroll.

Writes TRAIN_PROF_r05.json, MERGING into any existing rows by config label
(partial runs — ``attrib`` / ``ab`` / ``best_attrib`` / ``batched`` — no
longer clobber the other rows, the round-4 artifact-hygiene bug). Run on
the chip (nohup + poll; several compiles of minutes each). Reference hot
loop: tools/ft_dkt.py:177-248.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

GEOM = (8, 320, 704)  # reference training geometry: batch 8, crop 320x704
OUT = "TRAIN_PROF_r05.json"


def _sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(fn, *args, reps=3, warm=2):
    # the axon remote-compile helper occasionally drops the connection
    # ("response body closed before all bytes were read") — retry once.
    # warm=2: the first post-compile call sometimes carries residual
    # transfer/setup skew through the tunnel (round-4's student_fwd row).
    for attempt in range(2):
        try:
            for _ in range(warm):
                _sync(fn(*args))
            break
        except Exception:
            if attempt == 1:
                raise
            time.sleep(30)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps * 1000.0  # ms


def flops_of(jfn, *args):
    try:
        comp = jfn.lower(*args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", -1.0))
    except Exception:
        return -1.0


def make_batch(B, H, W):
    rng = np.random.default_rng(0)
    return {
        "img1": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "img2": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "img1_clean": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "img2_clean": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "flow": jnp.asarray(-rng.uniform(0, 60, (B, H, W)).astype(np.float32)),
        "valid": jnp.ones((B, H, W), jnp.float32),
    }


def _hyper(batched_teachers=False):
    from dkt_stereo_tpu.train import DKTHyperParams

    return DKTHyperParams(
        train_iters=16, teacher_iters=32, num_steps=1000,
        batched_teachers=batched_teachers,
    )


def phase_attribution(cfg_dict, label, results, batched_teachers=False):
    from dkt_stereo_tpu.models import get_model
    from dkt_stereo_tpu.losses.sequence import sequence_loss_raft
    from dkt_stereo_tpu.train import create_dkt_state, make_dkt_train_step

    B, H, W = GEOM
    hyper = _hyper(batched_teachers)
    model_cls, cfg_cls, _ = get_model("RAFTStereo")
    cfg = cfg_cls.from_dict(dict(cfg_dict))
    batch = make_batch(B, H, W)
    state = create_dkt_state(cfg, hyper, jax.random.PRNGKey(0), (B, H, W))
    key = jax.random.PRNGKey(1)

    rec = {"config": label, "cfg": dict(cfg_dict), "geometry": [B, H, W],
           "batched_teachers": batched_teachers}

    # same gate as make_dkt_train_step: the fused w2d encoder cannot lower
    # under vmap (Mosaic rejects the squeezed second-to-last block dim), so
    # the vmapped teachers run the XLA encoder
    teacher_cfg = cfg
    if batched_teachers and getattr(cfg, "pallas_encoder", False):
        import dataclasses as _dc

        teacher_cfg = _dc.replace(cfg, pallas_encoder=False)
    teacher = model_cls(teacher_cfg, iters=hyper.teacher_iters, test_mode=True)
    student = model_cls(cfg, iters=hyper.train_iters, test_mode=False)

    # scalar-output protocol (as scripts/profile_update.py): returning the
    # disparity stacks would time the axon tunnel download (115 MB for the
    # student's 16 upsampled preds ≈ +1.7 s), not the compute
    if batched_teachers:
        # ONE vmapped dual-teacher call (train/dkt_step.py step 2); the
        # stacked tree is built outside the timed fn, as in the step where
        # only the cheap EMA-lerp precedes the stack
        stacked = jax.tree_util.tree_map(
            lambda a, b: jnp.stack([a, b]), state.teacher_params, state.ema_params
        )
        t_fwd = jax.jit(
            lambda ps, b: jnp.sum(
                jax.vmap(lambda p: teacher.apply(p, b["img1_clean"], b["img2_clean"])[1])(ps)
            )
        )
        rec["teacher_dual_fwd_ms"] = timeit(t_fwd, stacked, batch)
        rec["teacher_dual_fwd_tflops"] = flops_of(t_fwd, stacked, batch) / 1e12
        teacher_total_ms = rec["teacher_dual_fwd_ms"]
    else:
        t_fwd = jax.jit(
            lambda p, b: jnp.sum(teacher.apply(p, b["img1_clean"], b["img2_clean"])[1])
        )
        rec["teacher_fwd_ms"] = timeit(t_fwd, state.teacher_params, batch)
        rec["teacher_fwd_tflops"] = flops_of(t_fwd, state.teacher_params, batch) / 1e12
        teacher_total_ms = 2 * rec["teacher_fwd_ms"]

    # student forward, two formulations:
    #   (a) sum over the (16, B, H, W) upsampled pred stack — what r04
    #       measured; materializes all 16 full-res preds in HBM;
    #   (b) forward-to-loss — the EXACT forward value_and_grad differentiates
    #       (sequence-loss reduction fused into the graph), so
    #       bwd ≈ fwdbwd − fwd_loss is the honest decomposition.
    # r04's (a)-only measurement printed 2.4 s fwd vs 0.7 s fwd+bwd, which is
    # impossible for the same forward — (a) is a different, worse program.
    s_fwd = jax.jit(
        lambda p, b, k: jnp.sum(
            student.apply(p, b["img1"], b["img2"], rngs={"mix": k})["disp_preds"]
        )
    )

    def loss_fn(trainable, frozen, b, k):
        params = {"params": trainable, **frozen}
        out = student.apply(params, b["img1"], b["img2"], rngs={"mix": k})
        loss, _, _, _ = sequence_loss_raft(out["disp_preds"], b["flow"], b["valid"])
        return loss

    frozen = {k: v for k, v in state.params.items() if k != "params"}
    s_loss = jax.jit(loss_fn)
    s_grad = jax.jit(jax.value_and_grad(loss_fn))

    rec["student_fwd_predstack_ms"] = timeit(s_fwd, state.params, batch, key)
    rec["student_fwd_predstack_tflops"] = flops_of(s_fwd, state.params, batch, key) / 1e12
    rec["student_fwd_loss_ms"] = timeit(s_loss, state.params["params"], frozen, batch, key)
    rec["student_fwd_loss_tflops"] = (
        flops_of(s_loss, state.params["params"], frozen, batch, key) / 1e12
    )
    rec["student_fwdbwd_ms"] = timeit(s_grad, state.params["params"], frozen, batch, key)
    rec["student_fwdbwd_tflops"] = (
        flops_of(s_grad, state.params["params"], frozen, batch, key) / 1e12
    )

    step_fn = make_dkt_train_step(cfg, hyper)
    rec["full_step_ms"] = timeit(step_fn, state, batch, key, reps=2)
    rec["full_step_tflops"] = flops_of(step_fn, state, batch, key) / 1e12

    # residual: everything that is not the teacher forwards or the student
    # fwd+bwd — F&E, EMA lerp, clip, AdamW, metric reductions, fusion seams
    rec["residual_ms"] = rec["full_step_ms"] - (
        teacher_total_ms + rec["student_fwdbwd_ms"]
    )
    for k in (
        "teacher_fwd", "teacher_dual_fwd", "student_fwd_predstack",
        "student_fwd_loss", "student_fwdbwd", "full_step",
    ):
        ms, tf = rec.get(f"{k}_ms"), rec.get(f"{k}_tflops")
        if ms and tf and tf > 0 and ms > 0:
            rec[f"{k}_tfs"] = tf / (ms / 1e3)
    results.append(rec)
    print(json.dumps(rec), flush=True)
    return rec


def step_ab(cfg_dict, label, results, batched_teachers=False):
    """Full-step wall time only (for cheap config A/Bs)."""
    from dkt_stereo_tpu.models import get_model
    from dkt_stereo_tpu.train import create_dkt_state, make_dkt_train_step

    B, H, W = GEOM
    hyper = _hyper(batched_teachers)
    _, cfg_cls, _ = get_model("RAFTStereo")
    cfg = cfg_cls.from_dict(dict(cfg_dict))
    batch = make_batch(B, H, W)
    state = create_dkt_state(cfg, hyper, jax.random.PRNGKey(0), (B, H, W))
    step_fn = make_dkt_train_step(cfg, hyper)
    rec = {"config": label, "cfg": dict(cfg_dict), "geometry": [B, H, W],
           "batched_teachers": batched_teachers}
    try:
        rec["full_step_ms"] = timeit(step_fn, state, batch, jax.random.PRNGKey(1), reps=2)
        rec["full_step_tflops"] = flops_of(step_fn, state, batch, jax.random.PRNGKey(1)) / 1e12
    except Exception as e:
        rec["error"] = f"{type(e).__name__}: {e}"[:400]
    results.append(rec)
    print(json.dumps(rec), flush=True)
    return rec


def merge_write(results, path=OUT):
    """Merge this run's rows into the artifact by config label (replace
    same-label rows, keep the rest) so partial runs never clobber rows they
    did not measure."""
    old = []
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
    key = lambda r: (r.get("config"), tuple(r.get("geometry", ())))
    labels = {key(r) for r in results}
    merged = [r for r in old if key(r) not in labels] + results
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {path} ({len(merged)} rows)", flush=True)


def main():
    global GEOM
    sys.path.insert(0, ".")
    global jax, jnp
    import jax

    smoke = "--cpu-smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")
        GEOM = (1, 32, 64)
    if "--geom" in sys.argv:
        # e.g. --geom 2,480,896 — the run_scripts/ft_booster.sh geometry
        # (batch 2), vs the default reference-paper recipe (8, 320, 704)
        GEOM = tuple(int(x) for x in sys.argv[sys.argv.index("--geom") + 1].split(","))
    import jax.numpy as jnp

    globals()["jnp"] = jnp

    import bench

    bench._enable_compile_cache()

    results: list = []
    base = {"remat_iters": True}  # REMAT_r03 baseline config (defaults + remat)
    if smoke:
        base.update(
            corr_levels=2, corr_radius=2, n_gru_layers=1, hidden_dims=(16, 16, 16)
        )

    only = next((a for a in sys.argv[1:] if not a.startswith("-")), None)

    if only in (None, "attrib"):
        phase_attribution(base, "baseline_reg", results)
    if only in (None, "ab"):
        step_ab({**base, "corr_implementation": "reg_cuda"}, "pallas_corr", results)
        # fused encoder everywhere it appears: the test_mode teachers AND the
        # student (trainable through the encoder_stage_ad custom VJP)
        step_ab(
            {**base, "corr_implementation": "reg_cuda", "pallas_encoder": True},
            "pallas_corr_enc",
            results,
        )
    if only in (None, "unroll"):
        step_ab(
            {
                **base,
                "corr_implementation": "reg_cuda",
                "pallas_encoder": True,
                "scan_unroll": 2,
            },
            "pallas_corr_enc_unroll2",
            results,
        )
    if only in (None, "batched"):
        # the shipped train.json recipe: Pallas corr + fused encoder + ONE
        # vmapped dual-teacher forward
        step_ab(
            {**base, "corr_implementation": "reg_cuda", "pallas_encoder": True},
            "pallas_corr_enc_batched_teachers",
            results,
            batched_teachers=True,
        )
    if only == "best_attrib":
        # the SHIPPED recipe (configs/raft_stereo/train.json): Pallas corr +
        # remat, fused encoder and batched teachers OFF — both measured as
        # losses at recipe geometry in this artifact's A/B rows (the fused
        # encoder's value is full-resolution training, where the XLA encoder
        # OOMs; the vmapped dual-teacher loses its fused encoder under vmap
        # and lowers batched-weight convs poorly)
        phase_attribution(
            {**base, "corr_implementation": "reg_cuda"},
            "shipped_recipe_attrib",
            results,
        )

    if not smoke:
        merge_write(results)


if __name__ == "__main__":
    main()
