"""ONE full DKT fine-tune step vs the reference loop (tools/ft_dkt.py:177-248).

The component pieces are each pinned elsewhere (F&E tests/test_dkt.py, EMA,
losses, OneCycle-vs-torch, model forwards vs torch through the checkpoint
importer). This test closes the composition gap: it executes the reference's
step semantics in torch on CPU — EMA lerp → two teacher forwards on the clean
pair → F&E on GT (withprob + clamp) and PL (plain) → student forward on the
augmented pair → sequence loss GT + PL → backward → global-norm clip 1.0 →
AdamW + OneCycleLR step — with the F&E randoms pinned to the exact draws our
keyed step consumes, on identical imported weights and identical data, and
compares the post-step parameters against ``make_dkt_train_step``.

Reference RNG plumbing being pinned: ``FandE_Filter``'s ``torch.rand``
(FandE/__init__.py:32) and ``FandE_Ensemble``'s ``random.random`` (:10) are
monkeypatched to replay the uniforms our jitted step derives from its key
split (train/dkt_step.py:124: k_fgt, k_egt, k_fpl, k_epl, ...).
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "meta_arch")), reason="reference not mounted"
)


def _load_ref_module(relpath, name):
    """Import a reference file as a standalone module (meta_arch/__init__ is
    broken in the reference — see test_reference_parity)."""
    import importlib.util

    if REF not in sys.path:
        sys.path.insert(0, REF)
    if name in sys.modules:
        return sys.modules[name]
    path = os.path.join(REF, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_full_dkt_step_matches_reference(rng, monkeypatch):
    import torch

    from tests.test_reference_parity import _build_torch_model

    import jax
    import jax.numpy as jnp

    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig
    from dkt_stereo_tpu.train import DKTHyperParams
    from dkt_stereo_tpu.train.dkt_step import create_dkt_state, make_dkt_train_step
    from dkt_stereo_tpu.train.checkpoint import import_reference_pth

    fande = _load_ref_module("FandE/__init__.py", "ref_fande")
    ref_loss = _load_ref_module("meta_arch/raft_stereo/loss.py", "ref_raft_loss")

    # ---- shared fixtures: weights, data, hyper-params ----------------------
    hyper = DKTHyperParams(train_iters=2, teacher_iters=2, num_steps=100)
    B, H, W = 1, 64, 96
    img1 = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    img1_clean = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    img2_clean = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    flow = (-rng.uniform(0, 8, (B, H, W))).astype(np.float32)
    valid = (rng.uniform(0, 1, (B, H, W)) > 0.2).astype(np.float32)

    # student/EMA from one random init, frozen teacher from another
    # (ft_dkt.py:139-151: restore_ckpt for student+EMA, restore_ckpt_T for
    # the teacher; distinct weights make the PL path observable)
    from tests.test_reference_parity import _Args, _load_reference_raft

    t_student = _build_torch_model()  # torch.manual_seed(0) inside
    ref_args = _Args(
        backbone_type="default", corr_implementation="reg",
        shared_backbone=False, corr_levels=4, corr_radius=4,
        n_downsample=2, context_norm="batch", slow_fast_gru=False,
        n_gru_layers=3, hidden_dims=[128, 128, 128], mixed_precision=False,
    )
    torch.manual_seed(1)
    t_teacher = _load_reference_raft()(ref_args)
    t_ema = _build_torch_model()  # seed 0 again == student weights

    student_sd = {k: v.clone() for k, v in t_student.state_dict().items()}
    teacher_sd = {k: v.clone() for k, v in t_teacher.state_dict().items()}

    # ---- our state from the SAME weights -----------------------------------
    cfg = RAFTStereoConfig(mixed_precision=False, corr_dtype="float32")
    model = RAFTStereo(cfg, iters=2, test_mode=True)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, H, W, 3)), jnp.zeros((B, H, W, 3))
    )
    vars_student = jax.tree_util.tree_map(
        jnp.asarray, import_reference_pth(student_sd, template)
    )
    vars_teacher = jax.tree_util.tree_map(
        jnp.asarray, import_reference_pth(teacher_sd, template)
    )
    state = create_dkt_state(
        cfg, hyper, jax.random.PRNGKey(0), (B, H, W),
        params=vars_student, teacher_params=vars_teacher,
    )

    # ---- the pinned F&E randoms (exact draws of our key split) -------------
    key = jax.random.PRNGKey(42)
    k_fgt, k_egt, _k_fpl, k_epl, _, _ = jax.random.split(key, 6)
    u_fgt = np.asarray(jax.random.uniform(k_fgt, (B,)), np.float32)
    p_egt = float(jax.random.uniform(k_egt, ()))
    p_epl = float(jax.random.uniform(k_epl, ()))

    # ---- our step -----------------------------------------------------------
    step_fn = make_dkt_train_step(cfg, hyper)
    batch = {
        "img1": jnp.asarray(img1), "img2": jnp.asarray(img2),
        "img1_clean": jnp.asarray(img1_clean), "img2_clean": jnp.asarray(img2_clean),
        "flow": jnp.asarray(flow), "valid": jnp.asarray(valid),
    }
    state1, metrics = step_fn(state, batch, key)
    assert float(metrics["ok"]) == 1.0

    # ---- the reference step in torch (ft_dkt.py:177-248) -------------------
    for m in (t_student, t_teacher, t_ema):
        m.cpu()
    t_student.train(); t_student.freeze_bn()           # :155-156
    t_teacher.eval(); t_teacher.freeze_bn()            # :159-162
    t_ema.eval(); t_ema.freeze_bn()                    # :164-168

    optimizer = torch.optim.AdamW(                     # fetch_optimizer :56-63
        t_student.parameters(), lr=hyper.lr, weight_decay=hyper.wdecay, eps=1e-8
    )
    scheduler = torch.optim.lr_scheduler.OneCycleLR(
        optimizer, hyper.lr, hyper.num_steps + 100,
        pct_start=0.01, cycle_momentum=False, anneal_strategy="linear",
    )

    # EMA lerp BEFORE the forwards (:179-181); parameters only, not buffers
    with torch.no_grad():
        for t_p, s_p in zip(t_ema.parameters(), t_student.parameters()):
            t_p.data = hyper.ema_decay * t_p.data + (1 - hyper.ema_decay) * s_p.data

    to_t = lambda a: torch.from_numpy(a).permute(0, 3, 1, 2)
    i1, i2 = to_t(img1), to_t(img2)
    i1c, i2c = to_t(img1_clean), to_t(img2_clean)
    disp_gt = torch.from_numpy(flow).unsqueeze(1)      # (B,1,H,W)
    valid_gt = torch.from_numpy(valid)                 # (B,H,W)

    with torch.no_grad():                              # requires_grad=False :160
        _, disp_pl = t_teacher(i1c, i2c, iters=hyper.teacher_iters, test_mode=True)
        _, disp_ema = t_ema(i1c, i2c, iters=hyper.teacher_iters, test_mode=True)
    valid_pl = torch.ones(disp_pl.shape).squeeze(1)    # :195

    # pin the reference's global RNG draws to OUR key-derived uniforms
    ens_draws = iter([p_egt, p_epl])
    monkeypatch.setattr(fande.random, "random", lambda: next(ens_draws))
    real_rand = torch.rand
    monkeypatch.setattr(
        torch, "rand",
        lambda *a, **k: real_rand(*a, **k).copy_(
            torch.from_numpy(u_fgt.reshape(-1, 1))
        ),
    )

    disp_gt_aug, valid_gt_aug = fande.FandE_Filter(    # :204-205
        disp_gt, disp_ema, valid_gt.unsqueeze(1), withprob=True, threshold=hyper.tau_gt
    )
    disp_gt_aug = fande.FandE_Ensemble(
        disp_gt_aug, disp_ema, valid_gt_aug.unsqueeze(1),
        clamp=hyper.clamp, threshold=hyper.tau_gt,
    )
    disp_pl_aug, valid_pl_aug = fande.FandE_Filter(    # :209-210
        disp_pl, disp_ema, valid_pl.unsqueeze(1), withprob=False, threshold=hyper.tau_pl
    )
    disp_pl_aug = fande.FandE_Ensemble(
        disp_pl_aug, disp_ema, valid_pl_aug.unsqueeze(1),
        clamp=False, threshold=hyper.tau_pl,
    )
    monkeypatch.setattr(torch, "rand", real_rand)

    optimizer.zero_grad()
    results = t_student(i1, i2, iters=hyper.train_iters, flow_init=None)  # :223
    loss_gt, _, _ = ref_loss.sequence_loss_raft(results, disp_gt_aug, valid_gt_aug)
    loss_pl, _, _ = ref_loss.sequence_loss_raft(results, disp_pl_aug, valid_pl_aug)
    loss = loss_gt + loss_pl * 1.0                     # :234
    loss.backward()
    torch.nn.utils.clip_grad_norm_(t_student.parameters(), 1.0)  # :244
    optimizer.step()
    scheduler.step()

    # ---- compare ------------------------------------------------------------
    # scalar losses first: F&E masks are hard thresholds on teacher outputs
    # that agree to ~1e-5, so mask flips are rare and the losses must agree
    # tightly
    np.testing.assert_allclose(float(metrics["loss"]), float(loss), rtol=2e-3)
    np.testing.assert_allclose(float(metrics["loss_GT"]), float(loss_gt), rtol=2e-3)
    np.testing.assert_allclose(float(metrics["loss_PL"]), float(loss_pl), rtol=2e-3)

    # post-step parameters: map the updated torch state dict through the
    # importer and compare leaf-wise. The first AdamW step moves each weight
    # by ≈ lr₀·ĝ/(√v̂+ε) ≈ lr₀·sign(g) with lr₀ = max_lr/25 = 8e-6, so a
    # per-element bound of 2.5·lr₀ tolerates sign flips only where the two
    # frameworks' gradients straddle zero; systematic divergence (wrong lr,
    # wrong decay, wrong clip, wrong loss weighting) shifts EVERY element
    # and fails the mean bound.
    post_sd = t_student.state_dict()
    theirs = jax.tree_util.tree_map(np.asarray, import_reference_pth(post_sd, template))
    ours = jax.tree_util.tree_map(np.asarray, state1.params)

    lr0 = hyper.lr / 25.0
    flat_o, _ = jax.tree_util.tree_flatten(ours["params"])
    flat_t, _ = jax.tree_util.tree_flatten(theirs["params"])
    flat_p, _ = jax.tree_util.tree_flatten(
        jax.tree_util.tree_map(np.asarray, state.params["params"])
    )
    assert len(flat_o) == len(flat_t) == len(flat_p)
    max_err = max(float(np.abs(o - t).max()) for o, t in zip(flat_o, flat_t))
    mean_err = float(
        np.mean([np.abs(o - t).mean() for o, t in zip(flat_o, flat_t)])
    )
    # nearly every TRAINABLE leaf actually moved (zero-init biases with zero
    # grad legitimately stay put: AdamW's decoupled decay is p-proportional)
    moved = sum(int(not np.array_equal(o, p)) for o, p in zip(flat_o, flat_p))
    assert moved > 0.9 * len(flat_o), f"only {moved}/{len(flat_o)} leaves moved"
    assert max_err < 2.5 * lr0, f"max param delta err {max_err} vs lr0 {lr0}"
    assert mean_err < 0.1 * lr0, f"mean param err {mean_err}"
    # frozen buffers stayed bit-identical on both sides
    for a, b in zip(
        jax.tree_util.tree_leaves(ours["batch_stats"]),
        jax.tree_util.tree_leaves(theirs["batch_stats"]),
    ):
        np.testing.assert_array_equal(a, b)
