"""DKT layer: F&E golden tests vs torch reference math; EMA; full train step."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from dkt_stereo_tpu.dkt import ema_update, fande_ensemble, fande_filter
from dkt_stereo_tpu.models import RAFTStereoConfig
from dkt_stereo_tpu.train import DKTHyperParams, create_dkt_state, make_dkt_train_step
from dkt_stereo_tpu.train.state import onecycle_linear


def torch_fande_filter(source, target, valid, withprob, threshold, prob_vals=None):
    """FandE/__init__.py:24-39 recomputed (prob injected for determinism)."""
    valid_consistent = (torch.sum((target - source) ** 2, dim=1).sqrt() < threshold)
    valid_consistent = valid_consistent.unsqueeze(1) * valid
    source = source * valid
    if withprob:
        num_vc = valid_consistent.flatten(1).sum(dim=-1, keepdim=True)
        num_v = valid.flatten(1).sum(dim=-1, keepdim=True)
        pt = num_vc / num_v
        prob = prob_vals
        sel = (prob < pt).unsqueeze(-1).unsqueeze(-1)
        sel = sel * (1 - valid_consistent) * valid
        aug_valid = (valid_consistent + (1 - valid_consistent) * sel) * valid
    else:
        aug_valid = valid_consistent
    return source * aug_valid, aug_valid.squeeze(1)


def torch_fande_ensemble(source, target, valid, clamp, threshold, prob):
    valid_consistent = (torch.sum((target - source) ** 2, dim=1).sqrt() < threshold)
    valid_consistent = valid_consistent.unsqueeze(1) * valid
    source = source * valid
    target = target * valid
    offset = torch.sum((source - target) ** 2, dim=1).sqrt().unsqueeze(1)
    offset = prob * offset
    if clamp:
        offset = torch.clamp(offset, max=clamp)
    direction = torch.zeros_like(source)
    direction[source < target] = +1.0
    direction[source > target] = -1.0
    aug = direction * offset * valid_consistent
    return (source + aug) * valid


def test_fande_filter_plain_matches_torch(rng):
    B, H, W = 2, 8, 10
    src = rng.standard_normal((B, H, W)).astype(np.float32) * 5
    tgt = rng.standard_normal((B, H, W)).astype(np.float32) * 5
    valid = (rng.uniform(size=(B, H, W)) > 0.3).astype(np.float32)
    out, v = fande_filter(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(valid), jax.random.PRNGKey(0),
        withprob=False, threshold=3.0,
    )
    t_out, t_v = torch_fande_filter(
        torch.from_numpy(src).unsqueeze(1),
        torch.from_numpy(tgt).unsqueeze(1),
        torch.from_numpy(valid).unsqueeze(1),
        False, 3.0,
    )
    np.testing.assert_allclose(np.asarray(out), t_out.squeeze(1).numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), t_v.numpy(), atol=1e-6)


def test_fande_filter_withprob_branches(rng):
    # extreme keys force the Bernoulli both ways; check both behaviors
    B, H, W = 1, 6, 6
    src = np.zeros((B, H, W), np.float32)
    tgt = np.full((B, H, W), 10.0, np.float32)  # all inconsistent (|t-s|=10>3)
    tgt[0, :3] = 0.0  # top half consistent
    valid = np.ones((B, H, W), np.float32)
    # p = 18/36 = 0.5. If u < 0.5 → inconsistent pixels re-admitted.
    branches = set()
    for key_int in range(12):
        out, v = fande_filter(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(valid),
            jax.random.PRNGKey(key_int), withprob=True, threshold=3.0,
        )
        v = np.asarray(v)
        # consistent half always kept
        assert (v[0, :3] == 1).all()
        # inconsistent half: all-or-nothing per image
        assert (v[0, 3:] == v[0, 3, 0]).all()
        branches.add(float(v[0, 3, 0]))
    # the Bernoulli must ACTUALLY fire both ways across keys (p=0.5, 12
    # draws: P(one-sided) ≈ 5e-4) — a dead re-admission path passed before
    assert branches == {0.0, 1.0}, branches


def test_fande_ensemble_matches_torch(rng):
    B, H, W = 2, 8, 10
    src = (rng.standard_normal((B, H, W)) * 4).astype(np.float32)
    tgt = (rng.standard_normal((B, H, W)) * 4).astype(np.float32)
    valid = (rng.uniform(size=(B, H, W)) > 0.2).astype(np.float32)
    key = jax.random.PRNGKey(7)
    prob = float(jax.random.uniform(key, ()))
    for clamp in (False, 1.0):
        out = fande_ensemble(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(valid), key,
            clamp=clamp, threshold=3.0,
        )
        t_out = torch_fande_ensemble(
            torch.from_numpy(src).unsqueeze(1),
            torch.from_numpy(tgt).unsqueeze(1),
            torch.from_numpy(valid).unsqueeze(1),
            clamp, 3.0, prob,
        )
        np.testing.assert_allclose(
            np.asarray(out), t_out.squeeze(1).numpy(), atol=1e-5, err_msg=f"clamp={clamp}"
        )


def test_ema_update():
    t = {"a": jnp.ones((3,)), "b": jnp.zeros((2,))}
    s = {"a": jnp.zeros((3,)), "b": jnp.ones((2,))}
    out = ema_update(t, s, 0.9)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.9)
    np.testing.assert_allclose(np.asarray(out["b"]), 0.1)


def test_onecycle_schedule_matches_torch():
    torch_model = torch.nn.Linear(1, 1)
    opt = torch.optim.AdamW(torch_model.parameters(), lr=2e-4)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, 2e-4, total_steps=1100, pct_start=0.01, cycle_momentum=False,
        anneal_strategy="linear",
    )
    ours = onecycle_linear(2e-4, 1100, 0.01)
    torch_lrs, our_lrs = [], []
    for i in range(1100):
        torch_lrs.append(sched.get_last_lr()[0])
        our_lrs.append(float(ours(i)))
        opt.step()
        sched.step()
    # every step incl. the 11-step warmup ramp; tight tolerance catches a
    # wrong pct_start or an off-by-one schedule position (the old
    # stride-100/rtol-5% check skipped the entire warmup)
    np.testing.assert_allclose(our_lrs, torch_lrs, rtol=1e-4, atol=1e-9)


def test_dkt_train_step_end_to_end(rng):
    cfg = RAFTStereoConfig(mixed_precision=False, context_norm="instance")
    hyper = DKTHyperParams(train_iters=2, teacher_iters=2, num_steps=100)
    B, H, W = 1, 32, 64
    state = create_dkt_state(cfg, hyper, jax.random.PRNGKey(0), (B, H, W))
    batch = {
        "img1": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "img2": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "img1_clean": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "img2_clean": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "flow": jnp.asarray(-rng.uniform(0, 20, (B, H, W)).astype(np.float32)),
        "valid": jnp.ones((B, H, W), jnp.float32),
    }
    step_fn = make_dkt_train_step(cfg, hyper)
    state1, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert int(state1.step) == 1
    assert float(metrics["ok"]) == 1.0
    assert np.isfinite(float(metrics["loss"]))
    # params changed, EMA barely moved (decay 0.99999), teacher untouched
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(state1.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    t0 = jax.tree_util.tree_leaves(state.teacher_params)[0]
    t1 = jax.tree_util.tree_leaves(state1.teacher_params)[0]
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    # second step runs from updated state
    state2, metrics2 = step_fn(state1, batch, jax.random.PRNGKey(2))
    assert int(state2.step) == 2


def test_dkt_train_step_freezes_batch_stats(rng):
    """Regression: with context_norm='batch', BN running stats are frozen
    buffers — the optimizer must never touch them (the reference's freeze_bn,
    tools/ft_dkt.py:155-167). Round-1 bug: AdamW(+wdecay) was applied to the
    whole variables dict, so batch_stats drifted every step."""
    cfg = RAFTStereoConfig(mixed_precision=False, context_norm="batch")
    hyper = DKTHyperParams(train_iters=2, teacher_iters=2, num_steps=100)
    B, H, W = 1, 32, 64
    state = create_dkt_state(cfg, hyper, jax.random.PRNGKey(0), (B, H, W))
    assert "batch_stats" in state.params
    # optimizer state exists only for the trainable collection
    n_trainable = len(jax.tree_util.tree_leaves(state.params["params"]))
    adamw_state = state.opt_state[1][0]  # chain(clip, adamw) -> ScaleByAdamState
    assert len(jax.tree_util.tree_leaves(adamw_state.mu)) == n_trainable
    batch = {
        "img1": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "img2": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "img1_clean": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "img2_clean": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "flow": jnp.asarray(-rng.uniform(0, 20, (B, H, W)).astype(np.float32)),
        "valid": jnp.ones((B, H, W), jnp.float32),
    }
    step_fn = make_dkt_train_step(cfg, hyper)
    state1, _ = step_fn(state, batch, jax.random.PRNGKey(1))
    state2, _ = step_fn(state1, batch, jax.random.PRNGKey(2))
    # trainable weights moved ...
    p0 = jax.tree_util.tree_leaves(state.params["params"])[0]
    p2 = jax.tree_util.tree_leaves(state2.params["params"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p2))
    # ... but every batch_stats leaf is BIT-identical after two steps
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params["batch_stats"]),
        jax.tree_util.tree_leaves(state2.params["batch_stats"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # EMA/teacher batch_stats stay identical too (lerp of equal values)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.ema_params["batch_stats"]),
        jax.tree_util.tree_leaves(state2.ema_params["batch_stats"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dkt_train_step_cascade(rng):
    cfg = RAFTStereoConfig(mixed_precision=False, context_norm="instance")
    hyper = DKTHyperParams(train_iters=2, teacher_iters=2, num_steps=100, cascade_train=True)
    B, H, W = 1, 32, 64
    state = create_dkt_state(cfg, hyper, jax.random.PRNGKey(0), (B, H, W))
    batch = {
        "img1": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "img2": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "img1_clean": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "img2_clean": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "flow": jnp.asarray(-rng.uniform(0, 20, (B, H, W)).astype(np.float32)),
        "valid": jnp.ones((B, H, W), jnp.float32),
    }
    step_fn = make_dkt_train_step(cfg, hyper)
    state1, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert int(state1.step) == 1
    assert float(metrics["ok"]) == 1.0
    assert np.isfinite(float(metrics["loss"]))


def test_latest_checkpoint(tmp_path):
    """--auto_resume's step_N discovery: newest committed step wins;
    in-progress orbax tmp dirs and stray files are ignored."""
    from dkt_stereo_tpu.train.checkpoint import latest_checkpoint

    assert latest_checkpoint(str(tmp_path / "missing")) is None
    for name in ("step_1", "step_10", "step_2",
                 "step_11.orbax-checkpoint-tmp-123"):
        (tmp_path / name).mkdir()
    (tmp_path / "step_99").write_text("not a dir")  # file, not a checkpoint
    assert latest_checkpoint(str(tmp_path)).endswith("step_10")


def test_cascade_upsample2x_contracts():
    """×2 nearest upsample of every model-output contract: disparity-valued
    fields double in value, PCV mixture weights don't."""
    from dkt_stereo_tpu.train.dkt_step import _cascade_upsample2x

    rng = np.random.default_rng(0)
    out = {
        "disp_preds": jnp.asarray(rng.uniform(1, 5, (2, 1, 4, 6)).astype(np.float32)),
        "init_disp": jnp.asarray(rng.uniform(1, 5, (1, 4, 6)).astype(np.float32)),
        "output_list": (
            jnp.asarray(rng.uniform(1, 5, (1, 4, 6)).astype(np.float32)),
            jnp.asarray(rng.uniform(1, 5, (2, 1, 4, 6)).astype(np.float32)),
            jnp.asarray(rng.uniform(1, 5, (2, 1, 4, 6, 4)).astype(np.float32)),
            jnp.asarray(rng.uniform(0, 1, (2, 1, 4, 6, 4)).astype(np.float32)),
            jnp.asarray(rng.uniform(1, 4, (2, 1, 4, 6, 4)).astype(np.float32)),
        ),
    }
    up = _cascade_upsample2x(out)
    assert up["disp_preds"].shape == (2, 1, 8, 12)
    np.testing.assert_allclose(up["disp_preds"][:, :, ::2, ::2], 2 * out["disp_preds"])
    assert up["init_disp"].shape == (1, 8, 12)
    np.testing.assert_allclose(up["init_disp"][:, ::2, ::2], 2 * out["init_disp"])
    refined, disp_seq, mu, w, sigma = up["output_list"]
    assert refined.shape == (1, 8, 12) and mu.shape == (2, 1, 8, 12, 4)
    np.testing.assert_allclose(refined[:, ::2, ::2], 2 * out["output_list"][0])
    np.testing.assert_allclose(mu[:, :, ::2, ::2], 2 * out["output_list"][2])
    np.testing.assert_allclose(w[:, :, ::2, ::2], out["output_list"][3])  # unscaled
    np.testing.assert_allclose(sigma[:, :, ::2, ::2], 2 * out["output_list"][4])


def test_dkt_skipped_step_keeps_schedule_position(rng):
    """ok=False steps revert opt_state (reference: scheduler.step() not
    called on skip); the logged learning_rate must track the APPLIED
    schedule position — state.step still increments and would drift."""
    from dkt_stereo_tpu.train.state import applied_step_count, onecycle_linear

    cfg = RAFTStereoConfig(mixed_precision=False, context_norm="instance")
    hyper = DKTHyperParams(train_iters=2, teacher_iters=2, num_steps=100)
    B, H, W = 1, 32, 64
    state = create_dkt_state(cfg, hyper, jax.random.PRNGKey(0), (B, H, W))
    r = np.random.default_rng(0)

    def mkbatch(nan_img=False):
        img1 = r.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
        if nan_img:
            img1[0, 0, 0, 0] = np.nan
        return {
            "img1": jnp.asarray(img1),
            "img2": jnp.asarray(r.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
            "img1_clean": jnp.asarray(r.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
            "img2_clean": jnp.asarray(r.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
            "flow": jnp.asarray(-r.uniform(0, 20, (B, H, W)).astype(np.float32)),
            "valid": jnp.ones((B, H, W), jnp.float32),
        }

    step_fn = make_dkt_train_step(cfg, hyper)
    schedule = onecycle_linear(hyper.lr, hyper.num_steps + 100)

    state1, m1 = step_fn(state, mkbatch(nan_img=True), jax.random.PRNGKey(1))
    assert float(m1["ok"]) == 0.0
    assert int(state1.step) == 1  # step counts attempts
    assert int(applied_step_count(state1.opt_state)) == 0  # no applied update
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(state1.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))

    state2, m2 = step_fn(state1, mkbatch(), jax.random.PRNGKey(2))
    assert float(m2["ok"]) == 1.0
    # the good step ran at schedule position 0, not schedule(state.step)=1
    np.testing.assert_allclose(float(m2["learning_rate"]), float(schedule(0)))
    assert int(applied_step_count(state2.opt_state)) == 1


def test_dkt_train_step_batched_teachers(rng):
    """batched_teachers=True runs the frozen+EMA teacher forwards as ONE
    vmapped program (train/dkt_step.py step 2). Pins (a) slot independence —
    with teacher==EMA params both vmap slots are bit-identical, so neither
    slot leaks into the other — and (b) closeness to the sequential path:
    XLA lowers the vmapped convs to grouped convs whose float reassociation
    differs from the unbatched lowering by ~1e-6 relative per op, so the
    post-step params must agree to within the first-step AdamW move
    (≈ lr0·sign(g)); a slot swap or a broadcast bug would blow both bounds."""
    cfg = RAFTStereoConfig(mixed_precision=False, context_norm="instance")
    B, H, W = 1, 32, 64
    batch = {
        "img1": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "img2": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "img1_clean": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "img2_clean": jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "flow": jnp.asarray(-rng.uniform(0, 20, (B, H, W)).astype(np.float32)),
        "valid": jnp.ones((B, H, W), jnp.float32),
    }
    key = jax.random.PRNGKey(1)

    hyper_seq = DKTHyperParams(train_iters=2, teacher_iters=2, num_steps=100)
    hyper_bat = DKTHyperParams(
        train_iters=2, teacher_iters=2, num_steps=100, batched_teachers=True
    )
    state = create_dkt_state(cfg, hyper_seq, jax.random.PRNGKey(0), (B, H, W))

    # (a) slot independence: teacher/EMA/student all start from the same
    # weights, so inside the batched step the two vmap slots carry identical
    # params and must produce identical pseudo-labels — loss_GT/loss_PL see
    # the same F&E inputs as the sequential path up to pure reassociation.
    from dkt_stereo_tpu.models import RAFTStereo

    teacher = RAFTStereo(cfg, iters=2, test_mode=True)
    stacked = jax.tree_util.tree_map(
        lambda a: jnp.stack([a, a]), state.teacher_params
    )
    d_both = jax.jit(
        jax.vmap(lambda p: teacher.apply(p, batch["img1_clean"], batch["img2_clean"])[1])
    )(stacked)
    np.testing.assert_array_equal(np.asarray(d_both[0]), np.asarray(d_both[1]))

    s_seq, m_seq = make_dkt_train_step(cfg, hyper_seq)(state, batch, key)
    s_bat, m_bat = make_dkt_train_step(cfg, hyper_bat)(state, batch, key)
    assert float(m_bat["ok"]) == 1.0

    # (b) the two paths see teacher outputs differing only by reassociation
    # noise; losses and the post-step parameter move must agree.
    np.testing.assert_allclose(
        float(m_bat["loss"]), float(m_seq["loss"]), rtol=1e-3
    )
    lr0 = hyper_seq.lr / 25.0
    for a, b in zip(
        jax.tree_util.tree_leaves(s_bat.params["params"]),
        jax.tree_util.tree_leaves(s_seq.params["params"]),
    ):
        assert float(np.abs(np.asarray(a) - np.asarray(b)).max()) < 2.5 * lr0
