"""Subprocess worker for the two-process multi-host test (test_multihost.py).

Each process: CPU platform, gloo cross-process collectives, distributed init
through the SAME entry point cli/train.py uses (parallel.initialize_multihost),
then a global-mesh reduction whose value proves both processes' shards took
part. Run: python tests/_multihost_worker.py <pid> <nproc> <port>.
"""

import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    sys.path.insert(0, ".")
    from dkt_stereo_tpu.parallel import initialize_multihost

    initialize_multihost(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid, jax.process_index()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dkt_stereo_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh()  # all global devices, 'data' axis
    n_global = jax.device_count()
    n_local = jax.local_device_count()
    assert n_global == nproc * n_local, (n_global, n_local)

    # per-process local shard of a global batch: process p contributes rows
    # of value p+1; the global mean is therefore known in closed form
    rows_per_proc = 2 * n_local
    local = np.full((rows_per_proc, 4), float(pid + 1), np.float32)
    garr = jax.make_array_from_process_local_data(
        batch_sharding(mesh), local, global_shape=(rows_per_proc * nproc, 4)
    )

    # jit with replicated output: XLA inserts the cross-process reduction
    out = jax.jit(
        lambda x: jnp.mean(x) * 1000 + jnp.sum(x),
        out_shardings=NamedSharding(mesh, P()),
    )(garr)
    want_mean = sum(p + 1 for p in range(nproc)) / nproc
    want_sum = sum((p + 1) * rows_per_proc * 4 for p in range(nproc))
    got = float(np.asarray(out))
    want = want_mean * 1000 + want_sum
    assert abs(got - want) < 1e-3, (got, want)
    print(f"RESULT {pid} {got}", flush=True)

    if "--train-step" in sys.argv:
        _train_step(pid, nproc, mesh)


def _train_step(pid, nproc, mesh):
    """One real DKT train step (RAFT-Stereo) across the 2-process mesh:
    per-host batch shards in, replicated state, XLA-inserted gradient
    all-reduce — the multi-host path cli/train.py runs (ft_dkt.py:119-125
    works-out-of-the-box analogue). Both processes must get the same loss."""
    import jax
    import numpy as np

    from dkt_stereo_tpu.models import get_model
    from dkt_stereo_tpu.models.registry import make_loss_adapter
    from dkt_stereo_tpu.parallel import replicate, shard_batch
    from dkt_stereo_tpu.train import DKTHyperParams, create_dkt_state, make_dkt_train_step

    hyper = DKTHyperParams(train_iters=2, teacher_iters=2, num_steps=100)
    n_local = jax.local_device_count()
    B_local, H, W = n_local, 32, 64

    # per-host shard: DIFFERENT data per host (seeded by pid), as the real
    # loader produces (num_hosts/host_id sharding)
    rng = np.random.default_rng(100 + pid)
    batch = {
        "img1": rng.uniform(0, 255, (B_local, H, W, 3)).astype(np.float32),
        "img2": rng.uniform(0, 255, (B_local, H, W, 3)).astype(np.float32),
        "img1_clean": rng.uniform(0, 255, (B_local, H, W, 3)).astype(np.float32),
        "img2_clean": rng.uniform(0, 255, (B_local, H, W, 3)).astype(np.float32),
        "flow": -rng.uniform(0, 20, (B_local, H, W)).astype(np.float32),
        "valid": np.ones((B_local, H, W), np.float32),
    }
    batch = shard_batch(batch, mesh)
    assert batch["img1"].shape[0] == B_local * nproc  # global batch

    model_cls, cfg_cls, _ = get_model("RAFTStereo")
    cfg = cfg_cls(mixed_precision=False)
    state = create_dkt_state(
        cfg, hyper, jax.random.PRNGKey(0), (B_local, H, W), model_cls=model_cls
    )
    state = replicate(state, mesh)
    step_fn = make_dkt_train_step(
        cfg, hyper, model_cls=model_cls,
        loss_adapter=make_loss_adapter("RAFTStereo", cfg),
    )
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(metrics)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    assert int(new_state.step) == 1
    print(f"TRAIN {pid} {loss:.6f}", flush=True)

    ckdir = next(
        (a.split("=", 1)[1] for a in sys.argv if a.startswith("--ckdir=")), None
    )
    if ckdir:
        import os

        from dkt_stereo_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

        def probe_of(tree):
            return float(
                sum(np.abs(l).sum() for l in jax.tree_util.tree_leaves(tree))
            )

        # cli/train.py's in-loop save path: EVERY process calls the Orbax
        # save (a cross-process sync point) ...
        path = save_checkpoint(ckdir, new_state, 1)
        # ... then ONLY host 0 pulls process-local copies of the replicated
        # params for validation — asymmetric exactly like production: if the
        # pull ever required a cross-process collective (params accidentally
        # sharded, say), host 0 would hang here with no partner and the test
        # times out, which is the deadlock mode this pins
        if pid == 0:
            val_params = jax.tree_util.tree_map(np.asarray, new_state.params)
            probe_mem = probe_of(val_params)
        # content oracle: both processes restore the checkpoint (typed
        # restore, replicated shardings) and report the restored probe;
        # host 0 additionally checks it matches the in-memory params
        restored = restore_checkpoint(path, new_state)
        probe = probe_of(jax.tree_util.tree_map(np.asarray, restored.params))
        if pid == 0:
            assert abs(probe - probe_mem) < 1e-3 * max(1.0, abs(probe_mem)), (
                probe, probe_mem,
            )
        print(f"SAVED {pid} {os.path.basename(path)} {probe:.4f}", flush=True)


if __name__ == "__main__":
    main()
