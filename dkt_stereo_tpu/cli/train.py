"""DKT fine-tuning driver (rebuild of tools/ft_dkt.py as a TPU program).

Usage mirrors the reference:
  python -m dkt_stereo_tpu.cli.train --config configs/raft_stereo/base.json \
      --train_datasets booster --restore_ckpt <ckpt or .pth> ...

TPU-native structure: one jitted step (EMA + teachers + F&E + student +
optimizer, train/dkt_step.py) over a data-parallel mesh; the host loop only
feeds sharded batches, logs, validates, and checkpoints.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    # tools/ft_dkt.py:312-344 flags
    p.add_argument("--config", required=True)
    p.add_argument("--name", default="model")
    p.add_argument("--save_dir", default="runs/debug")
    p.add_argument("--restore_ckpt", default=None)
    p.add_argument("--restore_ckpt_T", default=None)
    p.add_argument(
        "--restore_weights_only",
        action="store_true",
        help="take params/EMA/teacher from an Orbax --restore_ckpt but start "
        "a FRESH run (step 0, fresh optimizer + schedule) — the two-stage "
        "recipes' stage-2 semantics (the reference restores state_dict only, "
        "tools/ft_dkt.py:133-151)",
    )
    p.add_argument(
        "--auto_resume",
        action="store_true",
        help="resume from the newest step_N checkpoint in --save_dir when one "
        "exists (preemption recovery: relaunch the identical command; the "
        "orbax state — incl. optimizer/schedule — overrides --restore_ckpt)",
    )
    p.add_argument("--pretrained_backbone", default=None,
                   help="raw timm mobilenetv2_100 checkpoint (.pth/.npz) for "
                        "the IGEV/CGI trunk (the reference's "
                        "timm pretrained=True, extractor.py:330); applied "
                        "when no full --restore_ckpt is given")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--train_datasets", nargs="+", default=["sceneflow"])
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--num_steps", type=int, default=200000)
    p.add_argument("--image_size", type=int, nargs="+", default=[320, 720])
    p.add_argument("--train_iters", type=int, default=16)
    p.add_argument("--wdecay", type=float, default=1e-5)
    p.add_argument("--cascade_train", action="store_true")
    p.add_argument("--batched_teachers", action="store_true",
                   help="run the frozen+EMA teacher forwards as one vmapped "
                        "program (identical math up to float reassociation; "
                        "also enabled by batched_teachers:true in --config)")
    p.add_argument("--ema_decay", type=float, default=0.99999)
    p.add_argument("--clamp", type=float, default=1.0)
    p.add_argument("--tau_gt", type=float, default=3.0)
    p.add_argument("--tau_pl", type=float, default=3.0)
    p.add_argument("--valid_iters", type=int, default=32)
    p.add_argument("--img_gamma", type=float, nargs="+", default=None)
    p.add_argument("--saturation_range", type=float, nargs="+", default=[0, 1.4])
    p.add_argument("--do_flip", default=False, choices=["h", "v", False])
    p.add_argument("--spatial_scale", type=float, nargs="+", default=[-0.2, 0.4])
    p.add_argument("--noyjitter", action="store_true")
    # NeRF-Stereo training (loss_func=ns_loss + --train_datasets nerf_stereo).
    # The reference's fetch_dataloader reads args.conf_threshold /
    # args.disp_threshold (core/stereo_datasets.py:530-531) but its CLI never
    # defines them — defined here with the NS defaults; honored by ns_loss.
    p.add_argument("--conf_threshold", type=float, default=0.5)
    p.add_argument("--disp_threshold", type=float, default=512.0)
    p.add_argument("--ns_num_tri", type=int, default=None,
                   help="trinocular samples per global batch when mixing "
                        "nerf_stereo with binocular datasets (default: "
                        "proportional to pool sizes; the split is static so "
                        "the step compiles once)")
    # TPU-specific
    p.add_argument("--data_root", default="data")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--num_workers", type=int, default=16)
    p.add_argument("--validation_frequency", type=int, default=1000)
    # multi-host DP (DCN): one process per host, same command + distinct
    # --process_id on every host (jax.distributed bring-up)
    p.add_argument("--coordinator_address", default=None,
                   help="host:port of process 0, e.g. 10.0.0.1:1234")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    # observability (train/profiling.py)
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace (XLA ops + Pallas "
                        "kernels, TensorBoard-viewable) of steps "
                        "[--profile_start, --profile_start+--profile_steps)")
    p.add_argument("--profile_start", type=int, default=3,
                   help="first step to trace (skip compile + warm-up)")
    p.add_argument("--profile_steps", type=int, default=3)
    p.add_argument("--profile_port", type=int, default=None,
                   help="also start a live jax.profiler server on this port")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize (jax.checkpoint) each refinement "
                        "iteration in the backward pass: activation HBM "
                        "drops from O(train_iters) to O(1) step activations "
                        "for one extra forward per iteration; numerics "
                        "identical (tests/test_remat.py)")
    return p.parse_args(argv)


def train(args) -> str:
    # multi-host bring-up must precede any other jax call (device discovery)
    from dkt_stereo_tpu.parallel import initialize_multihost

    initialize_multihost(args.coordinator_address, args.num_processes, args.process_id)

    import jax
    import jax.numpy as jnp

    from dkt_stereo_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from dkt_stereo_tpu.cli.config import load_model_config, merge_config
    from dkt_stereo_tpu.data.datasets import fetch_dataset
    from dkt_stereo_tpu.data.loader import StereoLoader
    from dkt_stereo_tpu.eval.validate import (
        make_forward_fn,
        validate_booster,
        validate_eth3d,
        validate_kitti,
        validate_middlebury,
    )
    from dkt_stereo_tpu.models import get_model
    from dkt_stereo_tpu.parallel import make_mesh, replicate, shard_batch
    from dkt_stereo_tpu.train import DKTHyperParams, create_dkt_state, make_dkt_train_step
    from dkt_stereo_tpu.train.checkpoint import (
        import_reference_pth,
        restore_checkpoint,
        save_checkpoint,
    )
    from dkt_stereo_tpu.train.state import onecycle_linear
    from dkt_stereo_tpu.utils.logging import Logger

    config = load_model_config(args.config)
    # strict-disjoint check (ft_dkt.py:347-350); batched_teachers may come
    # from EITHER surface (recipe configs ship it true, the CLI flag turns it
    # on over a parity config) — the explicit `or` below resolves the union
    merge_config(args, config, allow=("batched_teachers",))
    if getattr(args, "remat", False):
        config["remat_iters"] = True
    model_cls, cfg_cls, _loss = get_model(config["model"])
    cfg = cfg_cls.from_dict(config)
    from dkt_stereo_tpu.models.registry import make_loss_adapter
    # the reference's __losses__ dispatch (tools/ft_dkt.py:117-118): the
    # config's loss_func key selects the loss by name; unknown names raise
    loss_name = config.get("loss_func")
    ns_mode = loss_name == "ns_loss"
    loss_adapter = None if ns_mode else make_loss_adapter(config["model"], cfg, loss_name)

    hyper = DKTHyperParams(
        lr=args.lr,
        wdecay=args.wdecay,
        num_steps=args.num_steps,
        train_iters=args.train_iters,
        valid_iters=args.valid_iters,
        ema_decay=args.ema_decay,
        tau_gt=args.tau_gt,
        tau_pl=args.tau_pl,
        clamp=args.clamp,
        cascade_train=args.cascade_train,
        batched_teachers=args.batched_teachers
        or bool(config.get("batched_teachers", False)),
    )

    num_hosts = jax.process_count()
    host_id = jax.process_index()
    mesh = make_mesh()
    if args.batch_size % mesh.devices.size:
        raise SystemExit(
            f"--batch_size {args.batch_size} must be divisible by the "
            f"{mesh.devices.size}-device data mesh (global batch is sharded "
            "over all devices)"
        )

    dataset = fetch_dataset(
        args.train_datasets,
        tuple(args.image_size),
        tuple(args.spatial_scale),
        args.saturation_range,
        args.img_gamma,
        args.do_flip,
        args.noyjitter,
        data_root=args.data_root,
        conf_threshold=args.conf_threshold,
        disp_threshold=args.disp_threshold,
    )
    from dkt_stereo_tpu.data.triplet import split_modalities

    bi_ds, tri_ds = split_modalities(dataset)
    if ns_mode:
        if tri_ds is None:
            raise SystemExit(
                "loss_func=ns_loss needs trinocular data: add nerf_stereo "
                "to --train_datasets"
            )
        from dkt_stereo_tpu.data.loader import MixedStereoLoader

        loader = MixedStereoLoader(
            bi_ds,
            tri_ds,
            batch_size=args.batch_size,
            num_tri=args.ns_num_tri,
            num_workers=args.num_workers,
            seed=args.seed,
            num_hosts=num_hosts,
            host_id=host_id,
        )
        if loader.nb % mesh.devices.size or loader.nt % mesh.devices.size:
            raise SystemExit(
                f"NS modality split nb={loader.nb}/nt={loader.nt} must each "
                f"divide the {mesh.devices.size}-device mesh (per-modality "
                "slices are batch-sharded); adjust --ns_num_tri"
            )
    else:
        if tri_ds is not None:
            raise SystemExit(
                "nerf_stereo training data needs loss_func=ns_loss in the "
                "config (the NS step consumes the trinocular batch contract)"
            )
        loader = StereoLoader(
            dataset,
            batch_size=args.batch_size,
            num_workers=args.num_workers,
            seed=args.seed,
            num_hosts=num_hosts,
            host_id=host_id,
        )

    if len(loader) == 0:
        # an empty epoch would spin the training while-loop forever
        raise SystemExit(
            f"dataset too small for --batch_size {args.batch_size}: the "
            f"loader yields 0 batches per epoch ({len(dataset)} samples)"
        )

    H, W = args.image_size
    state = create_dkt_state(cfg, hyper, jax.random.PRNGKey(args.seed), (args.batch_size, H, W), model_cls=model_cls)

    if args.pretrained_backbone and not args.restore_ckpt:
        from dkt_stereo_tpu.train.checkpoint import import_timm_mobilenetv2

        variables = jax.tree_util.tree_map(
            jnp.asarray, import_timm_mobilenetv2(args.pretrained_backbone, state.params)
        )
        state = state.replace(params=variables, ema_params=variables, teacher_params=variables)

    if args.auto_resume:
        from dkt_stereo_tpu.train.checkpoint import latest_checkpoint

        latest = latest_checkpoint(args.save_dir)
        if latest is not None:
            logging.info("auto-resume from %s", latest)
            args.restore_ckpt = latest

    if args.restore_ckpt:
        if args.restore_ckpt.endswith(".pth"):
            variables = import_reference_pth(args.restore_ckpt, state.params)
            variables = jax.tree_util.tree_map(jnp.asarray, variables)
            teacher = variables
            if args.restore_ckpt_T and args.restore_ckpt_T != args.restore_ckpt:
                teacher = jax.tree_util.tree_map(
                    jnp.asarray, import_reference_pth(args.restore_ckpt_T, state.params)
                )
            state = state.replace(params=variables, ema_params=variables, teacher_params=teacher)
        else:
            restored = restore_checkpoint(args.restore_ckpt, state)
            if args.restore_weights_only:
                # fresh run from stage-1 weights: step 0, fresh optimizer and
                # schedule (a full restore would carry step=N and make a
                # --num_steps N stage-2 exit after ~0 steps)
                state = state.replace(
                    params=restored.params,
                    ema_params=restored.ema_params,
                    teacher_params=restored.teacher_params,
                )
            else:
                state = restored
            if args.restore_ckpt_T:
                # pin the frozen teacher independently (ft_dkt.py:144-151) —
                # honored for Orbax restores too, not just the .pth branch
                from dkt_stereo_tpu.train.checkpoint import restore_variables

                teacher = jax.tree_util.tree_map(
                    jnp.asarray,
                    restore_variables(args.restore_ckpt_T, state.params),
                )
                state = state.replace(teacher_params=teacher)

    state = replicate(state, mesh)
    if ns_mode:
        from dkt_stereo_tpu.train.ns_step import make_ns_train_step

        step_fn = make_ns_train_step(
            cfg,
            hyper,
            model_cls=model_cls,
            nb=loader.nb,
            nt=loader.nt,
            conf_threshold=args.conf_threshold,
            disp_threshold=args.disp_threshold,
        )
    else:
        step_fn = make_dkt_train_step(cfg, hyper, model_cls=model_cls, loss_adapter=loss_adapter)
    schedule = onecycle_linear(hyper.lr, hyper.num_steps + 100)

    save_dir = Path(args.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    cur = {"step": int(state.step)}
    lg = Logger(
        str(save_dir),
        get_lr=lambda: float(schedule(cur["step"])),
        start_step=int(state.step),  # resumes log at the true global step
    )

    key = jax.random.PRNGKey(args.seed + host_id)
    total_steps = int(state.step)
    logging.info("training %s for %d steps on %d devices", config["model"], args.num_steps, len(jax.devices()))

    if args.profile_port is not None and host_id == 0:
        from dkt_stereo_tpu.train.profiling import start_server

        start_server(args.profile_port)
    prof_window = None
    tracing = False
    if args.profile_dir is not None and host_id == 0:
        prof_window = (
            int(state.step) + args.profile_start,
            int(state.step) + args.profile_start + args.profile_steps,
        )

    while total_steps <= args.num_steps:
        for batch in loader:
            if prof_window is not None and not tracing and total_steps == prof_window[0]:
                jax.profiler.start_trace(args.profile_dir)
                tracing = True
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, shard_batch(batch, mesh), sub)
            total_steps += 1
            cur["step"] = total_steps
            if tracing and total_steps >= prof_window[1]:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                logging.info("profiler trace written to %s", args.profile_dir)
                prof_window, tracing = None, False
            host_metrics = {k: float(v) for k, v in metrics.items()}
            lg.writer.add_scalar("live_loss", host_metrics["loss"], total_steps)
            lg.writer.add_scalar("learning_rate", host_metrics["learning_rate"], total_steps)
            for k in ("ema_divergence", "teacher_divergence"):
                if k in host_metrics:
                    lg.writer.add_scalar(k, host_metrics[k], total_steps)
            lg.push({k: host_metrics[k] for k in ("epe", "1px", "3px", "5px", "loss") if k in host_metrics})

            if total_steps % 100 == 0 and host_id == 0 and "flow" in batch:
                # TB image dumps (ft_dkt.py:252-272): inputs + colormapped GT
                from dkt_stereo_tpu.utils.logging import save_images
                from dkt_stereo_tpu.utils.visualization import disp_to_color

                gt_img, maxd = disp_to_color(np.asarray(-batch["flow"][0]))
                save_images(
                    lg.writer,
                    "train",
                    {
                        "image1": np.asarray(batch["img1"]).transpose(0, 3, 1, 2),
                        "image1_clean": np.asarray(batch["img1_clean"]).transpose(0, 3, 1, 2),
                        "disp_gt": gt_img,
                    },
                    total_steps,
                )

            if total_steps % args.validation_frequency == args.validation_frequency - 1:
                # the Orbax save is a cross-process sync point — EVERY host
                # must call it (a host_id gate here would deadlock host 0's
                # save barrier against host 1's next train-step collectives)
                path = save_checkpoint(str(save_dir), state, total_steps + 1)
                if host_id == 0:
                    logging.info("saved %s", path)
                    # validation is process-local: params are fully
                    # replicated, so each host holds complete copies
                    # (np.asarray pulls the local shard) and the eval jit
                    # involves no collectives — other hosts proceed and
                    # simply wait in their next psum
                    val_params = jax.tree_util.tree_map(np.asarray, state.params)
                    fwd = make_forward_fn(model_cls, cfg, val_params, iters=args.valid_iters)
                    results = {}
                    for fn, kw in (
                        (validate_eth3d, dict(data_root=f"{args.data_root}/ETH3D")),
                        (validate_middlebury, dict(resolution="H", data_root=f"{args.data_root}/Middlebury")),
                        (validate_kitti, dict(split="2012", data_root=f"{args.data_root}/KITTI")),
                        (validate_kitti, dict(split="2015", data_root=f"{args.data_root}/KITTI")),
                        (validate_booster, dict(resolution="Q", data_root=f"{args.data_root}/Booster_dataset")),
                    ):
                        try:
                            results.update(fn(fwd, **kw))
                        except Exception as e:  # dataset absent on this machine
                            logging.warning("validation %s skipped: %s", fn.__name__, e)
                    lg.write_dict(results)

            if total_steps > args.num_steps:
                break

    if tracing:  # window extended past num_steps
        jax.profiler.stop_trace()
        logging.info("profiler trace written to %s", args.profile_dir)
    final = save_checkpoint(str(save_dir), state)
    logging.info("FINISHED TRAINING -> %s", final)
    lg.close()
    return final


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)-8s [%(filename)s:%(lineno)d] %(message)s",
    )
    train(parse_args(argv))


if __name__ == "__main__":
    main()
