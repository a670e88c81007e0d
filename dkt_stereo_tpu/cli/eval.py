"""Evaluation CLI (rebuild of tools/evaluate_stereo.py __main__, :339-404).

  python -m dkt_stereo_tpu.cli.eval --config configs/raft_stereo/base.json \
      --restore_ckpt ckpt.pth --datasets eth3d kitti-2015 ...
"""

from __future__ import annotations

import argparse
import json
import logging


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--restore_ckpt", required=True)
    p.add_argument("--valid_iters", type=int, default=32)
    p.add_argument("--divide_factor", type=int, default=32)
    p.add_argument(
        "--datasets",
        nargs="+",
        default=["eth3d", "middlebury-H", "kitti-2012", "kitti-2015", "booster-Q"],
    )
    p.add_argument("--data_root", default="data")
    p.add_argument(
        "--spatial_bands",
        type=int,
        default=0,
        help="split each frame into N horizontal bands over an N-device "
        "('spatial',) mesh with exact cross-band instance-norm statistics "
        "(eval/tiled.py::banded_forward_exact) — multi-chip context "
        "parallelism for very large frames; needs N local devices",
    )
    p.add_argument("--band_halo", type=int, default=96)
    p.add_argument(
        "--which",
        choices=["student", "ema", "teacher"],
        default="student",
        help="which weights to evaluate from a full DKT train-state "
        "checkpoint (ignored for .pth / bare-variables checkpoints)",
    )
    p.add_argument(
        "--mixed_precision",
        action="store_true",
        help="bf16 compute; default OFF to match the reference eval protocol "
        "(tools/evaluate_stereo.py:376-380 hard-disables AMP for accuracy runs)",
    )
    return p.parse_args(argv)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dkt_stereo_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from dkt_stereo_tpu.cli.config import load_model_config
    from dkt_stereo_tpu.eval.validate import (
        make_forward_fn,
        preflight,
        run_validator,
    )
    from dkt_stereo_tpu.cli.config import merge_config
    from dkt_stereo_tpu.models import get_model
    from dkt_stereo_tpu.train.checkpoint import restore_variables

    import os

    if not os.path.isdir(args.data_root):
        raise SystemExit(
            f"--data_root {args.data_root!r} does not exist (checked before "
            "model compilation, which takes minutes on TPU)"
        )

    preflight(args.datasets, args.data_root)

    import dataclasses

    config = load_model_config(args.config)
    # strict-disjoint check (ft_dkt.py:347-350); the eval CLI deliberately
    # overrides a config's mixed_precision (the AMP-off eval protocol)
    merge_config(args, config, allow=("mixed_precision",))
    model_cls, cfg_cls, _ = get_model(config["model"])
    # Reference parity: the eval harness hard-disables AMP regardless of the
    # model config (tools/evaluate_stereo.py:376-380 sets
    # use_mixed_precision = False) — so a config's "mixed_precision": true is
    # deliberately overridden here unless --mixed_precision is passed.
    cfg = dataclasses.replace(
        cfg_cls.from_dict(config), mixed_precision=args.mixed_precision
    )

    # Train-mode template: some models (GWCNet classif0-2 heads, IGEV spx
    # init-upsample) own params that only exist in train mode, but reference
    # .pth files always carry them — import into the superset; the test-mode
    # forward simply ignores the extras.
    model = model_cls(cfg, iters=args.valid_iters, test_mode=False)
    dummy = jnp.zeros((1, 64, 64, 3))
    template = model.init(jax.random.PRNGKey(0), dummy, dummy)
    params = jax.tree_util.tree_map(
        jnp.asarray, restore_variables(args.restore_ckpt, template, args.which)
    )

    if args.spatial_bands > 1:
        import numpy as np

        from dkt_stereo_tpu.eval.tiled import banded_forward_exact
        from dkt_stereo_tpu.parallel import make_mesh

        # module-level instance norms required for cross-band statistics
        # (only RAFTStereoConfig has a pallas_encoder switch; the other
        # model configs already use module-level norms)
        bcfg = cfg
        if any(f.name == "pallas_encoder" for f in dataclasses.fields(cfg)):
            bcfg = dataclasses.replace(cfg, pallas_encoder=False)
        bmodel = model_cls(bcfg, iters=args.valid_iters, test_mode=True)
        mesh = make_mesh(args.spatial_bands, axis_names=("spatial",))
        # replicate the checkpoint across the band mesh ONCE — inside
        # banded_forward_exact the per-frame device_put is then a no-op
        rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        params = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params)

        def fwd(img1, img2):
            return np.stack(
                [
                    banded_forward_exact(
                        bmodel, params, np.asarray(a), np.asarray(b), mesh,
                        halo=args.band_halo, divide_factor=args.divide_factor,
                    )
                    for a, b in zip(img1, img2)
                ]
            )

    else:
        fwd = make_forward_fn(model_cls, cfg, params, iters=args.valid_iters)
    results = {}
    for name in args.datasets:
        results.update(run_validator(name, fwd, args.data_root, args.divide_factor))
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
