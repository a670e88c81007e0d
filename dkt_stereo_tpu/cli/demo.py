"""Demo: run stereo inference over image globs → colormapped PNG (+ .npy).

Rebuild of tools/demo.py:23-52.

  python -m dkt_stereo_tpu.cli.demo --config configs/raft_stereo/base.json \
      --restore_ckpt ckpt.pth -l 'left/*.png' -r 'right/*.png' -o out/
"""

from __future__ import annotations

import argparse
from glob import glob
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--restore_ckpt", required=True)
    p.add_argument("-l", "--left_imgs", required=True)
    p.add_argument("-r", "--right_imgs", required=True)
    p.add_argument("-o", "--output_directory", default="demo_output")
    p.add_argument("--valid_iters", type=int, default=32)
    p.add_argument("--divide_factor", type=int, default=32,
                   help="pad inputs to multiples of this (64 for n_downsample=3 configs)")
    p.add_argument("--which", choices=["student", "ema", "teacher"], default="student",
                   help="weight set to use from a full DKT train-state checkpoint")
    p.add_argument("--save_numpy", action="store_true")
    p.add_argument("--save_ply", action="store_true",
                   help="also export a colored point cloud per frame "
                   "(utils/visualization.py:453-511)")
    p.add_argument("--focal", type=float, default=721.5,
                   help="focal length in px for --save_ply depth conversion")
    p.add_argument("--baseline", type=float, default=0.54,
                   help="stereo baseline in meters for --save_ply")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from dkt_stereo_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from dkt_stereo_tpu.cli.config import load_model_config
    from dkt_stereo_tpu.data.readers import read_image_rgb
    from dkt_stereo_tpu.eval.validate import make_forward_fn, _run_one
    from dkt_stereo_tpu.models import get_model
    from dkt_stereo_tpu.train.checkpoint import restore_variables
    from dkt_stereo_tpu.utils.visualization import disp_to_color

    config = load_model_config(args.config)
    model_cls, cfg_cls, _ = get_model(config["model"])
    cfg = cfg_cls.from_dict(config)
    # train-mode template: reference .pth files carry train-only params
    # (e.g. GWCNet's extra classifier heads) — import into the superset
    model = model_cls(cfg, iters=args.valid_iters, test_mode=False)
    dummy = jnp.zeros((1, 64, 64, 3))
    template = model.init(jax.random.PRNGKey(0), dummy, dummy)
    params = jax.tree_util.tree_map(
        jnp.asarray, restore_variables(args.restore_ckpt, template, args.which)
    )
    fwd = make_forward_fn(model_cls, cfg, params, iters=args.valid_iters)

    out_dir = Path(args.output_directory)
    out_dir.mkdir(parents=True, exist_ok=True)
    lefts = sorted(glob(args.left_imgs))
    rights = sorted(glob(args.right_imgs))
    for lp, rp in zip(lefts, rights):
        img1 = read_image_rgb(lp).astype(np.float32)
        img2 = read_image_rgb(rp).astype(np.float32)
        disp, _ = _run_one(fwd, img1, img2, args.divide_factor)
        disp = -disp  # negative-flow convention → positive disparity
        stem = Path(lp).stem
        if args.save_numpy:
            np.save(out_dir / f"{stem}.npy", disp)
        if args.save_ply:
            from dkt_stereo_tpu.utils.visualization import disp_to_ply

            disp_to_ply(
                str(out_dir / f"{stem}.ply"), disp, img1,
                focal=args.focal, baseline=args.baseline,
            )
        rgb, _ = disp_to_color(disp)
        Image.fromarray(rgb[0].transpose(1, 2, 0).astype(np.uint8)).save(out_dir / f"{stem}.png")
        print(f"{lp} -> {out_dir / (stem + '.png')}")


if __name__ == "__main__":
    main()
