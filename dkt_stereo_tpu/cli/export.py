"""Export a checkpoint to the reference's torch ``.pth`` format, so models
fine-tuned in this framework load strictly into the reference's own tools
(tools/evaluate_stereo.py:366-371).

  python -m dkt_stereo_tpu.cli.export --restore_ckpt runs/booster/step_2000 \\
      --template ref_sceneflow.pth --out dkt_ft_booster.pth --which ema

``--restore_ckpt``: an Orbax checkpoint — either a full DKT train state
(``cli.train`` output; pick the student/EMA/teacher weights via ``--which``)
or bare flax variables. ``--template``: the reference ``.pth`` whose key set
defines the output (normally the checkpoint the fine-tune started from).
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--restore_ckpt", required=True, help="Orbax checkpoint dir")
    p.add_argument("--template", required=True, help="reference-format .pth supplying the key set")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument(
        "--which",
        choices=["student", "ema", "teacher"],
        default="student",
        help="which weights to export from a DKT train-state checkpoint "
        "(ignored for bare-variables checkpoints)",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from dkt_stereo_tpu.train.checkpoint import export_reference_pth, restore_variables

    if args.restore_ckpt.endswith(".pth"):
        raise SystemExit(
            "--restore_ckpt must be an Orbax checkpoint (a .pth is already "
            "in the reference format)"
        )
    variables = restore_variables(args.restore_ckpt, {}, args.which)
    state = export_reference_pth(variables, args.template, path=args.out)
    inner = state.get("state_dict", state)
    print(f"wrote {args.out}: {len(inner)} tensors ({args.which})")
    return args.out


if __name__ == "__main__":
    main()
