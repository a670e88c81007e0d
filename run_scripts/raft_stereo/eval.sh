#!/bin/bash
# Port of run_scripts/raft-stereo/eval.sh
python -m dkt_stereo_tpu.cli.eval \
  --config configs/raft_stereo/base.json \
  --valid_iters 32 \
  --restore_ckpt ckpt/dkt-raft/booster_ft.pth
