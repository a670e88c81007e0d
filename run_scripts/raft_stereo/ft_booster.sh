#!/bin/bash
# Two-stage DKT fine-tune of RAFT-Stereo on Booster (port of
# run_scripts/raft-stereo/ft_booster.sh: stage-1 short warmup with low EMA
# decay, stage-2 with 0.99999 decay and the frozen teacher pinned to the
# original sceneflow weights). Devices come from the JAX runtime (all local
# TPU chips; multi-host via jax.distributed) instead of CUDA_VISIBLE_DEVICES.
#
# configs/raft_stereo/train.json = the TPU training recipe: Pallas corr
# lookup (validated custom VJP) + fused Pallas encoder + per-iteration
# remat — measured 10.4x faster per DKT step than the XLA-gather "reg"
# path (TRAIN_PROF_r04.json). configs/raft_stereo/base.json stays the
# exact reference-parity configuration.
workspace=${1:-runs/dkt-raft-booster}

python -m dkt_stereo_tpu.cli.train --train_datasets booster \
  --config configs/raft_stereo/train.json \
  --batch_size 2 --num_steps 5000 --image_size 480 896 --lr 1e-5 \
  --ema_decay 0.9999 --tau_pl 3.0 \
  --save_dir $workspace/stage1 \
  --restore_ckpt model_zoo/stereo/RAFT-Stereo/raftstereo-sceneflow.pth

python -m dkt_stereo_tpu.cli.train --train_datasets booster \
  --config configs/raft_stereo/train.json \
  --batch_size 2 --num_steps 5000 --image_size 480 896 --lr 1e-5 \
  --ema_decay 0.99999 --tau_pl 3.0 \
  --save_dir $workspace/stage2 \
  --restore_ckpt $workspace/stage1/step_5000 --restore_weights_only \
  --restore_ckpt_T model_zoo/stereo/RAFT-Stereo/raftstereo-sceneflow.pth
