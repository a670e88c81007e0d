#!/bin/bash
# Two-stage DKT fine-tune of IGEV-Stereo on KITTI mix (port of
# run_scripts/igev/ft_kitti.sh; the reference's broken kitti_mix dataloader
# branch is fixed in this framework so the mix split actually loads).
# configs/igev_stereo/train.json = the TPU training recipe (Pallas geo
# lookup with validated VJP + per-iteration remat); base.json stays the
# exact reference-parity configuration.
workspace=${1:-runs/dkt-igev-kitti}

python -m dkt_stereo_tpu.cli.train --train_datasets kitti_mix \
  --config configs/igev_stereo/train.json \
  --batch_size 4 --num_steps 5000 --image_size 320 736 --lr 2e-4 \
  --ema_decay 0.99 --tau_pl 3.0 \
  --save_dir $workspace/stage1 \
  --restore_ckpt model_zoo/stereo/IGEV-Stereo/sceneflow.pth

python -m dkt_stereo_tpu.cli.train --train_datasets kitti_mix \
  --config configs/igev_stereo/train.json \
  --batch_size 4 --num_steps 50000 --image_size 320 736 --lr 2e-4 \
  --ema_decay 0.99999 --tau_pl 0.5 \
  --save_dir $workspace/stage2 \
  --restore_ckpt $workspace/stage1/step_5000 --restore_weights_only \
  --restore_ckpt_T model_zoo/stereo/IGEV-Stereo/sceneflow.pth
