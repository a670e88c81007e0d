"""dkt_stereo_tpu — a TPU-native (JAX/XLA/Pallas/pjit) stereo-depth framework.

A from-scratch rebuild of the capabilities of jiaw-z/DKT-Stereo (CVPR 2024,
"Robust Synthetic-to-Real Transfer for Stereo Matching"), designed TPU-first:

- NHWC tensors, bfloat16 compute with fp32 correlation/regression.
- Iterative refinement as ``lax.scan``; everything jit-compiled.
- Cost-volume construction on the MXU (one einsum), lookup via fused
  gather kernels (XLA reference impl + Pallas kernels).
- Data parallelism via ``jax.sharding.Mesh`` + NamedSharding, multi-host via
  ``jax.distributed``; optional H-dim spatial sharding for very large images
  (stereo correlation is per-row, so the corr kernel needs no halo comm).

Package map (mirrors SURVEY.md §7):
  ops/       pure array functions (pad, sample, corr, volumes, upsample, warp)
  nn/        Flax modules (encoders, ConvGRU stacks, hourglasses)
  models/    RAFTStereo, IGEVStereo, GWCNet, CGIStereo, PCVNet + registry
  losses/    per-model sequence/stacked-hourglass losses
  dkt/       F&E filter/ensemble, EMA teacher machinery
  data/      file readers, augmentors, datasets, host-side loader
  parallel/  mesh construction, sharding rules, collectives helpers
  train/     train state, DKT fine-tune loop, checkpointing (orbax + pth import)
  eval/      benchmark validators (ETH3D/Middlebury/KITTI/Booster/Things), metrics
  cli/       train / eval / demo entry points, reference-JSON-compatible configs
"""

__version__ = "0.1.0"
