"""startrax — a TPU-native framework for self-supervised tracking and
reconstruction of rigid objects in motion with Neural Radiance Fields (STaR).

Re-designed from scratch for TPU (JAX / XLA / Pallas / jax.sharding) with the
capabilities of the reference PyTorch implementation
(burakcuhadar/3D-MOT-using-Neural-Radiance-Fields):

- static + K dynamic radiance fields composited under a joint transmittance,
- per-frame SE(3) vehicle poses optimized jointly with the fields by
  photometric self-supervision,
- two-stage training (appearance init, online tracking with a frame-window
  curriculum),
- full eval suite (PSNR/SSIM/LPIPS, pose errors, RPE/ATE, 2D/3D IoU).

Layout:
  ops/       pure jittable math: Lie algebra, rays, sampling, compositing
  kernels/   Pallas TPU kernels (fused field eval, occupancy grid)
  models/    radiance fields and the STaR composition
  parallel/  device mesh + sharded train/eval steps
  data/      host data pipelines (CARLA, Blender, synthetic)
  train/     optimizers, curriculum, train loops, checkpointing
  eval/      metrics (image, pose, trajectory, IoU) and tiled rendering
  utils/     config system, visualization, mesh extraction
  apps/      entry points mirroring the reference train_* scripts
"""

__version__ = "0.1.0"
