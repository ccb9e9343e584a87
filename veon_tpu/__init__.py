"""veon_tpu: a TPU-native open-vocabulary 3D semantic-occupancy framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of VISION-SJTU/VEON
(ECCV 2024, arXiv:2407.12294): six nuScenes camera images (+ optional previous
frames) -> 200x200x16 voxel grid of 18-class semantics plus per-voxel
CLIP-space embeddings, with metric-depth lifting (LSS), a SAN side-adapter
CLIP backbone, and open-vocabulary text scoring.

Layout (see SURVEY.md section 7):
  configs/   python dataclass configs (grid, model dims, fusion maps, loss weights)
  geometry/  frustum, SE(3) chains, voxel rank computation (pure jnp)
  ops/       voxel scatter pooling (bev_pool), grid_sample, resize, attention
  nn/        flax modules: ViT cores, DPT, SAN, HSA, AlignNet3D, LoRA
  lift/      two-hot depth + LSS lift-splat
  model/     the VEON inference/training graph
  data/      nuScenes infos reader + per-host input pipeline
  eval/      Occ3D mIoU + POP-3D retrieval AP
  train/     train loops, optimizer, EMA, losses
  ckpt/      torch->jax weight converters + orbax io
"""

__version__ = "0.1.0"
