"""mri_raytracer_tpu — a TPU-native neural implicit MRI representation + volume
ray-tracing framework.

Re-designed from scratch for JAX/XLA/Pallas on TPU, with the full capability
surface of the reference project "Neumours: Neural Implicit Multi-Modal Tumour
Representations" (MRI-RayTracer): INR segmentation training on multi-modal
brain MRI, real-time emission-absorption volume rendering of MRI volumes +
segmentations + INR predictions, differentiable rendering, plus SDF and
BVH-mesh ray tracers.

Layer map (TPU-native):
  - data/      NIfTI IO, caches, on-device voxel samplers, device case pools
  - models/    Fourier features, MLP / SIREN / coord-injection INR heads, U-Net
  - ops/       compute kernels: trilinear sampling, ray-marchers (XLA + Pallas),
               compositing with custom VJP, SDF tracer, BVH traversal
  - render/    user-facing renderers (BraTS multi-modal, u8 grid, mesh, SDF),
               cameras, transfer functions, LUTs
  - train/     fully-jitted training engine (device pool step, grad accum,
               optimizer/schedule zoo)
  - eval/      full-volume inference + Dice / Hausdorff / PSNR metrics
  - parallel/  jax.sharding Mesh helpers: data-parallel training,
               pixel-sharded rendering, multi-host init
  - io/        checkpoints (npz flat + object formats, orbax), JSON sidecars,
               W&B-optional experiment logging
"""

__version__ = "0.1.0"

from mri_raytracer_tpu import config as config  # noqa: F401
