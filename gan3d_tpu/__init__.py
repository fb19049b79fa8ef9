"""gan3d_tpu — a TPU-native volumetric (3D) GAN framework.

Built from scratch in JAX/XLA (jit/pjit SPMD, shard_map, Pallas) with the
capabilities of the PyTorch reference `julschoen/3D-GAN` (see SURVEY.md):

- npz-based 3D volume data pipeline (``gan3d_tpu.data``)
- model zoo: 3D-DCGAN/WGAN/SNGAN/SAGAN, BigGAN-Deep-3D, StyleGAN-1/2-3D
  (``gan3d_tpu.models``)
- alternating D/G trainer with WGAN / hinge / StyleGAN2 losses, EMA,
  bf16 mixed precision, checkpoint/resume (``gan3d_tpu.train``)
- SPMD data parallelism over a device mesh (``gan3d_tpu.parallel``)
- evaluation stack: 3D-FID (MedicalNet ResNet-50), slice FID, MS-SSIM-3D,
  MMD, PSNR, tournament ranking (``gan3d_tpu.eval``)

Layout convention: volumes are channels-last ``[N, D, H, W, C]`` (NDHWC) —
the TPU-native layout — whereas the reference uses NCDHW. Conversions happen
only at test/IO boundaries.
"""

from gan3d_tpu.config import Config

__version__ = "0.1.0"

__all__ = ["Config", "__version__"]
