"""Evaluation stack: 3D-FID, slice FID, MS-SSIM-3D, MMD, PSNR, tournament.

Reference equivalents: eval_utils.py (metric functions), FID_ResNet.py
(MedicalNet 3D ResNet-50 feature extractor), eval.py / eval_metrics.py /
tournament.py CLIs.
"""

from gan3d_tpu.eval.metrics import (
    frechet_distance,
    mmd,
    ms_ssim_3d,
    psnr,
)

__all__ = ["mmd", "psnr", "ms_ssim_3d", "frechet_distance"]
