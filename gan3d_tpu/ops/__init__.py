"""Functional TPU ops: 3D conv/transposed-conv, pooling, resampling.

All ops are channels-last (NDHWC) and lower to XLA `conv_general_dilated` /
`reduce_window`, which tile onto the MXU. Pallas kernels for profile-hot ops
live in `gan3d_tpu.ops.pallas_*` modules.
"""

from gan3d_tpu.ops.conv3d import (
    avg_pool3d,
    conv3d,
    conv_transpose3d,
    global_sum_pool,
    max_pool3d,
    upsample_nearest3d,
    upsample_trilinear3d,
)
from gan3d_tpu.ops.upsample_conv import upsample_conv3d

__all__ = [
    "conv3d",
    "conv_transpose3d",
    "avg_pool3d",
    "max_pool3d",
    "global_sum_pool",
    "upsample_nearest3d",
    "upsample_trilinear3d",
    "upsample_conv3d",
]
