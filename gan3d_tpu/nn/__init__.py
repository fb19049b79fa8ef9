"""Flax NN building blocks for the 3D GAN model zoo (NDHWC layout).

Reference equivalents: utils.py (snconv3d/snlinear/Attention/G-D blocks),
dcgan.py layer stacks, plus the reconstructed MSL RandomCrop3D module (the
reference imports `msl.RandomCrop3D` but ships no msl.py — SURVEY §2.3).
"""

from gan3d_tpu.nn.layers import Conv3d, ConvTranspose3d, Linear, SNConv3d, SNLinear
from gan3d_tpu.nn.norm import BatchNorm3d, LayerNormVolume
from gan3d_tpu.nn.attention import SelfAttention3d
from gan3d_tpu.nn.blocks import DBlock, DBlockDeep, GBlock, GBlockDeep
from gan3d_tpu.nn.msl import RandomCrop3D

__all__ = [
    "Conv3d",
    "ConvTranspose3d",
    "Linear",
    "SNConv3d",
    "SNLinear",
    "BatchNorm3d",
    "LayerNormVolume",
    "SelfAttention3d",
    "GBlockDeep",
    "DBlockDeep",
    "GBlock",
    "DBlock",
    "RandomCrop3D",
]
