from .mlp import MLP2, GroupNorm1, HeadMLP
from .box_processor import load_mean_size_table
from .resnet_fpn import ResNetFPN, FrozenBatchNorm
from .ray_pe import AddRayPE
from .decoder import (DecoderLayer, DecoderIteration, PARQDecoder,
                      normalize_points, denormalize_points)
from .parq import PARQModel

__all__ = [
    "MLP2", "GroupNorm1", "HeadMLP", "load_mean_size_table",
    "ResNetFPN", "FrozenBatchNorm", "AddRayPE", "DecoderLayer",
    "DecoderIteration", "PARQDecoder", "PARQModel", "normalize_points",
    "denormalize_points",
]
