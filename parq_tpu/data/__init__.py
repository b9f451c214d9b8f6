from .transforms import (snippet_transform, camera_to_gravity_aligned,
                         resize_images, pad_scannet, mat_to_pose12,
                         pose12_compose, pose12_inverse)
from .scannet import ScanNetDataset, SnippetLoader, collate, SYM_MAPPING
from .demo import DemoDataset
from .synthetic import make_snippet, make_batch, device_batch

__all__ = [
    "snippet_transform", "camera_to_gravity_aligned", "resize_images",
    "pad_scannet", "mat_to_pose12", "pose12_compose", "pose12_inverse",
    "ScanNetDataset", "SnippetLoader", "collate", "SYM_MAPPING",
    "DemoDataset", "make_snippet", "make_batch", "device_batch",
]
