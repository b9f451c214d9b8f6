from .iou3d import iou3d, to_odam, polygon_clip, convex_hull_intersection
from .nms import run_nms, nms_mask_device, corners_to_aabb_rows
from .f1 import F1Calculator, match_sequence, get_f1, CARE_CLASSES
from .parse_pred import (finish_parse_pred, parse_pred,
                         parse_pred_device, targets_to_gt_list)

__all__ = [
    "iou3d", "to_odam", "polygon_clip", "convex_hull_intersection",
    "run_nms", "nms_mask_device", "corners_to_aabb_rows",
    "F1Calculator", "match_sequence", "get_f1", "CARE_CLASSES",
    "finish_parse_pred", "parse_pred", "parse_pred_device",
    "targets_to_gt_list",
]
