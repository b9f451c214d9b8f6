from .pose import Pose
from .camera import Camera
from .obb import Obb3D, MAX_BOXES, MAX_SYMS, pad_obbs_np
from .rays import (grid_2d, depth_planes, ray_points, ray_points_snippet,
                   ray_points_snippet_fused, ray_dirs_snippet,
                   inverse_sigmoid)
from .rotation import (rot_to_6d, rotation_matrix_from_ortho6d, rotx, roty,
                       rotz)

__all__ = [
    "Pose", "Camera", "Obb3D", "MAX_BOXES", "MAX_SYMS", "pad_obbs_np",
    "grid_2d", "depth_planes", "ray_points", "ray_points_snippet",
    "ray_points_snippet_fused", "ray_dirs_snippet",
    "inverse_sigmoid", "rot_to_6d", "rotation_matrix_from_ortho6d",
    "rotx", "roty", "rotz",
]
