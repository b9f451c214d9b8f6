from .grid_sample import grid_sample_bilinear
from .posemb import pos2posemb3d
from .pixel_align import pixel_aligned_features
from .hungarian import solve_lap, match_single, match_batch, MatchResult

__all__ = [
    "grid_sample_bilinear", "pos2posemb3d", "pixel_aligned_features",
    "solve_lap", "match_single", "match_batch", "MatchResult",
]
