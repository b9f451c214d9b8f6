from .pixel_align_pallas import pixel_aligned_features_pallas

__all__ = ["pixel_aligned_features_pallas"]
