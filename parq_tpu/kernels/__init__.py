from .cross_attention_pallas import (cross_attention_reference,
                                     flash_cross_attention,
                                     pad_kv_for_flash)
from .pixel_align_pallas import (pixel_aligned_features_fast,
                                 pixel_aligned_features_pallas)

__all__ = ["pixel_aligned_features_pallas", "pixel_aligned_features_fast",
           "flash_cross_attention", "cross_attention_reference",
           "pad_kv_for_flash"]
