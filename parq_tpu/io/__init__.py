from .torch_convert import (convert_parq_checkpoint, load_parq_checkpoint,
                            load_torch_state_dict)

__all__ = ["convert_parq_checkpoint", "load_parq_checkpoint",
           "load_torch_state_dict"]
