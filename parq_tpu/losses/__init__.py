from .set_loss import Targets, parse_targets, set_loss

__all__ = ["Targets", "parse_targets", "set_loss"]
