from .node import CfgNode
from .defaults import get_cfg, update_config, check_config, apply_platform

cfg = get_cfg()

__all__ = ["CfgNode", "cfg", "get_cfg", "update_config", "check_config",
           "apply_platform"]
