from .alias_free_act import fused_alias_free_snake
from .flash_d32 import flash_sdpa

__all__ = ["fused_alias_free_snake", "flash_sdpa"]
