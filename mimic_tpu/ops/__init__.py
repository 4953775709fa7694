from .flash_attention import flash_attention, flash_attention_diff

__all__ = ["flash_attention", "flash_attention_diff"]
