from .flash_attention import flash_attention, flash_attention_nhd
from .logmel import fused_log_mel
