from .flash_attention import flash_attention
from .logmel import fused_log_mel
