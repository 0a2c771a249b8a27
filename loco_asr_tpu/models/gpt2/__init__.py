from .model import GPT2Config, gpt2_init, gpt2_forward, gpt2_logits, tiny_gpt2_config
from . import import_torch
