"""HF GPT-2 checkpoint -> our pytree.

HF GPT-2 uses Conv1D modules whose weights are already [in, out], so the
import is a pure rename (LayerNorm weight -> scale); no transposes.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np

from ...utils.pytree import unflatten_from_paths

_SKIP = (".attn.bias", ".attn.masked_bias", "lm_head.weight")


def _to_numpy(x) -> np.ndarray:
    if hasattr(x, "detach"):
        return np.asarray(x.detach().cpu().numpy())
    return np.asarray(x)


def load_hf_gpt2(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """GPT2LMHeadModel / GPT2Model state_dict -> our param tree."""
    flat: Dict[str, np.ndarray] = {}
    for key, value in state_dict.items():
        if any(key.endswith(s) or s in key for s in _SKIP):
            continue  # causal-mask buffers; lm_head is tied to wte
        k = key
        if k.startswith("transformer."):
            k = k[len("transformer."):]
        if re.search(r"\bln_(1|2|f)\.weight$", k):
            k = re.sub(r"\.weight$", ".scale", k)
        elif k.endswith((".c_attn.weight", ".c_proj.weight", ".c_fc.weight")):
            k = re.sub(r"\.weight$", ".kernel", k)
        flat[k] = _to_numpy(value)
    return unflatten_from_paths(flat)
