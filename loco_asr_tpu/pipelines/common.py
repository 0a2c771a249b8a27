"""Shared pipeline utilities: checkpoint loading across formats, batch
bucketing, device placement."""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def round_up(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pt/.bin/.pth state dict (or fairseq ckpt) as numpy."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return obj


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)


def load_speecht5_params(checkpoint: Optional[str], variant: str, cfg, rng=None):
    """Resolve SpeechT5 parameters from any supported source:

      * None          -> random init (smoke/benchmark mode)
      * *.npz         -> our native checkpoint (utils.checkpoint.save_npz)
      * *.safetensors -> HF weights
      * *.bin/*.pt    -> torch state dict (HF) or fairseq ckpt with 'model'
      * directory     -> HF model dir (model.safetensors / pytorch_model.bin)

    ``variant``: 'asr' (speech encoder+text decoder) or 'tts'.
    """
    import jax

    from ..models.speecht5 import import_torch, model as st5
    from ..utils import checkpoint as ckpt_util

    init_fn = st5.asr_init if variant == "asr" else st5.tts_init
    params = init_fn(rng if rng is not None else jax.random.PRNGKey(0), cfg)
    if checkpoint is None:
        return params

    if os.path.isdir(checkpoint):
        if os.path.exists(os.path.join(checkpoint, "status.json")):
            # our training Checkpointer directory (pipelines/train_asr.py)
            state = ckpt_util.Checkpointer(checkpoint).restore()
            return state["params"]
        for name in ("model.safetensors", "pytorch_model.bin"):
            p = os.path.join(checkpoint, name)
            if os.path.exists(p):
                checkpoint = p
                break
        else:
            raise FileNotFoundError(f"no weights found under {checkpoint}")

    if checkpoint.endswith(".npz"):
        return ckpt_util.load_npz(checkpoint)
    if checkpoint.endswith(".safetensors"):
        state = load_safetensors(checkpoint)
        return _merge(params, import_torch.load_hf_state_dict(state))
    obj = load_torch_file(checkpoint)
    if isinstance(obj, dict) and "model" in obj and not any(
            k.startswith("speecht5") for k in obj):
        # fairseq speecht5_base.pt: graft encoder/prenets over the init tree
        graft = (import_torch.graft_fairseq_into_asr if variant == "asr"
                 else import_torch.graft_fairseq_into_tts)
        return graft(params, obj)
    return _merge(params, import_torch.load_hf_state_dict(obj))


def _merge(base: Dict, loaded: Dict) -> Dict:
    """Overlay loaded leaves onto the init tree (keeps buffers the loader
    recomputes, errors on shape mismatch)."""
    from ..utils.pytree import flatten_with_paths, unflatten_from_paths

    flat = flatten_with_paths(base)
    for k, v in flatten_with_paths(loaded).items():
        if k in flat and tuple(np.shape(flat[k])) != tuple(np.shape(v)):
            raise ValueError(f"shape mismatch for {k}: "
                             f"{np.shape(flat[k])} vs {np.shape(v)}")
        flat[k] = v
    return unflatten_from_paths(flat)
