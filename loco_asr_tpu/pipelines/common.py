"""Shared pipeline utilities: checkpoint loading across formats, batch
bucketing, device placement."""

from __future__ import annotations

import os
import sys
from typing import Dict, Optional

import numpy as np


def round_up(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


RNG_IMPLS = ("threefry", "rbg", "unsafe_rbg")


def setup_rng_impl(impl: str) -> None:
    """Select the PRNG implementation for this process's jax.random keys.

    Threefry (the JAX default) computes random bits with a software
    counter cipher on the VPU — measured at B=16 x 5 s it costs the ASR
    train step ~13 ms of mask generation in the FORWARD alone and ~24 ms
    over fwd+bwd (docs/BENCH.md round-3 RNG section).  "rbg"/"unsafe_rbg"
    use the TPU hardware RNG instruction for bit generation (the standard
    large-scale-training configuration on TPU): full step 90.7 -> 65.8 ms.

    Dropout masks need no cross-run reproducibility guarantee — within a
    process a given (key, shape) is still deterministic, so remat
    exactness and nan-rollback replay are unaffected.  Keep "threefry"
    (default off the trainers) when bitwise golden parity across
    machines/backends matters.

    Must run before the first jax.random key is created.
    """
    if impl not in RNG_IMPLS:
        raise ValueError(f"rng_impl {impl!r}: expected one of {RNG_IMPLS}")
    import jax

    jax.config.update("jax_default_prng_impl",
                      "threefry2x32" if impl == "threefry" else impl)


def setup_compilation_cache(enabled: Optional[bool] = None,
                            cache_dir: Optional[str] = None) -> Optional[str]:
    """Enable JAX's persistent compilation cache for pipeline processes.

    The remote TPU compiler on this class of deployment costs minutes per
    full-size program and is otherwise re-paid on EVERY process start
    (docs/BENCH.md); the persistent cache keys serialized executables by
    HLO hash so a second run of the same pipeline skips compilation
    entirely.  Controlled by env vars (no per-pipeline flags needed):

      LOCO_COMPILE_CACHE=0       -> opt out
      LOCO_COMPILE_CACHE_DIR=... -> override the default
                                    ~/.cache/loco_asr_tpu/jax_cache

    Returns the cache dir in use, or None when disabled/unsupported.
    """
    import jax

    env = os.environ.get("LOCO_COMPILE_CACHE")
    if enabled is None:
        if env is not None:
            enabled = env != "0"
        else:
            # The cache exists to skip the REMOTE TPU compiler (minutes per
            # full-size program).  On the CPU backend it is a measured
            # pessimization: deserializing a cached AOT CPU executable took
            # ~127 s for a train step that compiles in ~20 s (machine-feature
            # mismatch in cpu_aot_loader forces a slow load path), which
            # multiplied every pipeline test's wall time.  Default: TPU only.
            enabled = jax.default_backend() == "tpu"
    if not enabled:
        return None
    cache_dir = cache_dir or os.environ.get(
        "LOCO_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "loco_asr_tpu",
                     "jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even fast compiles: the relay round-trip dominates, not
        # local XLA time, so every hit pays
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # backend without serialization support
        print(f"persistent compilation cache unavailable: {e}",
              file=sys.stderr)
        return None
    return cache_dir


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
