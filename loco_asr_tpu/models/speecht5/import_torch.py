"""Checkpoint import: HF SpeechT5 / original fairseq SpeechT5 -> our pytrees.

This is the TPU-side port of the reference's checkpoint-compatibility
contract (speech_text/map_speecht5_hf.py:1-181, driven by notebook 4):
  * HF ``SpeechT5ForSpeechToText`` / ``SpeechT5ForTextToSpeech`` state dicts
    load into :func:`asr_init`/:func:`tts_init` trees (mechanical rename +
    Linear transpose).
  * The original fairseq ``speecht5_base.pt`` checkpoint loads via the same
    renaming rules the reference's ``Mapping`` class implements
    (fc1/fc2 -> feed_forward.{intermediate,output}_dense, self_attn ->
    attention, pos_emb -> embed_positions, feature_extractor ->
    feature_encoder, post_extract_proj -> feature_projection.projection,
    mask_emb -> masked_spec_embed, pos_conv -> pos_conv_embed.conv).

All functions take/return numpy; no torch import is required unless the
caller passes live torch tensors (handled via utils.pytree.from_torch).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np

from ...utils.pytree import unflatten_from_paths

# Dense (torch Linear) leaves -> transpose [out,in] -> [in,out], rename to kernel.
_DENSE_MODULES = (
    "q_proj", "k_proj", "v_proj", "out_proj",
    "intermediate_dense", "output_dense",
    "projection", "lm_head", "feat_out", "prob_out",
    "final_layer", "speaker_embeds_layer",
)

# Buffers we recompute (sinusoidal tables) rather than store.
_SKIPPED = (
    "pos_sinusoidal_embed.weights",
    "encode_positions.pe",
    "num_batches_tracked",
    "rotary_embed",
)


def _to_numpy(x) -> np.ndarray:
    if hasattr(x, "detach"):
        return np.asarray(x.detach().cpu().numpy())
    return np.asarray(x)


def _is_dense_weight(key: str) -> bool:
    parts = key.split(".")
    if len(parts) < 2 or parts[-1] != "weight":
        return False
    if parts[-2] in _DENSE_MODULES:
        return True
    # speech decoder prenet dense stack: decoder.prenet.layers.N.weight
    if re.search(r"decoder\.prenet\.layers\.\d+\.weight$", key):
        return True
    return False


def _map_hf_key(key: str) -> str:
    """One HF state-dict key -> our pytree path (dot separated)."""
    k = key
    if k.startswith("speecht5."):
        k = k[len("speecht5."):]
    # torch >=2 weight-norm parametrization names
    k = k.replace("parametrizations.weight.original0", "weight_g")
    k = k.replace("parametrizations.weight.original1", "weight_v")
    # norm affine params -> scale
    k = re.sub(r"(layer_norm|batch_norm)\.weight$", r"\1.scale", k)
    k = re.sub(r"batch_norm\.running_mean$", "batch_norm.mean", k)
    k = re.sub(r"batch_norm\.running_var$", "batch_norm.var", k)
    if _is_dense_weight(key):
        k = re.sub(r"\.weight$", ".kernel", k)
    return k


def load_hf_state_dict(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """HF SpeechT5 model state_dict -> our nested param dict.

    Works for full task models (ForSpeechToText / ForTextToSpeech) and for
    sub-module state dicts (e.g. ``wrapped_encoder``-rooted dicts, the pickle
    payloads the reference produces at extract_*:41-49).
    """
    flat: Dict[str, np.ndarray] = {}
    for key, value in state_dict.items():
        if any(s in key for s in _SKIPPED):
            continue
        arr = _to_numpy(value)
        new_key = _map_hf_key(key)
        if _is_dense_weight(key):
            arr = arr.T
        flat[new_key] = arr
    return unflatten_from_paths(flat)


# ---------------------------------------------------------------------------
# fairseq speecht5_base.pt import (the reference's Mapping contract)
# ---------------------------------------------------------------------------

def _map_fairseq_encoder_key(key: str) -> str:
    """fairseq 'encoder.*' key -> our wrapped_encoder-relative path."""
    k = key[len("encoder."):]
    k = k.replace("pos_emb.pe_k", "embed_positions.pe_k")
    k = re.sub(r"layers\.(\d+)\.self_attn\.", r"layers.\1.attention.", k)
    k = re.sub(r"layers\.(\d+)\.self_attn_layer_norm\.", r"layers.\1.layer_norm.", k)
    k = re.sub(r"layers\.(\d+)\.fc1\.", r"layers.\1.feed_forward.intermediate_dense.", k)
    k = re.sub(r"layers\.(\d+)\.fc2\.", r"layers.\1.feed_forward.output_dense.", k)
    return k


def load_fairseq_encoder(model_state: Mapping[str, "np.ndarray"]) -> Dict:
    """fairseq ckpt['model'] -> our transformer-encoder subtree
    (wrapped_encoder-relative), per map_speecht5_hf.py:34-99."""
    flat: Dict[str, np.ndarray] = {}
    for key, value in model_state.items():
        if not key.startswith("encoder."):
            continue
        k = _map_fairseq_encoder_key(key)
        arr = _to_numpy(value)
        parts = k.split(".")
        if parts[-1] == "weight" and parts[-2] in _DENSE_MODULES:
            arr = arr.T
            k = re.sub(r"\.weight$", ".kernel", k)
        elif "layer_norm" in k and k.endswith(".weight"):
            k = re.sub(r"\.weight$", ".scale", k)
        flat[k] = arr
    return unflatten_from_paths(flat)


def load_fairseq_speech_prenet(model_state: Mapping[str, "np.ndarray"]) -> Dict:
    """fairseq speech_encoder_prenet.* -> our speech-prenet subtree
    (per map_speecht5_hf.py:101-168)."""
    flat: Dict[str, np.ndarray] = {}
    for key, value in model_state.items():
        if not key.startswith("speech_encoder_prenet."):
            continue
        k = key[len("speech_encoder_prenet."):]
        arr = _to_numpy(value)
        if k == "mask_emb":
            flat["masked_spec_embed"] = arr
        elif k == "layer_norm.weight":
            flat["feature_projection.layer_norm.scale"] = arr
        elif k == "layer_norm.bias":
            flat["feature_projection.layer_norm.bias"] = arr
        elif k == "post_extract_proj.weight":
            flat["feature_projection.projection.kernel"] = arr.T
        elif k == "post_extract_proj.bias":
            flat["feature_projection.projection.bias"] = arr
        elif k.startswith("feature_extractor.conv_layers."):
            m = re.match(r"feature_extractor\.conv_layers\.(\d+)\.(\d+)\.(weight|bias)", k)
            if not m:
                continue
            layer, sub, leaf = m.group(1), m.group(2), m.group(3)
            if sub == "0":
                flat[f"feature_encoder.conv_layers.{layer}.conv.{leaf}"] = arr
            else:  # submodule 2 = the norm
                our = "scale" if leaf == "weight" else "bias"
                flat[f"feature_encoder.conv_layers.{layer}.layer_norm.{our}"] = arr
        elif k.startswith("pos_conv.0."):
            leaf = k[len("pos_conv.0."):]
            flat[f"pos_conv_embed.conv.{leaf}"] = arr
    return unflatten_from_paths(flat)


def load_fairseq_text_prenet(model_state: Mapping[str, "np.ndarray"]) -> Dict:
    """fairseq text_encoder_prenet embedding table -> our text-prenet subtree
    (per map_speecht5_hf.py:170-181; alpha stays at its init value 1.0, the
    reference keeps the HF TTS model's value which is likewise untrained)."""
    emb = _to_numpy(model_state["text_encoder_prenet.encoder_prenet.0.weight"])
    return {
        "embed_tokens": {"weight": emb},
        "encode_positions": {"alpha": np.ones((), np.float32)},
    }


def load_fairseq_checkpoint(ckpt: Mapping) -> Dict:
    """Full fairseq checkpoint dict (with 'model' key) -> the three subtrees
    the reference pickles (encoder / speech prenet / text prenet)."""
    model_state = ckpt["model"] if "model" in ckpt else ckpt
    return {
        "encoder": load_fairseq_encoder(model_state),
        "speech_prenet": load_fairseq_speech_prenet(model_state),
        "text_prenet": load_fairseq_text_prenet(model_state),
    }


def graft_fairseq_into_asr(asr_params: Dict, ckpt: Mapping) -> Dict:
    """Overwrite an ASR param tree's encoder with fairseq base weights —
    the state-dict surgery of extract_speecht5_base_embeddings_slurp.py:99-100."""
    sub = load_fairseq_checkpoint(ckpt)
    out = dict(asr_params)
    out["encoder"] = dict(asr_params["encoder"])
    out["encoder"]["wrapped_encoder"] = sub["encoder"]
    prenet = dict(asr_params["encoder"]["prenet"])
    prenet.update(sub["speech_prenet"])
    out["encoder"]["prenet"] = prenet
    return out


def graft_fairseq_into_tts(tts_params: Dict, ckpt: Mapping) -> Dict:
    """TTS-side graft (text branch, extract_*:81-82)."""
    sub = load_fairseq_checkpoint(ckpt)
    out = dict(tts_params)
    out["encoder"] = {
        "wrapped_encoder": sub["encoder"],
        "prenet": sub["text_prenet"],
    }
    return out
