"""SpeechT5 task models: speech->text (ASR) and text->speech (TTS).

Functional equivalents of HF SpeechT5ForSpeechToText / SpeechT5ForTextToSpeech
(the two checkpoints the reference loads at extract_*embeddings_slurp.py:80/:98),
re-composed TPU-first: one jit-able forward over dict pytrees, explicit
dropout rngs, explicit KV caches for decoding.

Param tree layout intentionally mirrors the HF module hierarchy so that
checkpoint import (import_torch.py) is a mechanical rename.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops import layers
from . import decoder as dec
from . import encoder as enc
from . import prenets
from .config import SpeechT5Config


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def asr_init(rng, cfg: SpeechT5Config, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(rng, 5)
    return {
        "encoder": {
            "prenet": prenets.speech_prenet_init(ks[0], cfg, dtype),
            "wrapped_encoder": enc.encoder_init(ks[1], cfg, dtype),
        },
        "decoder": {
            "prenet": prenets.text_decoder_prenet_init(ks[2], cfg, dtype),
            "wrapped_decoder": dec.decoder_init(ks[3], cfg, dtype),
        },
        "text_decoder_postnet": prenets.text_decoder_postnet_init(ks[4], cfg, dtype),
    }


def tts_init(rng, cfg: SpeechT5Config, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(rng, 5)
    return {
        "encoder": {
            "prenet": prenets.text_encoder_prenet_init(ks[0], cfg, dtype),
            "wrapped_encoder": enc.encoder_init(ks[1], cfg, dtype),
        },
        "decoder": {
            "prenet": prenets.speech_decoder_prenet_init(ks[2], cfg, dtype),
            "wrapped_decoder": dec.decoder_init(ks[3], cfg, dtype),
        },
        "speech_decoder_postnet": prenets.speech_decoder_postnet_init(ks[4], cfg, dtype),
    }


# ---------------------------------------------------------------------------
# Encoders (the reference's embedding-extraction workload, SURVEY §3.1)
# ---------------------------------------------------------------------------

def encode_speech(
    params: Dict, cfg: SpeechT5Config, input_values: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None, *,
    deterministic: bool = True, rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Raw waveform [B, T] -> ([B, frames, H], frame mask).

    Equivalent of model.speecht5.encoder(**audios) in the reference
    (extract_speecht5_base_embeddings_slurp.py:108).
    """
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    hidden, mask = prenets.speech_prenet(
        params["encoder"]["prenet"], cfg, input_values, attention_mask,
        deterministic=deterministic, rng=r1)
    hidden = enc.encoder(params["encoder"]["wrapped_encoder"], cfg, hidden, mask,
                         deterministic=deterministic, dropout_rng=r2)
    return hidden, mask


def encode_text(
    params: Dict, cfg: SpeechT5Config, input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None, *,
    deterministic: bool = True, rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Token ids [B, L] -> [B, L, H] (reference extract_*:88 text branch)."""
    hidden = prenets.text_encoder_prenet(params["encoder"]["prenet"], cfg, input_ids)
    return enc.encoder(params["encoder"]["wrapped_encoder"], cfg, hidden,
                       attention_mask, deterministic=deterministic, dropout_rng=rng)


# ---------------------------------------------------------------------------
# ASR seq2seq forward (teacher-forced) + incremental decode step
# ---------------------------------------------------------------------------

def asr_forward(
    params: Dict, cfg: SpeechT5Config,
    input_values: jnp.ndarray,
    decoder_input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    decoder_attention_mask: Optional[jnp.ndarray] = None,
    *, deterministic: bool = True, rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Teacher-forced ASR forward -> vocab logits [B, L, V]."""
    r1 = r2 = r3 = None
    if rng is not None:
        r1, r2, r3 = jax.random.split(rng, 3)
    encoder_hidden, enc_mask = encode_speech(params, cfg, input_values,
                                             attention_mask,
                                             deterministic=deterministic, rng=r1)
    dec_in = prenets.text_decoder_prenet(params["decoder"]["prenet"], cfg,
                                         decoder_input_ids)
    dec_in = layers.dropout(r2, dec_in, cfg.positional_dropout, deterministic)
    hidden, _ = dec.decoder(params["decoder"]["wrapped_decoder"], cfg, dec_in,
                            encoder_hidden,
                            attention_mask=decoder_attention_mask,
                            encoder_attention_mask=enc_mask,
                            deterministic=deterministic, dropout_rng=r3)
    return prenets.text_decoder_postnet(params["text_decoder_postnet"], hidden)


def asr_decode_step(
    params: Dict, cfg: SpeechT5Config,
    token_ids: jnp.ndarray,            # [B, 1] current tokens
    step: jnp.ndarray,                 # scalar int32 decode position
    encoder_hidden: jnp.ndarray,
    encoder_mask: Optional[jnp.ndarray],
    kv_caches: Dict,
) -> Tuple[jnp.ndarray, Dict]:
    """One incremental decode step -> (logits [B, V], updated caches)."""
    dec_in = prenets.text_decoder_prenet(params["decoder"]["prenet"], cfg,
                                         token_ids, past_length=step)
    hidden, new_caches = dec.decoder(
        params["decoder"]["wrapped_decoder"], cfg, dec_in, encoder_hidden,
        encoder_attention_mask=encoder_mask, kv_caches=kv_caches,
        cache_index=step)
    logits = prenets.text_decoder_postnet(params["text_decoder_postnet"], hidden)
    return logits[:, -1, :], new_caches


def asr_loss(
    params: Dict, cfg: SpeechT5Config,
    input_values: jnp.ndarray, attention_mask: jnp.ndarray,
    labels: jnp.ndarray, *, label_pad_id: int = -100,
    deterministic: bool = False, rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Dict]:
    """Cross-entropy seq2seq loss with HF shift-right convention
    (decoder inputs = [start, labels[:-1]])."""
    start = jnp.full((labels.shape[0], 1), cfg.decoder_start_token_id, labels.dtype)
    shifted = jnp.concatenate([start, labels[:, :-1]], axis=1)
    shifted = jnp.where(shifted == label_pad_id, cfg.pad_token_id, shifted)
    logits = asr_forward(params, cfg, input_values, shifted,
                         attention_mask=attention_mask,
                         deterministic=deterministic, rng=rng)
    valid = (labels != label_pad_id)
    tgt = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    n = jnp.maximum(jnp.sum(valid), 1)
    loss = jnp.sum(nll * valid) / n
    return loss, {"ntokens": n, "nll_sum": jnp.sum(nll * valid)}


# ---------------------------------------------------------------------------
# TTS forward (teacher-forced)
# ---------------------------------------------------------------------------

def tts_forward(
    params: Dict, cfg: SpeechT5Config,
    input_ids: jnp.ndarray,
    decoder_input_values: jnp.ndarray,       # [B, T, mel]
    speaker_embeddings: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    *, deterministic: bool = True, rng: Optional[jax.Array] = None,
    prenet_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Teacher-forced TTS -> (mel_before, mel_after, stop_logits)."""
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    encoder_hidden = encode_text(params, cfg, input_ids, attention_mask,
                                 deterministic=deterministic, rng=r1)
    # reduction factor: decoder sees every r-th frame
    if cfg.reduction_factor > 1:
        decoder_input_values = decoder_input_values[:, cfg.reduction_factor - 1::cfg.reduction_factor]
    dec_in = prenets.speech_decoder_prenet(params["decoder"]["prenet"], cfg,
                                           decoder_input_values,
                                           speaker_embeddings, rng=prenet_rng)
    hidden, _ = dec.decoder(params["decoder"]["wrapped_decoder"], cfg, dec_in,
                            encoder_hidden, encoder_attention_mask=attention_mask,
                            deterministic=deterministic, dropout_rng=r2)
    return prenets.speech_decoder_postnet(params["speech_decoder_postnet"], cfg, hidden)
