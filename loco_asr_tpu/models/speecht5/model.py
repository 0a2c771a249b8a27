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
from ...ops.act_sharding import constrain_batch
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
    remat: bool = False, attn_impl: str = "dense",
    ring: Optional[tuple] = None, unroll_layers=False,
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
    # boundary activation-sharding constraints (no-ops outside a sharded
    # step's ops.act_sharding.activation_mesh context)
    hidden = constrain_batch(hidden)
    hidden = enc.encoder(params["encoder"]["wrapped_encoder"], cfg, hidden, mask,
                         deterministic=deterministic, dropout_rng=r2,
                         remat=remat, attn_impl=attn_impl, ring=ring,
                         unroll=unroll_layers)
    return constrain_batch(hidden), mask


def encode_text(
    params: Dict, cfg: SpeechT5Config, input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None, *,
    deterministic: bool = True, rng: Optional[jax.Array] = None,
    attn_impl: str = "dense", ring: Optional[tuple] = None,
) -> jnp.ndarray:
    """Token ids [B, L] -> [B, L, H] (reference extract_*:88 text branch)."""
    hidden = prenets.text_encoder_prenet(params["encoder"]["prenet"], cfg, input_ids)
    return enc.encoder(params["encoder"]["wrapped_encoder"], cfg, hidden,
                       attention_mask, deterministic=deterministic, dropout_rng=rng,
                       attn_impl=attn_impl, ring=ring)


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
    remat: bool = False, attn_impl: str = "dense",
    ring: Optional[tuple] = None, unroll_layers=False,
) -> jnp.ndarray:
    """Teacher-forced ASR forward -> vocab logits [B, L, V]."""
    r1 = r2 = r3 = None
    if rng is not None:
        r1, r2, r3 = jax.random.split(rng, 3)
    encoder_hidden, enc_mask = encode_speech(params, cfg, input_values,
                                             attention_mask,
                                             deterministic=deterministic, rng=r1,
                                             remat=remat, attn_impl=attn_impl,
                                             ring=ring,
                                             unroll_layers=unroll_layers)
    # Boundary activation-sharding constraints (no-ops outside a sharded
    # step's ops.act_sharding.activation_mesh context): pin the megatron
    # batch-sharded layout between prenet, decoder, and postnet
    # (encode_speech pins its own output).
    dec_in = prenets.text_decoder_prenet(params["decoder"]["prenet"], cfg,
                                         decoder_input_ids)
    dec_in = layers.dropout(r2, dec_in, cfg.positional_dropout, deterministic)
    dec_in = constrain_batch(dec_in)
    # flash routes BOTH decoder attentions through the Pallas kernels
    # (conversation-window training: no [B,H,L,L]/[B,H,L,T] scores);
    # ring/ulysses shard ENCODER frames — the decoder stays dense there
    hidden, _ = dec.decoder(params["decoder"]["wrapped_decoder"], cfg, dec_in,
                            encoder_hidden,
                            attention_mask=decoder_attention_mask,
                            encoder_attention_mask=enc_mask,
                            deterministic=deterministic, dropout_rng=r3,
                            attn_impl=("flash" if attn_impl == "flash"
                                       else "dense"))
    hidden = constrain_batch(hidden)
    return prenets.text_decoder_postnet(params["text_decoder_postnet"], hidden)


def asr_decode_step(
    params: Dict, cfg: SpeechT5Config,
    token_ids: jnp.ndarray,            # [B, 1] current tokens
    step: jnp.ndarray,                 # int32 decode position (scalar or [B])
    encoder_hidden: jnp.ndarray,
    encoder_mask: Optional[jnp.ndarray],
    kv_caches: Dict,
    cross_caches: Optional[Dict] = None,
) -> Tuple[jnp.ndarray, Dict]:
    """One incremental decode step -> (logits [B, V], updated caches).

    Pass ``cross_caches`` (decoder.init_cross_cache over the encoder
    output, computed once per utterance) so the per-step cross-attention
    skips re-projecting the whole encoder sequence."""
    dec_in = prenets.text_decoder_prenet(params["decoder"]["prenet"], cfg,
                                         token_ids, past_length=step)
    # boundary activation-sharding constraints (no-ops outside a sharded
    # context) — incremental decode is a composed program too
    dec_in = constrain_batch(dec_in)
    hidden, new_caches = dec.decoder(
        params["decoder"]["wrapped_decoder"], cfg, dec_in, encoder_hidden,
        encoder_attention_mask=encoder_mask, kv_caches=kv_caches,
        cache_index=step, cross_caches=cross_caches)
    hidden = constrain_batch(hidden)
    logits = prenets.text_decoder_postnet(params["text_decoder_postnet"], hidden)
    return logits[:, -1, :], new_caches


def asr_cross_cache(params: Dict, cfg: SpeechT5Config,
                    encoder_hidden: jnp.ndarray) -> Dict:
    """Per-layer cross-attention K/V for incremental decoding (see
    decoder.init_cross_cache)."""
    return dec.init_cross_cache(params["decoder"]["wrapped_decoder"], cfg,
                                encoder_hidden)


def asr_loss(
    params: Dict, cfg: SpeechT5Config,
    input_values: jnp.ndarray, attention_mask: jnp.ndarray,
    labels: jnp.ndarray, *, label_pad_id: int = -100,
    deterministic: bool = False, rng: Optional[jax.Array] = None,
    remat: bool = False, attn_impl: str = "dense",
    ring: Optional[tuple] = None, unroll_layers=False,
) -> Tuple[jnp.ndarray, Dict]:
    """Cross-entropy seq2seq loss with HF shift-right convention
    (decoder inputs = [start, labels[:-1]])."""
    start = jnp.full((labels.shape[0], 1), cfg.decoder_start_token_id, labels.dtype)
    shifted = jnp.concatenate([start, labels[:, :-1]], axis=1)
    shifted = jnp.where(shifted == label_pad_id, cfg.pad_token_id, shifted)
    logits = asr_forward(params, cfg, input_values, shifted,
                         attention_mask=attention_mask,
                         deterministic=deterministic, rng=rng, remat=remat,
                         attn_impl=attn_impl, ring=ring,
                         unroll_layers=unroll_layers)
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
    """Teacher-forced TTS -> (mel_before, mel_after, stop_logits).

    ``decoder_input_values`` follows the HF convention: already
    reduction-subsampled and right-shifted when training (see
    :func:`shift_spectrograms_right`); raw decoder inputs otherwise.
    """
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    encoder_hidden = encode_text(params, cfg, input_ids, attention_mask,
                                 deterministic=deterministic, rng=r1)
    dec_in = prenets.speech_decoder_prenet(params["decoder"]["prenet"], cfg,
                                           decoder_input_values,
                                           speaker_embeddings, rng=prenet_rng)
    hidden, _ = dec.decoder(params["decoder"]["wrapped_decoder"], cfg, dec_in,
                            encoder_hidden, encoder_attention_mask=attention_mask,
                            deterministic=deterministic, dropout_rng=r2)
    return prenets.speech_decoder_postnet(params["speech_decoder_postnet"], cfg, hidden)


def s2s_init(rng, cfg: SpeechT5Config, dtype=jnp.float32) -> Dict:
    """Speech->speech (voice conversion) model: speech encoder prenet +
    speech decoder pre/post nets (HF SpeechT5ForSpeechToSpeech layout,
    demoed by reference notebook 1)."""
    ks = jax.random.split(rng, 5)
    return {
        "encoder": {
            "prenet": prenets.speech_prenet_init(ks[0], cfg, dtype),
            "wrapped_encoder": enc.encoder_init(ks[1], cfg, dtype),
        },
        "decoder": {
            "prenet": prenets.speech_decoder_prenet_init(ks[2], cfg, dtype),
            "wrapped_decoder": dec.decoder_init(ks[3], cfg, dtype),
        },
        "speech_decoder_postnet": prenets.speech_decoder_postnet_init(ks[4], cfg, dtype),
    }


def s2s_forward(
    params: Dict, cfg: SpeechT5Config,
    input_values: jnp.ndarray,
    decoder_input_values: jnp.ndarray,
    speaker_embeddings: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    *, deterministic: bool = True, rng: Optional[jax.Array] = None,
    prenet_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Teacher-forced voice conversion -> (mel_before, mel_after, stop)."""
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    encoder_hidden, enc_mask = encode_speech(params, cfg, input_values,
                                             attention_mask,
                                             deterministic=deterministic, rng=r1)
    dec_in = prenets.speech_decoder_prenet(params["decoder"]["prenet"], cfg,
                                           decoder_input_values,
                                           speaker_embeddings, rng=prenet_rng)
    hidden, _ = dec.decoder(params["decoder"]["wrapped_decoder"], cfg, dec_in,
                            encoder_hidden, encoder_attention_mask=enc_mask,
                            deterministic=deterministic, dropout_rng=r2)
    return prenets.speech_decoder_postnet(params["speech_decoder_postnet"], cfg, hidden)


def shift_spectrograms_right(mel: jnp.ndarray, reduction_factor: int = 1
                             ) -> jnp.ndarray:
    """Label mels -> decoder inputs: thin by the reduction factor, shift
    right one step with a zero frame (HF shift_spectrograms_right parity)."""
    if reduction_factor > 1:
        mel = mel[:, reduction_factor - 1::reduction_factor]
    zeros = jnp.zeros_like(mel[:, :1])
    return jnp.concatenate([zeros, mel[:, :-1]], axis=1)


def tts_generate(
    params: Dict, cfg: SpeechT5Config,
    input_ids: jnp.ndarray,
    speaker_embeddings: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    *, threshold: float = 0.5, minlenratio: float = 0.0,
    maxlenratio: float = 20.0, prenet_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Autoregressive mel synthesis -> (mel [B, T*r, mel], frame lengths).

    Numerics contract: HF _generate_speech (modeling_speecht5.py:2289-2400)
    — zero initial frame, per-step stop prob = sigmoid(prob_out) summed over
    the reduction factor vs ``threshold``, residual conv postnet over the
    finished spectrogram.  Runs as one lax.while_loop with fixed-shape
    buffers and a decoder KV cache (the prenet is position-wise, so one
    frame per step replaces HF's full-prefix prenet re-run).

    The conv postnet here runs over the padded batch buffer; rows shorter
    than the batch max can differ from HF in the last ~(kernel*layers)/2
    frames before their stop (HF crops first).  Exact per-row parity:
    crop to the returned length before the postnet with batch size 1.
    """
    if speaker_embeddings is None:
        raise ValueError("speaker_embeddings must be specified")
    if attention_mask is None:
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
    b = input_ids.shape[0]
    encoder_hidden = encode_text(params, cfg, input_ids, attention_mask)
    t_enc = encoder_hidden.shape[1]
    maxlen = int(t_enc * maxlenratio / cfg.reduction_factor)
    minlen = int(t_enc * minlenratio / cfg.reduction_factor)
    r = cfg.reduction_factor
    mel = cfg.num_mel_bins

    caches = dec.init_decode_cache(cfg, b, maxlen + 1, encoder_hidden.dtype)
    cross = dec.init_cross_cache(params["decoder"]["wrapped_decoder"], cfg,
                                 encoder_hidden)   # once, not per AR step
    spec_buf = jnp.zeros((b, maxlen * r, mel), encoder_hidden.dtype)

    def body(state):
        idx, frame, done, lengths, caches, spec_buf, rng = state
        sub = None
        if rng is not None:
            rng, sub = jax.random.split(rng)
        dec_in = prenets.speech_decoder_prenet_step(
            params["decoder"]["prenet"], cfg, frame, idx, speaker_embeddings,
            rng=sub)
        hidden, caches = dec.decoder(
            params["decoder"]["wrapped_decoder"], cfg, dec_in[:, None, :],
            encoder_hidden, encoder_attention_mask=attention_mask,
            kv_caches=caches, cache_index=idx, cross_caches=cross)
        last = hidden[:, 0]                                   # [B, H]
        spectrum = layers.dense(params["speech_decoder_postnet"]["feat_out"],
                                last).reshape(b, r, mel)
        spec_buf = jax.lax.dynamic_update_slice(spec_buf, spectrum,
                                                (0, idx * r, 0))
        prob = jax.nn.sigmoid(layers.dense(
            params["speech_decoder_postnet"]["prob_out"], last))  # [B, r]
        stop = (jnp.sum(prob, axis=-1) >= threshold) & (idx + 1 >= minlen)
        newly_done = stop & ~done
        lengths = jnp.where(newly_done, (idx + 1) * r, lengths)
        done = done | stop
        return idx + 1, spectrum[:, -1, :], done, lengths, caches, spec_buf, rng

    def cond(state):
        idx, _, done, *_ = state
        return (idx < maxlen) & ~jnp.all(done)

    init = (jnp.zeros((), jnp.int32), jnp.zeros((b, mel), encoder_hidden.dtype),
            jnp.zeros((b,), bool), jnp.full((b,), maxlen * r, jnp.int32),
            caches, spec_buf, prenet_rng)
    idx, _, done, lengths, _, spec_buf, _ = jax.lax.while_loop(cond, body, init)
    lengths = jnp.where(done, lengths, idx * r)
    refined = prenets.speech_decoder_postnet_conv(
        params["speech_decoder_postnet"], cfg, spec_buf)
    return refined, lengths
