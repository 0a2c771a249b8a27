"""Device-resident greedy and beam decoding for the SpeechT5 ASR model,
with optional LM shallow fusion.

The whole decode loop (step, top-k, cache reshuffle, LM fusion) is one
jit-able program over fixed-shape state — no per-step host round-trip
(the reference's pipelines round-trip every batch, SURVEY §3.1; decoding
itself does not exist in the reference snapshot and is net-new, BASELINE
config 4).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.speecht5 import decoder as dec
from ..models.speecht5 import model as st5
from ..models.speecht5.config import SpeechT5Config
from .fusion import FusionLM

NEG_INF = -1.0e9


def beam_init_scores(rows: int, k: int) -> jnp.ndarray:
    """[rows, K] beam scores at step 0: only beam 0 live (shared by the
    static path below and the continuous batcher — the equality contract
    between them depends on an identical init)."""
    return jnp.tile(jnp.asarray([0.0] + [NEG_INF] * (k - 1),
                                jnp.float32)[None, :], (rows, 1))


class BeamHypotheses(NamedTuple):
    tokens: jnp.ndarray    # [B, K, L] int32 (bos excluded)
    scores: jnp.ndarray    # [B, K] raw log-prob sums
    lengths: jnp.ndarray   # [B, K] tokens emitted incl. eos
    normalized: jnp.ndarray  # [B, K] length-normalized scores (sorted desc)


def _length_penalty(lengths: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """GNMT length penalty ((5+len)/6)^alpha."""
    return jnp.power((5.0 + lengths.astype(jnp.float32)) / 6.0, alpha)


def greedy_decode(
    params: Dict, cfg: SpeechT5Config,
    encoder_hidden: jnp.ndarray, encoder_mask: Optional[jnp.ndarray],
    *, max_len: int = 100,
    fusion: Optional[FusionLM] = None,
    lm_cache: Optional[Dict] = None, lm_start: Optional[jnp.ndarray] = None,
    lm_mask: Optional[jnp.ndarray] = None,
    return_lm_cache: bool = False,
):
    """Greedy decode -> (tokens [B, max_len], lengths [B]).

    Pass a primed ``lm_cache``/``lm_start``/``lm_mask`` for conversation
    carry-over (decode/context.py); the LM then conditions on prior
    utterances.  ``lm_mask`` [B, cache_len] marks valid cache positions
    (ragged per-stream histories leave stale KV slots that causality does
    not hide).  Carry-over callers MUST take the updated cache back
    (``return_lm_cache=True`` -> third return value) — the decode loop's
    KV writes live in that copy, and advancing offsets over the original
    cache would attend zero-filled slots.
    """
    b = encoder_hidden.shape[0]
    caches = dec.init_decode_cache(cfg, b, max_len + 1, encoder_hidden.dtype)
    cross = st5.asr_cross_cache(params, cfg, encoder_hidden)  # once, not per step
    if fusion is not None and lm_cache is None:
        lm_cache = fusion.init_cache(b, max_len + 1)
        lm_start = jnp.zeros((), jnp.int32)

    def body(state):
        t, tok, done, caches, lm_cache, out = state
        logits, caches = st5.asr_decode_step(
            params, cfg, tok, t, encoder_hidden, encoder_mask, caches,
            cross_caches=cross)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if fusion is not None:
            lm_logp, lm_cache = fusion.step(tok, lm_start + t, lm_cache,
                                            attention_mask=lm_mask)
            logp = logp + lm_logp
        nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        out = out.at[:, t].set(nxt)
        done = done | (nxt == cfg.eos_token_id)
        return t + 1, nxt[:, None], done, caches, lm_cache, out

    def cond(state):
        t, _, done, *_ = state
        return (t < max_len) & ~jnp.all(done)

    init = (jnp.zeros((), jnp.int32),
            jnp.full((b, 1), cfg.decoder_start_token_id, jnp.int32),
            jnp.zeros((b,), bool),
            caches, lm_cache,
            jnp.full((b, max_len), cfg.pad_token_id, jnp.int32))
    _, _, _, _, final_lm_cache, out = jax.lax.while_loop(cond, body, init)
    lengths = jnp.sum(out != cfg.pad_token_id, axis=-1)
    if return_lm_cache:
        return out, lengths, final_lm_cache
    return out, lengths


def _tile_beam(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return jnp.repeat(x, k, axis=0)


def beam_search(
    params: Dict, cfg: SpeechT5Config,
    encoder_hidden: jnp.ndarray, encoder_mask: Optional[jnp.ndarray],
    *, beam_size: int = 5, max_len: int = 100, length_penalty: float = 1.0,
    fusion: Optional[FusionLM] = None,
    lm_cache: Optional[Dict] = None, lm_start: Optional[jnp.ndarray] = None,
    lm_mask: Optional[jnp.ndarray] = None,
    return_lm_cache: bool = False,
):
    """Batched beam search, fully on device.

    Finished beams are frozen (forced pad emission at zero added score);
    final ranking applies the GNMT length penalty.  With ``fusion``, token
    scores are log p_asr + weight * log p_lm.

    Conversation carry-over (decode/context.py): pass a primed, beam-flat
    ``lm_cache`` ([B*K, ...]; tile the per-stream cache over K) with
    per-stream ``lm_start`` ([B] is tiled to [B*K] automatically) and set
    ``return_lm_cache=True`` — the second return value is the final LM
    cache with rows reordered to the HYPOTHESIS order (row i*K+j = ranked
    hypothesis j of stream i), so row i*K+0 is the best hypothesis'
    carried LM state.
    """
    b, k, v = encoder_hidden.shape[0], beam_size, cfg.vocab_size
    enc = _tile_beam(encoder_hidden, k)            # [B*K, T, H]
    enc_mask = _tile_beam(encoder_mask, k) if encoder_mask is not None else None
    caches = dec.init_decode_cache(cfg, b * k, max_len + 1, encoder_hidden.dtype)
    cross = st5.asr_cross_cache(params, cfg, enc)  # once, not per step
    if fusion is not None and lm_cache is None:
        lm_cache = fusion.init_cache(b * k, max_len + 1)
        lm_start = jnp.zeros((), jnp.int32)
    if lm_start is not None and getattr(lm_start, "ndim", 0) == 1 \
            and lm_start.shape[0] == b:
        lm_start = jnp.repeat(lm_start, k)         # [B] -> [B*K]
    lm_mask_k = _tile_beam(lm_mask, k) if lm_mask is not None else None

    # freeze mask for finished rows: pad gets 0, everything else -inf
    pad_onehot = jnp.full((v,), NEG_INF).at[cfg.pad_token_id].set(0.0)

    def body(t, state):
        tokens, scores, lengths, done, last, caches, lm_cache = state
        logits, new_caches = st5.asr_decode_step(
            params, cfg, last.reshape(b * k, 1), t, enc, enc_mask, caches,
            cross_caches=cross)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if fusion is not None:
            lm_logp, new_lm_cache = fusion.step(last.reshape(b * k, 1),
                                                lm_start + t, lm_cache,
                                                attention_mask=lm_mask_k)
            logp = logp + lm_logp
        else:
            new_lm_cache = lm_cache
        logp = logp.reshape(b, k, v)
        logp = jnp.where(done[..., None], pad_onehot[None, None, :], logp)

        cand = scores[..., None] + logp                   # [B, K, V]
        flat = cand.reshape(b, k * v)
        top_scores, top_idx = jax.lax.top_k(flat, k)      # [B, K]
        parent = top_idx // v                              # [B, K]
        tok = (top_idx % v).astype(jnp.int32)

        def gather_beam(x):
            # x: [B, K, ...] -> parent-reordered
            return jnp.take_along_axis(
                x, parent.reshape(parent.shape + (1,) * (x.ndim - 2)), axis=1)

        tokens = gather_beam(tokens).at[:, :, t].set(tok)
        done = gather_beam(done)
        lengths = gather_beam(lengths)
        lengths = jnp.where(done, lengths, lengths + 1)
        done = done | (tok == cfg.eos_token_id)

        # reorder flat [B*K, ...] caches by parent
        flat_idx = (jnp.arange(b)[:, None] * k + parent).reshape(-1)

        def gather_flat(x):
            return jnp.take(x, flat_idx, axis=0)

        new_caches = jax.tree_util.tree_map(gather_flat, new_caches)
        if fusion is not None:
            new_lm_cache = jax.tree_util.tree_map(gather_flat, new_lm_cache)
        return (tokens, top_scores, lengths, done, tok, new_caches, new_lm_cache)

    init_scores = beam_init_scores(b, k)
    state = (
        jnp.full((b, k, max_len), cfg.pad_token_id, jnp.int32),
        init_scores,
        jnp.zeros((b, k), jnp.int32),
        jnp.zeros((b, k), bool),
        jnp.full((b, k), cfg.decoder_start_token_id, jnp.int32),
        caches, lm_cache,
    )
    tokens, scores, lengths, done, _, _, final_lm_cache = jax.lax.fori_loop(
        0, max_len, body, state)

    normalized = scores / _length_penalty(jnp.maximum(lengths, 1), length_penalty)
    order = jnp.argsort(-normalized, axis=1)
    take = lambda x: jnp.take_along_axis(
        x, order.reshape(order.shape + (1,) * (x.ndim - 2)), axis=1)
    hyps = BeamHypotheses(tokens=take(tokens), scores=take(scores),
                          lengths=take(lengths), normalized=take(normalized))
    if not return_lm_cache:
        return hyps
    if final_lm_cache is not None:
        # beam-flat rows -> hypothesis order (row i*K+0 = best of stream i)
        flat_idx = (jnp.arange(b)[:, None] * k + order).reshape(-1)
        final_lm_cache = jax.tree_util.tree_map(
            lambda x: jnp.take(x, flat_idx, axis=0), final_lm_cache)
    return hyps, final_lm_cache


def decode_utterance_batch(
    params: Dict, cfg: SpeechT5Config, input_values: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None, *,
    beam_size: int = 1, max_len: int = 100, length_penalty: float = 1.0,
    fusion: Optional[FusionLM] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Waveform in, token ids out (encode + decode in one call).
    beam_size=1 routes to greedy."""
    enc, mask = st5.encode_speech(params, cfg, input_values, attention_mask)
    if beam_size == 1:
        return greedy_decode(params, cfg, enc, mask, max_len=max_len,
                             fusion=fusion)
    hyp = beam_search(params, cfg, enc, mask, beam_size=beam_size,
                      max_len=max_len, length_penalty=length_penalty,
                      fusion=fusion)
    return hyp.tokens[:, 0], hyp.lengths[:, 0]
