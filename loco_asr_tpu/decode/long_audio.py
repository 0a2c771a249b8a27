"""Long-form (episode-scale) transcription with conversation carry-over —
BASELINE config 5: hour-long audio decoded segment-by-segment while the
fusion LM's KV cache carries the running conversation context.

Pipeline per episode:
  1. segment (provided timestamps or the energy endpointer)
  2. batch segments into fixed device shapes, chronological order
  3. decode each batch with greedy/beam + shallow fusion, where the
     ConversationContext primes the LM with everything decoded so far
  4. emit (start, end, token_ids / text) per segment
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.podcasts import segment_by_energy
from ..models.speecht5 import model as st5
from ..models.speecht5.config import SpeechT5Config
from .batcher import _cfg_key
from .beam import greedy_decode
from .context import ConversationContext
from .fusion import FusionLM


@functools.lru_cache(maxsize=16)
def _segment_fn(cfg_key: tuple, max_decode_len: int, attn_impl: str,
                lm_key: Optional[tuple], lm_weight: float):
    """One jit'd encode+decode program per (config, decode-len, impl, LM)
    — the per-segment loop must NOT run eagerly (each eager op round-trips
    the relay dispatcher; measured 9.8 s vs ~1 s per 3-min segment)."""
    cfg = SpeechT5Config(**dict(cfg_key))
    if lm_key is None:
        def fn(params, x, m):
            enc, em = st5.encode_speech(params, cfg, x, m,
                                        attn_impl=attn_impl)
            return greedy_decode(params, cfg, enc, em,
                                 max_len=max_decode_len)
        return jax.jit(fn)

    from ..models.gpt2.model import GPT2Config

    lm_cfg = GPT2Config(**dict(lm_key))

    def fn(params, lm_params, x, m, lm_cache, lm_start):
        fusion = FusionLM(lm_params, lm_cfg, weight=lm_weight)
        enc, em = st5.encode_speech(params, cfg, x, m, attn_impl=attn_impl)
        return greedy_decode(params, cfg, enc, em, max_len=max_decode_len,
                             fusion=fusion, lm_cache=lm_cache,
                             lm_start=lm_start, return_lm_cache=True)
    return jax.jit(fn)


@dataclass
class TranscribedSegment:
    start: float
    end: float
    token_ids: List[int]
    text: str = ""


def transcribe_long_audio(
    params: Dict, cfg: SpeechT5Config, wav: np.ndarray, sr: int = 16000, *,
    segments: Optional[Sequence[Tuple[float, float]]] = None,
    fusion: Optional[FusionLM] = None,
    max_decode_len: int = 200,
    batch_seconds: float = 20.0,
    tokenizer=None,
    attn_impl: str = "dense",
) -> List[TranscribedSegment]:
    """Transcribe an arbitrarily long waveform.

    One utterance at a time (batch=1 keeps the conversation cache exact);
    segments longer than ``batch_seconds`` are cropped.  Pass ``fusion`` to
    enable LM shallow fusion with cross-utterance context carry-over.
    ``attn_impl="flash"`` encodes each segment with the banded rel-pos
    Pallas kernel — raise ``batch_seconds`` into the minutes range (dense
    OOMs past ~2.7 min of frames; docs/BENCH.md conversation-length table).
    """
    if segments is None:
        segments = segment_by_energy(wav, sr, max_segment_s=batch_seconds)
    ctx = None
    if fusion is not None:
        ctx = ConversationContext(fusion, batch=1,
                                  max_positions=fusion.cfg.n_positions,
                                  decode_reserve=max_decode_len + 8)
        seg_fn = _segment_fn(_cfg_key(cfg), max_decode_len, attn_impl,
                             _cfg_key(fusion.cfg), fusion.weight)
    else:
        seg_fn = _segment_fn(_cfg_key(cfg), max_decode_len, attn_impl,
                             None, 0.0)

    out: List[TranscribedSegment] = []
    max_samples = int(batch_seconds * sr)
    for start, end in segments:
        chunk = wav[int(start * sr): int(end * sr)][:max_samples]
        if len(chunk) == 0:
            continue
        pad = -len(chunk) % sr  # pad to whole seconds: few compile shapes
        x = np.zeros((1, len(chunk) + pad), np.float32)
        m = np.zeros_like(x, dtype=np.int32)
        x[0, :len(chunk)] = chunk
        m[0, :len(chunk)] = 1
        if ctx is not None:
            cache, off = ctx.state()
            toks, lens, cache = seg_fn(params, fusion.params, jnp.asarray(x),
                                       jnp.asarray(m), cache, off)
            ctx.append(toks, lens, cache)
        else:
            toks, lens = seg_fn(params, jnp.asarray(x), jnp.asarray(m))
        ids = [int(t) for t in np.asarray(toks)[0][: int(lens[0])]
               if int(t) != cfg.eos_token_id]
        text = tokenizer.decode(ids) if tokenizer is not None and ids else ""
        out.append(TranscribedSegment(start, end, ids, text))
    return out
