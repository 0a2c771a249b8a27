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

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..data.podcasts import segment_by_energy
from ..models.speecht5 import model as st5
from ..models.speecht5.config import SpeechT5Config
from .beam import greedy_decode
from .context import ConversationContext
from .fusion import FusionLM


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
) -> List[TranscribedSegment]:
    """Transcribe an arbitrarily long waveform.

    One utterance at a time (batch=1 keeps the conversation cache exact);
    segments longer than ``batch_seconds`` are cropped.  Pass ``fusion`` to
    enable LM shallow fusion with cross-utterance context carry-over.
    """
    if segments is None:
        segments = segment_by_energy(wav, sr, max_segment_s=batch_seconds)
    ctx = None
    if fusion is not None:
        ctx = ConversationContext(fusion, batch=1,
                                  max_positions=fusion.cfg.n_positions,
                                  decode_reserve=max_decode_len + 8)

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
        enc, enc_mask = st5.encode_speech(params, cfg, jnp.asarray(x),
                                          jnp.asarray(m))
        if ctx is not None:
            cache, off = ctx.state()
            toks, lens = greedy_decode(params, cfg, enc, enc_mask,
                                       max_len=max_decode_len, fusion=fusion,
                                       lm_cache=cache, lm_start=off)
            ctx.append(toks, lens)
        else:
            toks, lens = greedy_decode(params, cfg, enc, enc_mask,
                                       max_len=max_decode_len)
        ids = [int(t) for t in np.asarray(toks)[0][: int(lens[0])]
               if int(t) != cfg.eos_token_id]
        text = tokenizer.decode(ids) if tokenizer is not None and ids else ""
        out.append(TranscribedSegment(start, end, ids, text))
    return out
