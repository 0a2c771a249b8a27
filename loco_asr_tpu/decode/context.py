"""Cross-utterance conversation context for long-context ASR decoding.

The LoCo-ASR research goal (SURVEY intro; BASELINE config 5): exploit
conversation-level history when decoding each new utterance.  The reference
only realizes this for LM *scoring* (the max_len sliding window); this
module realizes it for *decoding*: a device-resident rolling LM context —
the fusion LM's KV cache persists across utterances of a conversation, so
utterance n is scored conditioned on utterances 1..n-1 without recomputing
them (O(history) once instead of per step).

Rolling policy: a fixed-size token ring; when the history would overflow
the LM's positions, the oldest half is dropped and the cache rebuilt (one
forward over the kept tail) — amortized O(1) refreshes per conversation.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .fusion import FusionLM


@dataclasses.dataclass
class ConversationContext:
    """Per-conversation LM state for fused decoding (batch of streams).

    Usage per utterance:
        cache, start = ctx.state()
        toks, lens = greedy_decode(..., fusion=lm, lm_cache=cache, lm_start=start)
        ctx.append(toks, lens)
    """

    lm: FusionLM
    batch: int
    max_positions: Optional[int] = None
    decode_reserve: int = 128   # positions kept free for the next utterance

    def __post_init__(self):
        self.max_positions = self.max_positions or self.lm.cfg.n_positions
        self._tokens: List[np.ndarray] = []   # history per stream, host side
        self._cache = self.lm.init_cache(self.batch, self.max_positions)
        self._offset = jnp.zeros((), jnp.int32)

    @property
    def history_len(self) -> int:
        return int(self._offset)

    def state(self) -> Tuple[Dict, jnp.ndarray]:
        return self._cache, self._offset

    def append(self, tokens: jnp.ndarray, lengths: jnp.ndarray) -> None:
        """Fold a decoded utterance [B, L] into the rolling context.

        The decode loop already wrote these tokens' KV into the cache (the
        fusion LM stepped over them), so appending = advancing the offset to
        the longest emitted length; per-stream ragged tails stay in the
        cache but are masked by causality for shorter streams.  When the
        window would overflow, the kept tail is re-encoded.
        """
        tokens = np.asarray(tokens)
        lengths = np.asarray(lengths)
        step = int(lengths.max()) if lengths.size else 0
        self._tokens.append(tokens[:, :step])
        new_off = int(self._offset) + step
        if new_off > self.max_positions - self.decode_reserve:
            self._refresh()
        else:
            self._offset = jnp.asarray(new_off, jnp.int32)

    def _refresh(self) -> None:
        """Drop the oldest half of the history and rebuild the cache."""
        hist = np.concatenate(self._tokens, axis=1) if self._tokens else \
            np.zeros((self.batch, 0), np.int32)
        keep = min(hist.shape[1] // 2,
                   self.max_positions - self.decode_reserve)
        tail = hist[:, hist.shape[1] - keep:]
        self._tokens = [tail]
        self._cache = self.lm.init_cache(self.batch, self.max_positions)
        self._offset = jnp.zeros((), jnp.int32)
        if keep > 0:
            self._cache, self._offset = self.lm.prime(
                jnp.asarray(tail.astype(np.int32)), self._cache, self._offset)

    def reset(self) -> None:
        self._tokens = []
        self._cache = self.lm.init_cache(self.batch, self.max_positions)
        self._offset = jnp.zeros((), jnp.int32)
