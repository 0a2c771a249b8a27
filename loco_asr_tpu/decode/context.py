"""Cross-utterance conversation context for long-context ASR decoding.

The LoCo-ASR research goal (SURVEY intro; BASELINE config 5): exploit
conversation-level history when decoding each new utterance.  The reference
only realizes this for LM *scoring* (the max_len sliding window); this
module realizes it for *decoding*: a device-resident rolling LM context —
the fusion LM's KV cache persists across utterances of a conversation, so
utterance n is scored conditioned on utterances 1..n-1 without recomputing
them (O(history) once instead of per step).

Ragged batches: streams decode different numbers of tokens per utterance.
Offsets are tracked PER STREAM (gpt2_forward supports a [B] cache_index):
each stream's KV lands at its own contiguous position, so every slot below
a stream's offset is real history and causality alone hides everything
else — batched carry-over matches each stream decoded alone bit-for-bit
(a single max-aligned offset would leave attendable stale pad KVs in
shorter streams' pasts).

Rolling policy: a fixed-size token ring; when any stream's history would
overflow the LM's positions, the oldest half of each stream's history is
dropped and the cache rebuilt (one forward over the right-padded kept
tails) — amortized O(1) refreshes per conversation.
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

    Usage per utterance (the decode loop's UPDATED cache must come back —
    its KV writes live in that functional copy, see :meth:`append`):
        cache, start = ctx.state()      # start: [B] per-stream offsets
        toks, lens, cache = greedy_decode(..., fusion=lm, lm_cache=cache,
                                          lm_start=start,
                                          return_lm_cache=True)
        ctx.append(toks, lens, cache)
    """

    lm: FusionLM
    batch: int
    max_positions: Optional[int] = None
    decode_reserve: int = 128   # positions kept free for the next utterance

    def __post_init__(self):
        self.max_positions = self.max_positions or self.lm.cfg.n_positions
        # host-side per-stream history (trimmed to true length, no pads)
        self._history: List[List[np.ndarray]] = [[] for _ in range(self.batch)]
        self._cache = self.lm.init_cache(self.batch, self.max_positions)
        self._offsets = np.zeros((self.batch,), np.int32)

    @property
    def history_len(self) -> int:
        return int(self._offsets.max(initial=0))

    def state(self) -> Tuple[Dict, jnp.ndarray]:
        return self._cache, jnp.asarray(self._offsets)

    def append(self, tokens: jnp.ndarray, lengths: jnp.ndarray,
               cache: Optional[Dict] = None) -> None:
        """Fold a decoded utterance [B, L] into the rolling context.

        ``cache`` MUST be the decode loop's updated LM cache
        (``greedy_decode(..., return_lm_cache=True)``): the loop's KV
        writes live in that functional copy, not in the cache handed out
        by :meth:`state` — advancing offsets without taking it back would
        leave zero-filled slots in every stream's attendable past.
        When any stream's window would overflow, the kept tails are
        re-encoded from host-side token history instead.
        """
        if cache is not None:
            self._cache = cache
        tokens = np.asarray(tokens)
        lengths = np.asarray(lengths, np.int64)
        for s in range(self.batch):
            n = int(lengths[s])
            self._history[s].append(tokens[s, :n].astype(np.int32))
        self._offsets = self._offsets + lengths.astype(np.int32)
        if int(self._offsets.max(initial=0)) > \
                self.max_positions - self.decode_reserve:
            self._refresh()

    def _refresh(self) -> None:
        """Drop the oldest half of each stream's history and rebuild the
        cache from the right-padded kept tails.  Pad slots only ever sit at
        positions at-or-beyond a stream's new offset, so causality keeps
        them out of every later softmax."""
        limit = self.max_positions - self.decode_reserve
        tails = []
        for s in range(self.batch):
            hist = (np.concatenate(self._history[s])
                    if self._history[s] else np.zeros((0,), np.int32))
            keep = min(len(hist) // 2, limit)
            tails.append(hist[len(hist) - keep:])
        max_keep = max((len(t) for t in tails), default=0)
        self._history = [[t] for t in tails]
        self._cache = self.lm.init_cache(self.batch, self.max_positions)
        self._offsets = np.asarray([len(t) for t in tails], np.int32)
        if max_keep > 0:
            padded = np.zeros((self.batch, max_keep), np.int32)
            for s, t in enumerate(tails):
                padded[s, :len(t)] = t
            self._cache, _ = self.lm.prime(
                jnp.asarray(padded), self._cache,
                jnp.zeros((self.batch,), jnp.int32))

    def reset(self) -> None:
        self._history = [[] for _ in range(self.batch)]
        self._cache = self.lm.init_cache(self.batch, self.max_positions)
        self._offsets = np.zeros((self.batch,), np.int32)


def beam_decode_with_context(params, cfg, encoder_hidden, encoder_mask,
                             ctx: ConversationContext, *, beam_size: int,
                             max_len: int = 100,
                             length_penalty: float = 1.0):
    """One conversation utterance decoded with BEAM search + carry-over
    (the sequential reference for the continuous batcher's beam
    conversation mode — BASELINE configs 4+5 combined).

    Each of the stream's K beams starts from the SAME carried LM state
    (the per-stream cache tiled over beams); after the search, the BEST
    hypothesis' LM cache row is what carries forward — the next utterance
    conditions on the history actually emitted, exactly like the greedy
    path carries its single stream's cache.

    Returns the BeamHypotheses; ``ctx`` is advanced by the best
    hypothesis of each stream.
    """
    import jax

    from .beam import beam_search

    k = beam_size
    cache, start = ctx.state()
    k_cache = jax.tree_util.tree_map(lambda c: jnp.repeat(c, k, axis=0),
                                     cache)
    hyp, lm_cache = beam_search(
        params, cfg, encoder_hidden, encoder_mask, beam_size=k,
        max_len=max_len, length_penalty=length_penalty, fusion=ctx.lm,
        lm_cache=k_cache, lm_start=start, return_lm_cache=True)
    # rows are in hypothesis order: row i*K+0 = stream i's best
    best_cache = jax.tree_util.tree_map(lambda c: c[::k], lm_cache)
    ctx.append(hyp.tokens[:, 0], hyp.lengths[:, 0], best_cache)
    return hyp
