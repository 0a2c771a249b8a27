"""Shallow-fusion LM interface for decoding.

The reference planned but never implemented LM fusion (lms/README.md:3 —
LMs exist "for training/fine-tuning and evaluating perplexity"; no decode
code in the snapshot, SURVEY §5).  This is the net-new capability layer:
a GPT-2-class LM scores hypotheses incrementally alongside the ASR
decoder, combined as  log p_asr + weight * log p_lm.

The LM must share the ASR vocabulary (train the LM with the ASR tokenizer;
models/gpt2 is vocab-agnostic).  State is a fixed-shape KV cache pytree,
so the fused decode step stays one jit'd program.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.gpt2 import model as g


@dataclasses.dataclass
class FusionLM:
    """GPT-2 fusion scorer: weight * log_softmax(lm_logits)."""

    params: Dict
    cfg: g.GPT2Config
    weight: float = 0.3

    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32) -> Dict:
        return g.init_kv_cache(self.cfg, batch, max_len, dtype)

    def prime(self, context_ids: jnp.ndarray, cache: Dict,
              start: jnp.ndarray,
              attention_mask: jnp.ndarray = None) -> Tuple[Dict, jnp.ndarray]:
        """Feed conversation-context tokens [B, T] into the cache starting
        at offset ``start``; returns (cache, next_offset).
        ``attention_mask``: optional [B, cache_len] validity over cache
        positions (ragged histories — decode/context.py)."""
        _, cache = g.gpt2_forward(self.params, self.cfg, context_ids,
                                  attention_mask=attention_mask,
                                  kv_caches=cache, cache_index=start)
        return cache, start + context_ids.shape[1]

    def step(self, token_ids: jnp.ndarray, step: jnp.ndarray,
             cache: Dict,
             attention_mask: jnp.ndarray = None) -> Tuple[jnp.ndarray, Dict]:
        """One incremental step: [B, 1] tokens at position ``step`` ->
        (weighted log-probs [B, V], cache).
        ``attention_mask``: optional [B, cache_len] validity over cache
        positions; stale per-stream history tails (ragged batches) must be
        masked here — causality alone does NOT hide positions < step."""
        logits, cache = g.gpt2_logits(self.params, self.cfg, token_ids,
                                      attention_mask=attention_mask,
                                      kv_caches=cache, cache_index=step)
        logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
        return self.weight * logp, cache
