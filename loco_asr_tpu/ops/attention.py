"""Multi-head attention with optional relative-position bias and KV cache.

Numerics contract: HF SpeechT5Attention (transformers modeling_speecht5.py),
i.e. q is pre-scaled by head_dim**-0.5 before both the content term q@k^T and
the relative-bias term einsum(q, pe_k).  GPT-2 uses the same kernel without
position bias and with a causal mask.

TPU notes: the dense path below is a single fused chain of MXU matmuls that
XLA pipelines well at the sequence lengths this framework targets per-block
(<= a few thousand); for conversation-scale sequences use
ops.pallas.flash_attention (blockwise, O(T) memory) instead.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import layers
from .remat import tag_big

NEG_INF = -1e9  # large-negative additive mask (fp32/bf16 safe)


def mha_init(rng, embed_dim: int, *, bias: bool = True, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(rng, 4)
    return {
        "q_proj": layers.dense_init(ks[0], embed_dim, embed_dim, bias=bias, dtype=dtype),
        "k_proj": layers.dense_init(ks[1], embed_dim, embed_dim, bias=bias, dtype=dtype),
        "v_proj": layers.dense_init(ks[2], embed_dim, embed_dim, bias=bias, dtype=dtype),
        "out_proj": layers.dense_init(ks[3], embed_dim, embed_dim, bias=bias, dtype=dtype),
    }


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


def multi_head_attention(
    params: Dict,
    hidden_states: jnp.ndarray,
    *,
    num_heads: int,
    key_value_states: Optional[jnp.ndarray] = None,
    attention_bias: Optional[jnp.ndarray] = None,
    position_bias: Optional[jnp.ndarray] = None,
    rel_pe: Optional[jnp.ndarray] = None,
    rel_max: Optional[int] = None,
    kv_valid_len: Optional[jnp.ndarray] = None,
    kv_cache: Optional[Dict[str, jnp.ndarray]] = None,
    cache_index: Optional[jnp.ndarray] = None,
    static_kv: Optional[Dict[str, jnp.ndarray]] = None,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    attn_impl: str = "dense",
    ring: Optional[tuple] = None,
    causal: bool = False,
) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    """Scaled dot-product MHA.

    ``causal`` marks the attention as causal for the FLASH path (the
    kernel applies the triangle itself — no O(T^2) bias tensor); the
    dense path keeps expressing causality through ``attention_bias``.

    Args:
      hidden_states: [B, Tq, D] queries source.
      key_value_states: [B, Tk, D] for cross-attention (None => self-attn).
      attention_bias: additive mask broadcastable to [B, H, Tq, Tk].
      position_bias: [Tq, Tk, head_dim] relative-position keys (SpeechT5) —
        the literal HF formulation; prefer ``rel_pe`` (same numbers, no
        O(T^2 * head_dim) tensor).
      rel_pe: [2*rel_max, head_dim] relative-position key TABLE.  The rel
        term factorizes as qpe = q.pe^T ([Tq, 2L] matmul) followed by a
        Toeplitz band gather — identical math to ``position_bias``.
      kv_valid_len: [B] int32 valid key count (right-padded batches); used
        by the flash path in place of ``attention_bias``.
      kv_cache: {"k": [B,H,Tmax,hd], "v": ...} decode cache to update in place
        at ``cache_index`` (self-attention incremental decoding).
      attn_impl: "dense" (materialized [Tq, Tk] scores), "flash"
        (ops.pallas blockwise kernel, O(T) memory — self-attention only),
        or "ring" (sequence-parallel over ``ring=(mesh, axis_name)``:
        K/V rotate around the device ring, O(T/n) memory per chip;
        self-attention only, supports rel_pe + kv_valid_len).

    Returns (output [B, Tq, D], updated kv_cache or None).
    """
    d = hidden_states.shape[-1]
    head_dim = d // num_heads
    scale = head_dim ** -0.5

    q = layers.dense(params["q_proj"], hidden_states) * scale
    q = _split_heads(q, num_heads)  # [B,H,Tq,hd]
    if static_kv is not None:
        # precomputed cross-attention keys/values ([B, H, Tk, hd], see
        # models/speecht5/decoder.init_cross_cache) — recomputing the K/V
        # projections of a long encoder sequence EVERY decode step costs
        # more than the whole rest of the step
        k, v = static_kv["k"], static_kv["v"]
    else:
        kv_src = hidden_states if key_value_states is None else key_value_states
        k = _split_heads(layers.dense(params["k_proj"], kv_src), num_heads)
        v = _split_heads(layers.dense(params["v_proj"], kv_src), num_heads)

    new_cache = None
    if kv_cache is not None:
        if cache_index is None:
            raise ValueError("cache_index required with kv_cache")
        if jnp.ndim(cache_index) == 1:
            # per-stream write offsets (continuous batching: each slot is at
            # its own decode step).  One-hot select along the cache length —
            # a full cache read/write, but KV per step is tiny and TPU
            # scatter would be no cheaper.  Requires Tq == 1.
            if q.shape[2] != 1:
                raise ValueError(
                    f"vector cache_index requires Tq == 1 (one token per "
                    f"stream per step), got Tq={q.shape[2]} — the one-hot "
                    f"write would silently mis-broadcast")
            sel = (jnp.arange(kv_cache["k"].shape[2])[None, :]
                   == cache_index[:, None])[:, None, :, None]
            k = jnp.where(sel, k, kv_cache["k"])
            v = jnp.where(sel, v, kv_cache["v"])
        else:
            k = jax.lax.dynamic_update_slice(kv_cache["k"], k,
                                             (0, 0, cache_index, 0))
            v = jax.lax.dynamic_update_slice(kv_cache["v"], v,
                                             (0, 0, cache_index, 0))
        new_cache = {"k": k, "v": v}

    use_sp = (attn_impl in ("ring", "ulysses") and kv_cache is None
              and key_value_states is None
              and (deterministic or dropout_rate == 0.0))
    if use_sp:
        from ..parallel.sp import resolve_sp_impl

        sp_attn = resolve_sp_impl(attn_impl)
        if (not isinstance(ring, (tuple, list)) or len(ring) not in (2, 3)):
            raise ValueError(
                f"attn_impl={attn_impl!r} needs ring=(mesh, axis_name"
                f"[, batch_axis]), got {ring!r}")
        mesh, axis_name = ring[:2]
        batch_axis = ring[2] if len(ring) > 2 else None
        out = sp_attn(q, k, v, mesh=mesh, axis_name=axis_name,
                      causal=False, scale=1.0,  # q is pre-scaled
                      rel_pe=rel_pe, rel_max=rel_max,
                      kv_valid_len=kv_valid_len, batch_axis=batch_axis)
        out = _merge_heads(out)
        out = layers.dense(params["out_proj"], out)
        return out, new_cache

    use_flash = (attn_impl == "flash" and kv_cache is None
                 and static_kv is None
                 and (deterministic or dropout_rate == 0.0))
    if use_flash:  # attention-prob dropout requires the dense path
        # q is already pre-scaled (HF contract: scale applies to both the
        # content and rel terms), so the kernel runs with scale=1.
        # Covers self-attention (encoder: rel_pe + kv_valid_len; decoder:
        # causal=True) AND cross-attention (key_value_states set, decoder
        # -> encoder, kv_valid_len = encoder lengths) — the decoder's
        # dense [B, H, L, T] cross scores are what OOM conversation-window
        # training (164 s windows: 750 MB f32 per layer).
        from .pallas import flash_attention

        out = flash_attention(q, k, v, causal=causal, scale=1.0,
                              rel_pe=rel_pe, kv_valid_len=kv_valid_len)
        out = _merge_heads(out)
        out = layers.dense(params["out_proj"], out)
        return out, new_cache

    # every [B, H, Tq, Tk] value below is tagged recompute-on-backward for
    # the "lite" remat policy (ops/remat.py): their saves dominate train
    # HBM traffic; their recompute is two einsums + VPU passes
    scores = tag_big(jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32))

    if rel_pe is not None:
        # rel bias from the [2L, head_dim] table: gather the (small) table
        # into [Tq, Tk, head_dim] Toeplitz keys, then one MXU einsum.
        # (A take_along_axis over a [B,H,Tq,Tk] index is NOT equivalent in
        # cost: per-element gathers run ~100x slower than this matmul on
        # TPU — measured 2.1 s vs 13 ms for the batch-16 encoder step.)
        L = rel_max if rel_max is not None else rel_pe.shape[0] // 2
        tq, tk = q.shape[2], k.shape[2]
        idx = jnp.clip(jnp.arange(tq)[:, None] - jnp.arange(tk)[None, :],
                       -L, L - 1) + L
        pos_keys = jnp.take(rel_pe.astype(q.dtype), idx, axis=0)  # [Tq,Tk,d]
        rel = tag_big(jnp.einsum("bhid,ijd->bhij", q, pos_keys,
                                 preferred_element_type=jnp.float32))
        scores = tag_big(scores + rel)
    elif position_bias is not None:
        # rel bias: scores[b,h,i,j] += q[b,h,i,:] . pe_k[i,j,:]
        rel = tag_big(jnp.einsum("bhid,ijd->bhij", q,
                                 position_bias.astype(q.dtype),
                                 preferred_element_type=jnp.float32))
        scores = tag_big(scores + rel)

    if attention_bias is not None:
        scores = tag_big(scores + attention_bias.astype(scores.dtype))
    elif kv_valid_len is not None:
        # flash/ring callers pass lengths instead of a bias; keep padding
        # correct when this dense path is the (e.g. dropout) fallback
        pad = jnp.arange(k.shape[2])[None, :] < kv_valid_len[:, None]
        scores = tag_big(jnp.where(pad[:, None, None, :], scores, NEG_INF))

    probs = tag_big(jax.nn.softmax(scores, axis=-1).astype(v.dtype))
    probs = layers.dropout(dropout_rng, probs, dropout_rate, deterministic)

    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=v.dtype)
    out = _merge_heads(out)
    out = layers.dense(params["out_proj"], out)
    return out, new_cache


def padding_attention_bias(valid_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, Tk] 1/0 validity -> additive [B, 1, 1, Tk] bias."""
    return jnp.where(valid_mask[:, None, None, :].astype(bool), 0.0, NEG_INF).astype(dtype)


def causal_attention_bias(q_len: int, k_len: int, dtype=jnp.float32,
                          offset: int = 0) -> jnp.ndarray:
    """Additive [1, 1, Tq, Tk] causal mask; ``offset`` shifts the query
    positions forward (incremental decoding with a KV cache)."""
    qi = jnp.arange(q_len)[:, None] + offset
    kj = jnp.arange(k_len)[None, :]
    return jnp.where(kj <= qi, 0.0, NEG_INF).astype(dtype)[None, None]


def relative_position_bias_table(pe_weight: jnp.ndarray, seq_len: int,
                                 max_length: int) -> jnp.ndarray:
    """Gather [T, T, head_dim] relative-position keys from a (2*max_length,
    head_dim) embedding table (HF SpeechT5RelativePositionalEncoding parity:
    distances clipped to [-max_length, max_length-1] then offset)."""
    pos = jnp.arange(seq_len)
    rel = pos[:, None] - pos[None, :]
    rel = jnp.clip(rel, -max_length, max_length - 1) + max_length
    return jnp.take(pe_weight, rel, axis=0)
