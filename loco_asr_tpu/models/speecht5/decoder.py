"""SpeechT5 transformer decoder (causal self-attn + cross-attn layers).

Numerics contract: HF SpeechT5Decoder / SpeechT5DecoderLayer (post-LN,
no top-level LayerNorm, no relative position bias).  Decoding state is an
explicit pytree (fixed-shape KV caches updated via dynamic_update_slice)
so the full incremental decode step stays inside one jit'd program —
device-resident decoding with no per-step host round-trip (the reference
round-trips each batch, extract_*.py:89/:109).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops import attention, layers
from .config import SpeechT5Config


def decoder_layer_init(rng, cfg: SpeechT5Config, dtype=jnp.float32) -> Dict:
    k_self, k_cross, k_ff1, k_ff2 = jax.random.split(rng, 4)
    return {
        "self_attn": attention.mha_init(k_self, cfg.hidden_size, dtype=dtype),
        "self_attn_layer_norm": layers.layer_norm_init(cfg.hidden_size, dtype),
        "encoder_attn": attention.mha_init(k_cross, cfg.hidden_size, dtype=dtype),
        "encoder_attn_layer_norm": layers.layer_norm_init(cfg.hidden_size, dtype),
        "feed_forward": {
            "intermediate_dense": layers.dense_init(k_ff1, cfg.hidden_size, cfg.decoder_ffn_dim, dtype=dtype),
            "output_dense": layers.dense_init(k_ff2, cfg.decoder_ffn_dim, cfg.hidden_size, dtype=dtype),
        },
        "final_layer_norm": layers.layer_norm_init(cfg.hidden_size, dtype),
    }


def decoder_init(rng, cfg: SpeechT5Config, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(rng, cfg.decoder_layers)
    return {"layers": {str(i): decoder_layer_init(ks[i], cfg, dtype)
                       for i in range(cfg.decoder_layers)}}


def init_decode_cache(cfg: SpeechT5Config, batch: int, max_len: int,
                      dtype=jnp.float32) -> Dict:
    """Fixed-shape self-attention KV cache pytree for incremental decoding."""
    hd = cfg.hidden_size // cfg.decoder_attention_heads
    shape = (batch, cfg.decoder_attention_heads, max_len, hd)
    return {
        str(i): {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
        for i in range(cfg.decoder_layers)
    }


def init_cross_cache(params: Dict, cfg: SpeechT5Config,
                     encoder_hidden: jnp.ndarray) -> Dict:
    """Precompute every layer's cross-attention K/V from the encoder output
    ([B, H, Tenc, hd] per layer).  Recomputing these projections each
    decode step costs ~2 * Tenc * H^2 * 2 FLOPs per layer per step — at
    conversation-length Tenc that dwarfs the step itself (measured RTFx 5
    -> 260 on 3-min audio)."""
    heads = cfg.decoder_attention_heads
    hd = cfg.hidden_size // heads

    def split(x):
        b, t, d = x.shape
        return x.reshape(b, t, heads, hd).transpose(0, 2, 1, 3)

    out = {}
    for i in range(cfg.decoder_layers):
        lp = params["layers"][str(i)]["encoder_attn"]
        out[str(i)] = {
            "k": split(layers.dense(lp["k_proj"], encoder_hidden)),
            "v": split(layers.dense(lp["v_proj"], encoder_hidden)),
        }
    return out


def _decoder_layer(
    lp: Dict, cfg: SpeechT5Config, hidden: jnp.ndarray,
    encoder_hidden: jnp.ndarray,
    self_bias: Optional[jnp.ndarray],
    cross_bias: Optional[jnp.ndarray],
    kv_cache: Optional[Dict], cache_index: Optional[jnp.ndarray],
    dropout_rng, deterministic: bool,
    cross_kv: Optional[Dict] = None,
    attn_impl: str = "dense",
    enc_valid_len: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[Dict]]:
    act = layers.ACTIVATIONS[cfg.hidden_act]
    rngs = (None,) * 6 if dropout_rng is None else tuple(jax.random.split(dropout_rng, 6))

    residual = hidden
    # flash self-attention is causal-in-kernel (no O(L^2) bias; label
    # right-padding is inert under causality, garbage pad rows fall to
    # the loss mask) — the conversation-window training configuration
    attn_out, new_cache = attention.multi_head_attention(
        lp["self_attn"], hidden, num_heads=cfg.decoder_attention_heads,
        attention_bias=self_bias, kv_cache=kv_cache, cache_index=cache_index,
        dropout_rng=rngs[0], dropout_rate=cfg.attention_dropout,
        deterministic=deterministic, attn_impl=attn_impl, causal=True)
    attn_out = layers.dropout(rngs[1], attn_out, cfg.hidden_dropout, deterministic)
    hidden = layers.layer_norm(lp["self_attn_layer_norm"], residual + attn_out,
                               eps=cfg.layer_norm_eps)

    residual = hidden
    cross_out, _ = attention.multi_head_attention(
        lp["encoder_attn"], hidden, num_heads=cfg.decoder_attention_heads,
        key_value_states=encoder_hidden, attention_bias=cross_bias,
        static_kv=cross_kv,
        kv_valid_len=enc_valid_len,
        dropout_rng=rngs[2], dropout_rate=cfg.attention_dropout,
        deterministic=deterministic, attn_impl=attn_impl)
    cross_out = layers.dropout(rngs[3], cross_out, cfg.hidden_dropout, deterministic)
    hidden = layers.layer_norm(lp["encoder_attn_layer_norm"], residual + cross_out,
                               eps=cfg.layer_norm_eps)

    ff = layers.dense(lp["feed_forward"]["intermediate_dense"], hidden)
    ff = act(ff)
    ff = layers.dropout(rngs[4], ff, cfg.activation_dropout, deterministic)
    ff = layers.dense(lp["feed_forward"]["output_dense"], ff)
    ff = layers.dropout(rngs[5], ff, cfg.hidden_dropout, deterministic)
    hidden = layers.layer_norm(lp["final_layer_norm"], hidden + ff,
                               eps=cfg.layer_norm_eps)
    return hidden, new_cache


def decoder(
    params: Dict,
    cfg: SpeechT5Config,
    hidden_states: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,
    *,
    attention_mask: Optional[jnp.ndarray] = None,
    encoder_attention_mask: Optional[jnp.ndarray] = None,
    kv_caches: Optional[Dict] = None,
    cache_index: Optional[jnp.ndarray] = None,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    cross_caches: Optional[Dict] = None,
    attn_impl: str = "dense",
) -> Tuple[jnp.ndarray, Optional[Dict]]:
    """Run the decoder stack.

    Full-sequence mode (kv_caches=None): causal masking over [B, T, H].
    Incremental mode: ``hidden_states`` is the current step(s), ``kv_caches``
    holds fixed-shape per-layer KV, ``cache_index`` the write offset.
    Returns (hidden, updated kv_caches or None).

    ``attn_impl="flash"`` (full-sequence mode only) routes BOTH decoder
    attentions through the Pallas kernels: causal-in-kernel self-attention
    and length-masked cross-attention — no [B, H, L, L] / [B, H, L, T]
    score tensors, which is what makes conversation-window training
    (long label sequences x 8k encoder frames) fit in HBM.

    API CONSTRAINT under flash: a caller-supplied decoder
    ``attention_mask`` must describe RIGHT-padding only.  The kernel
    handles causality internally and builds no self-attention bias, so
    right-padded rows are inert (their garbage outputs fall to the loss
    mask) but any other mask semantics — packed sequences, left padding,
    holes — would be silently dropped.  Every in-repo label pipeline is
    right-padded (data/asr_dataset.py); a packed/left-padded caller must
    use ``attn_impl="dense"``.
    """
    b, t, _ = hidden_states.shape

    use_flash = attn_impl == "flash" and kv_caches is None
    if use_flash and not deterministic and cfg.attention_dropout > 0.0:
        # flash has no attention-prob dropout; a silent dense fallback
        # here would drop causality (self_bias is not built) — refuse
        # loudly, mirroring models/gpt2.  make_asr_train_step zeroes
        # attention_dropout for non-dense impls before reaching this.
        raise ValueError(
            f"decoder attn_impl='flash' drops attention-prob dropout "
            f"(attention_dropout={cfg.attention_dropout}); train with "
            f"attention_dropout=0.0 or attn_impl='dense'")

    enc_valid_len = None
    if kv_caches is None:
        if use_flash:
            # causality lives in the kernel; right-padded label rows are
            # inert under causality and masked by the loss
            self_bias = None
        else:
            self_bias = attention.causal_attention_bias(t, t)
            if attention_mask is not None:
                self_bias = self_bias + attention.padding_attention_bias(
                    attention_mask)
    else:
        k_len = kv_caches["0"]["k"].shape[2]
        pos = jnp.arange(k_len)
        if jnp.ndim(cache_index) == 1:
            # per-stream decode offsets (continuous batching)
            qi = cache_index[:, None, None] + jnp.arange(t)[None, :, None]
            self_bias = jnp.where(pos[None, None, :] <= qi, 0.0,
                                  attention.NEG_INF)[:, None]  # [B,1,t,K]
            self_bias = self_bias.astype(jnp.float32)
        else:
            # valid keys: written positions (< cache_index + t), causal wrt step
            qi = cache_index + jnp.arange(t)[:, None]
            self_bias = jnp.where(pos[None, None, :] <= qi[None, :, :], 0.0,
                                  attention.NEG_INF).astype(jnp.float32)
            self_bias = self_bias.reshape(1, 1, t, k_len)

    cross_bias = None
    if encoder_attention_mask is not None:
        if use_flash:
            enc_valid_len = jnp.sum(
                encoder_attention_mask.astype(jnp.int32), axis=-1)
        else:
            cross_bias = attention.padding_attention_bias(
                encoder_attention_mask)

    hidden = hidden_states
    new_caches = {} if kv_caches is not None else None
    n = cfg.decoder_layers
    rngs = jax.random.split(dropout_rng, n) if dropout_rng is not None else [None] * n
    for i in range(n):
        lp = params["layers"][str(i)]
        cache_i = kv_caches[str(i)] if kv_caches is not None else None
        hidden, upd = _decoder_layer(
            lp, cfg, hidden, encoder_hidden_states, self_bias, cross_bias,
            cache_i, cache_index, rngs[i], deterministic,
            cross_kv=(cross_caches[str(i)] if cross_caches is not None
                      else None),
            attn_impl=(attn_impl if use_flash else "dense"),
            enc_valid_len=enc_valid_len)
        if new_caches is not None:
            new_caches[str(i)] = upd
    return hidden, new_caches
