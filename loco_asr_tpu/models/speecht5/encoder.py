"""SpeechT5 transformer encoder (12-layer, relative-position-biased MHA).

Numerics contract: HF SpeechT5Encoder forward — top-level LayerNorm first,
then a shared relative position bias table feeds every layer; each layer is
post-LN (residual -> LN -> FFN -> LN).

TPU-first structure: the layer stack runs under ``jax.lax.scan`` over stacked
per-layer parameters, producing a single compiled layer body regardless of
depth (fast compiles, XLA-friendly) while keeping the per-layer pytree
importable by name (params are stored per-layer and stacked on the fly).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ...ops import attention, layers
from ...ops import remat as remat_lib
from .config import SpeechT5Config


def encoder_layer_init(rng, cfg: SpeechT5Config, dtype=jnp.float32) -> Dict:
    k_attn, k_ff1, k_ff2 = jax.random.split(rng, 3)
    return {
        "attention": attention.mha_init(k_attn, cfg.hidden_size, dtype=dtype),
        "layer_norm": layers.layer_norm_init(cfg.hidden_size, dtype),
        "feed_forward": {
            "intermediate_dense": layers.dense_init(k_ff1, cfg.hidden_size, cfg.encoder_ffn_dim, dtype=dtype),
            "output_dense": layers.dense_init(k_ff2, cfg.encoder_ffn_dim, cfg.hidden_size, dtype=dtype),
        },
        "final_layer_norm": layers.layer_norm_init(cfg.hidden_size, dtype),
    }


def encoder_init(rng, cfg: SpeechT5Config, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(rng, cfg.encoder_layers + 1)
    return {
        "layer_norm": layers.layer_norm_init(cfg.hidden_size, dtype),
        "embed_positions": {
            "pe_k": layers.embedding_init(ks[0], 2 * cfg.encoder_max_relative_position,
                                          cfg.head_dim, dtype=dtype),
        },
        "layers": {str(i): encoder_layer_init(ks[i + 1], cfg, dtype)
                   for i in range(cfg.encoder_layers)},
    }


def _layer_body(cfg: SpeechT5Config, hidden, layer_params, *, attention_bias,
                rel_pe, kv_valid_len, dropout_rng, deterministic,
                attn_impl="dense", ring=None, position_bias=None):
    act = layers.ACTIVATIONS[cfg.hidden_act]
    rngs = (None, None, None, None) if dropout_rng is None else jax.random.split(dropout_rng, 4)

    attn_out, _ = attention.multi_head_attention(
        layer_params["attention"], hidden,
        num_heads=cfg.encoder_attention_heads,
        attention_bias=attention_bias,
        rel_pe=rel_pe, rel_max=cfg.encoder_max_relative_position,
        position_bias=position_bias,
        kv_valid_len=kv_valid_len,
        dropout_rng=rngs[0], dropout_rate=cfg.attention_dropout,
        deterministic=deterministic,
        attn_impl=attn_impl, ring=ring,
    )
    attn_out = layers.dropout(rngs[1], attn_out, cfg.hidden_dropout, deterministic)
    hidden = hidden + attn_out
    hidden = layers.layer_norm(layer_params["layer_norm"], hidden, eps=cfg.layer_norm_eps)

    # [B, T, ffn]-sized values are recompute-on-backward under remat="lite"
    ff = remat_lib.tag_big(
        layers.dense(layer_params["feed_forward"]["intermediate_dense"],
                     hidden))
    ff = remat_lib.tag_big(act(ff))
    ff = layers.dropout(rngs[2], ff, cfg.activation_dropout, deterministic)
    ff = layers.dense(layer_params["feed_forward"]["output_dense"], ff)
    ff = layers.dropout(rngs[3], ff, cfg.hidden_dropout, deterministic)
    hidden = hidden + ff
    hidden = layers.layer_norm(layer_params["final_layer_norm"], hidden, eps=cfg.layer_norm_eps)
    return hidden


def stack_layers(layer_dict: Dict[str, Dict]) -> Dict:
    """{'0': tree, '1': tree, ...} -> tree with a leading layer axis."""
    n = len(layer_dict)
    trees = [layer_dict[str(i)] for i in range(n)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def encoder(
    params: Dict,
    cfg: SpeechT5Config,
    hidden_states: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    *,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    remat: remat_lib.RematSpec = False,
    attn_impl: str = "dense",
    ring: Optional[tuple] = None,
    unroll=False,
) -> jnp.ndarray:
    """[B, T, H] prenet features -> [B, T, H] encodings.

    ``attention_mask`` is a [B, T] 1/0 validity mask at feature resolution.
    ``remat`` rematerializes layer intermediates on the backward pass:
    True/"full" saves only layer inputs (min memory, recomputes
    everything), "dots"/"hybrid" save MXU dot outputs (+ dropout masks)
    and recompute the fat f32 elementwise chains — the HBM-bandwidth
    policies (ops/remat.py; exact numerics either way).
    ``attn_impl`` "dense" materializes [T, T] scores; "flash" routes every
    layer through the banded rel-pos Pallas kernel (O(T) memory —
    conversation-length encoding); "ring" shards the sequence over
    ``ring=(mesh, axis_name)`` and rotates K/V on the ICI ring (O(T/n)
    memory per chip — conversation-length encoding across chips, with the
    same rel-pos + padding semantics); "ulysses" is the head-scatter
    all-to-all alternative (parallel/ulysses.py, needs heads %% devices
    == 0).  Requires a right-padded (contiguous prefix) attention_mask in
    flash/ring/ulysses modes.
    """
    hidden = layers.layer_norm(params["layer_norm"], hidden_states, eps=cfg.layer_norm_eps)
    if dropout_rng is not None:
        dropout_rng, sub = jax.random.split(dropout_rng)
        hidden = layers.dropout(sub, hidden, cfg.hidden_dropout, deterministic)

    rel_pe = params["embed_positions"]["pe_k"]["weight"]
    position_bias = None
    if attn_impl == "dense":
        # dense path: gather the shared [T, T, head_dim] Toeplitz keys ONCE
        # outside the layer scan (all layers share the table; re-gathering
        # per layer costs ~1 ms/step at T=249)
        position_bias = attention.relative_position_bias_table(
            rel_pe, hidden.shape[1], cfg.encoder_max_relative_position)
        rel_pe = None

    attn_bias = None
    kv_valid_len = None
    if attention_mask is not None:
        kv_valid_len = jnp.sum(attention_mask.astype(jnp.int32), axis=-1)
        if attn_impl == "dense":
            attn_bias = attention.padding_attention_bias(attention_mask)
    elif attn_impl in ("flash", "ring", "ulysses"):
        kv_valid_len = jnp.full((hidden.shape[0],), hidden.shape[1], jnp.int32)

    stacked = stack_layers(params["layers"])
    n_layers = cfg.encoder_layers
    if dropout_rng is not None:
        layer_rngs = jax.random.split(dropout_rng, n_layers)
    else:
        layer_rngs = None

    body = partial(_layer_body, cfg, attention_bias=attn_bias,
                   rel_pe=rel_pe, position_bias=position_bias,
                   kv_valid_len=kv_valid_len,
                   deterministic=deterministic, attn_impl=attn_impl,
                   ring=ring)

    def scan_fn(h, xs):
        lp, rng = xs if layer_rngs is not None else (xs, None)
        return body(h, lp, dropout_rng=rng), None

    scan_fn = remat_lib.apply(scan_fn, remat)

    xs = (stacked, layer_rngs) if layer_rngs is not None else stacked
    # ``unroll``: True (or an int) unrolls the layer scan into
    # straight-line XLA — inter-layer fusion and no stacked-buffer
    # dynamic-update-slices.  Measured on the B=16 x 5 s train step:
    # 65.4 -> 58.0 ms (-11%); the cost is compile time (mitigated by the
    # persistent compilation cache).  False keeps the compact while-loop.
    hidden, _ = jax.lax.scan(scan_fn, hidden, xs, unroll=unroll or 1)
    return hidden
