"""GPT-2 language model (the reference's LM-evaluation model family,
lms/src/eval_ppl_with_pretrained_lm.py:64 loads gpt2..gpt2-xl).

Functional JAX implementation with explicit fixed-shape KV caches.  The KV
cache is what turns the reference's O(T*L) stride-1 sliding-window PPL scan
(lms/src/utils.py:141-178) into an O(T) device-resident scoring pass — see
pipelines/eval_ppl.py for the numerics-equivalence contract.

Parameter layout mirrors HF GPT-2 module names; HF's Conv1D already stores
kernels [in, out] so import is rename-only (import_torch.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops import attention, layers
from ...ops.act_sharding import constrain_batch
from ...ops.remat import tag_big


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5
    activation: str = "gelu_new"
    embd_pdrop: float = 0.1
    attn_pdrop: float = 0.1
    resid_pdrop: float = 0.1

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head


def tiny_gpt2_config(**over) -> GPT2Config:
    base = dict(vocab_size=61, n_positions=32, n_embd=16, n_layer=2, n_head=2)
    base.update(over)
    return GPT2Config(**base)


# Preset configs matching the public GPT-2 family (the reference's --model choices).
PRESETS = {
    "gpt2": GPT2Config(),
    "gpt2-medium": GPT2Config(n_embd=1024, n_layer=24, n_head=16),
    "gpt2-large": GPT2Config(n_embd=1280, n_layer=36, n_head=20),
    "gpt2-xl": GPT2Config(n_embd=1600, n_layer=48, n_head=25),
}


def gpt2_init(rng, cfg: GPT2Config, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(rng, cfg.n_layer + 2)
    blocks = {}
    for i in range(cfg.n_layer):
        ka, kf = jax.random.split(ks[i])
        blocks[str(i)] = {
            "ln_1": layers.layer_norm_init(cfg.n_embd, dtype),
            "attn": {
                "c_attn": layers.dense_init(ka, cfg.n_embd, 3 * cfg.n_embd, dtype=dtype),
                "c_proj": layers.dense_init(jax.random.fold_in(ka, 1), cfg.n_embd, cfg.n_embd, dtype=dtype),
            },
            "ln_2": layers.layer_norm_init(cfg.n_embd, dtype),
            "mlp": {
                "c_fc": layers.dense_init(kf, cfg.n_embd, 4 * cfg.n_embd, dtype=dtype),
                "c_proj": layers.dense_init(jax.random.fold_in(kf, 1), 4 * cfg.n_embd, cfg.n_embd, dtype=dtype),
            },
        }
    return {
        "wte": {"weight": jax.random.normal(ks[-2], (cfg.vocab_size, cfg.n_embd), dtype) * 0.02},
        "wpe": {"weight": jax.random.normal(ks[-1], (cfg.n_positions, cfg.n_embd), dtype) * 0.01},
        "h": blocks,
        "ln_f": layers.layer_norm_init(cfg.n_embd, dtype),
    }


def init_kv_cache(cfg: GPT2Config, batch: int, max_len: int, dtype=jnp.float32) -> Dict:
    shape = (batch, cfg.n_head, max_len, cfg.head_dim)
    return {str(i): {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
            for i in range(cfg.n_layer)}


def _block(bp: Dict, cfg: GPT2Config, x: jnp.ndarray,
           bias: jnp.ndarray, kv_cache: Optional[Dict],
           cache_index: Optional[jnp.ndarray],
           rng, deterministic: bool,
           attn_impl: str = "dense",
           ring: Optional[tuple] = None,
           kv_valid_len: Optional[jnp.ndarray] = None,
           ) -> Tuple[jnp.ndarray, Optional[Dict]]:
    act = layers.ACTIVATIONS[cfg.activation]
    rngs = (None,) * 3 if rng is None else tuple(jax.random.split(rng, 3))

    h = layers.layer_norm(bp["ln_1"], x, eps=cfg.layer_norm_epsilon)
    qkv = layers.dense(bp["attn"]["c_attn"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    b, t, _ = q.shape
    q = q.reshape(b, t, cfg.n_head, cfg.head_dim)
    k = k.reshape(b, t, cfg.n_head, cfg.head_dim)
    v = v.reshape(b, t, cfg.n_head, cfg.head_dim)
    # the plain flash path consumes [B, T, H, D] IN PLACE (the reshape
    # above is a free view of the qkv projection output) — transposing to
    # [B, H, T, D] for the pallas_call costs a measured 5.4 ms of pure
    # relayout copies at B=128 scoring (docs/BENCH.md r4 decomposition)
    use_nhd = (attn_impl == "flash" and kv_cache is None
               and kv_valid_len is None)
    if not use_nhd:
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

    new_cache = None
    if kv_cache is not None:
        if getattr(cache_index, "ndim", 0) == 1:
            # per-stream write offsets (ragged conversation histories)
            upd = jax.vmap(lambda c, u, i: jax.lax.dynamic_update_slice(
                c, u, (0, i, 0)))
            k = upd(kv_cache["k"], k, cache_index)
            v = upd(kv_cache["v"], v, cache_index)
        else:
            k = jax.lax.dynamic_update_slice(kv_cache["k"], k,
                                             (0, 0, cache_index, 0))
            v = jax.lax.dynamic_update_slice(kv_cache["v"], v,
                                             (0, 0, cache_index, 0))
        new_cache = {"k": k, "v": v}

    if attn_impl in ("ring", "ulysses") and kv_cache is None:
        # sequence-parallel exact attention, O(T/n) activations per chip
        # (padding is inert under causality).  ring: K/V rotate around the
        # mesh ring; ulysses: head-scatter all-to-alls, full sequence per
        # head slice (parallel/ulysses.py).
        from ...parallel.sp import resolve_sp_impl

        sp_attn = resolve_sp_impl(attn_impl)
        mesh, axis_name = ring[:2]
        batch_axis = ring[2] if len(ring) > 2 else None
        attn = sp_attn(q, k, v, mesh=mesh, axis_name=axis_name,
                       causal=True, scale=cfg.head_dim ** -0.5,
                       kv_valid_len=kv_valid_len, batch_axis=batch_axis)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, cfg.n_embd)
    elif use_nhd:
        # O(T)-memory Pallas kernel reading/writing the [B, T, H, D]
        # layout directly — no relayout on either side of the call.
        # precision="default" = bf16 MXU operands + f32 accumulation,
        # the same contraction XLA's default matmul precision runs for
        # the dense chain's einsums on TPU (CPU stays f32)
        from ...ops.pallas import flash_attention_nhd

        attn = flash_attention_nhd(q, k, v, causal=True,
                                   scale=cfg.head_dim ** -0.5,
                                   precision="default")
        attn = attn.reshape(b, t, cfg.n_embd)
    elif attn_impl == "flash" and kv_cache is None:
        # O(T)-memory Pallas kernel; full-sequence causal scoring only
        # (padding is inert under causality, see pipelines/eval_ppl.py).
        from ...ops.pallas import flash_attention

        attn = flash_attention(q, k, v, causal=True,
                               scale=cfg.head_dim ** -0.5,
                               kv_valid_len=kv_valid_len)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, cfg.n_embd)
    else:
        # [B, H, T, T] / [B, T, ffn] values are recompute-on-backward
        # under remat="lite" (ops/remat.py)
        scores = tag_big(jnp.einsum(
            "bhqd,bhkd->bhqk", q, k,
            preferred_element_type=jnp.float32) / (cfg.head_dim ** 0.5))
        scores = tag_big(scores + bias.astype(scores.dtype))
        probs = tag_big(jax.nn.softmax(scores, axis=-1).astype(v.dtype))
        probs = layers.dropout(rngs[0], probs, cfg.attn_pdrop, deterministic)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=v.dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, cfg.n_embd)
    attn = layers.dense(bp["attn"]["c_proj"], attn)
    attn = layers.dropout(rngs[1], attn, cfg.resid_pdrop, deterministic)
    x = x + attn

    h = layers.layer_norm(bp["ln_2"], x, eps=cfg.layer_norm_epsilon)
    h = tag_big(layers.dense(bp["mlp"]["c_fc"], h))
    h = tag_big(act(h))
    h = layers.dense(bp["mlp"]["c_proj"], h)
    h = layers.dropout(rngs[2], h, cfg.resid_pdrop, deterministic)
    return x + h, new_cache


def gpt2_forward(
    params: Dict, cfg: GPT2Config, input_ids: jnp.ndarray,
    *,
    attention_mask: Optional[jnp.ndarray] = None,
    kv_caches: Optional[Dict] = None,
    cache_index: Optional[jnp.ndarray] = None,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    attn_impl: str = "dense",
    ring: Optional[tuple] = None,
    remat=False,
) -> Tuple[jnp.ndarray, Optional[Dict]]:
    """Token ids [B, T] -> (hidden [B, T, D], updated kv caches).

    ``remat`` ("none"/"full"/"dots"/"hybrid" or bool, ops/remat.py)
    rematerializes block intermediates on the backward pass — training
    only; ignored in incremental KV mode, where there is no backward.

    ``attn_impl='flash'`` routes full-sequence causal attention through the
    Pallas blockwise kernel (long-context scoring/training; ignored in
    incremental KV mode, where attention is already O(1) per step).
    ``attn_impl='ring'`` runs sequence-parallel ring attention over
    ``ring=(mesh, axis_name)`` — the window is sharded across devices and
    K/V blocks rotate on the ICI ring, so one scoring pass can exceed a
    single chip's memory (SURVEY §2.3; parallel/ring_attention.py).
    ``attn_impl='ulysses'`` is the head-scatter alternative (all-to-all to
    head-sharded full sequences; parallel/ulysses.py) — same contract,
    needs n_head % mesh-axis == 0.

    Incremental mode: pass ``kv_caches`` (fixed shape) and ``cache_index``
    (number of tokens already cached); positions and causal masking follow.
    ``cache_index`` may be a [B] int32 vector for per-stream offsets
    (ragged conversation carry-over, decode/context.py) — each stream's
    KV is then written at its own position and attends only its own
    contiguous history.
    """
    b, t = input_ids.shape
    if t > cfg.n_positions:
        # jnp.take would silently fill NaN position embeddings
        raise ValueError(
            f"sequence length {t} exceeds n_positions {cfg.n_positions}")
    past = 0 if cache_index is None else cache_index
    per_stream = getattr(past, "ndim", 0) == 1
    if per_stream:
        pos = jnp.arange(t)[None, :] + past[:, None]          # [B, T]
        pos_emb = jnp.take(params["wpe"]["weight"], pos, axis=0)
    else:
        pos = jnp.arange(t) + past
        pos_emb = jnp.take(params["wpe"]["weight"], pos, axis=0)[None]
    x = jnp.take(params["wte"]["weight"], input_ids, axis=0)
    x = x + pos_emb
    if dropout_rng is not None:
        dropout_rng, sub = jax.random.split(dropout_rng)
        x = layers.dropout(sub, x, cfg.embd_pdrop, deterministic)
    # boundary activation-sharding constraint (no-op outside a sharded
    # step's ops.act_sharding.activation_mesh context)
    x = constrain_batch(x)

    kv_valid_len = None
    if kv_caches is None:
        if attn_impl in ("flash", "ring", "ulysses"):
            if not deterministic and cfg.attn_pdrop > 0.0:
                # the kernels have no attention-prob dropout; running them
                # anyway would quietly change training numerics (the encoder
                # path falls back to dense instead — here the causal bias was
                # never built, so refuse loudly)
                raise ValueError(
                    f"attn_impl={attn_impl!r} drops attention-prob dropout "
                    f"(attn_pdrop={cfg.attn_pdrop}); train with "
                    f"attn_pdrop=0.0 or attn_impl='dense'")
            if attn_impl in ("ring", "ulysses") and (
                    not isinstance(ring, (tuple, list))
                    or len(ring) not in (2, 3)):
                raise ValueError(
                    f"attn_impl={attn_impl!r} needs ring=(mesh, axis_name"
                    f"[, batch_axis]), got {ring!r}")
            # causality lives in the kernel; no O(T^2) bias tensor.  A
            # padding mask rides as per-row valid-key counts (the kernels'
            # kv_valid_len), which assumes RIGHT padding — the only form
            # the data layer produces.
            bias = None
            if attention_mask is not None:
                kv_valid_len = jnp.sum(attention_mask.astype(jnp.int32),
                                       axis=-1)
        else:
            bias = attention.causal_attention_bias(t, t)
    else:
        k_len = kv_caches["0"]["k"].shape[2]
        kj = jnp.arange(k_len)
        if per_stream:
            qi = past[:, None, None] + jnp.arange(t)[None, :, None]  # [B,T,1]
            bias = jnp.where(kj[None, None, :] <= qi, 0.0,
                             attention.NEG_INF)[:, None]             # [B,1,T,K]
        else:
            qi = past + jnp.arange(t)[:, None]
            kj = kj[None, :]
            bias = jnp.where(kj <= qi, 0.0, attention.NEG_INF)[None, None]
    if attention_mask is not None and bias is not None:
        bias = bias + attention.padding_attention_bias(attention_mask)

    new_caches = {} if kv_caches is not None else None
    rngs = (jax.random.split(dropout_rng, cfg.n_layer)
            if dropout_rng is not None else [None] * cfg.n_layer)
    if kv_caches is None:
        from ...ops import remat as remat_lib

        # close over the non-pytree statics (cfg, flags); keep only array
        # (or None) arguments so jax.checkpoint can trace the block
        def block(bp, x, bias, rng):
            return _block(bp, cfg, x, bias, None, None, rng, deterministic,
                          attn_impl=attn_impl, ring=ring,
                          kv_valid_len=kv_valid_len)[0]

        block = remat_lib.apply(block, remat)
        for i in range(cfg.n_layer):
            x = block(params["h"][str(i)], x, bias, rngs[i])
    else:
        for i in range(cfg.n_layer):
            x, upd = _block(params["h"][str(i)], cfg, x, bias,
                            kv_caches[str(i)], cache_index, rngs[i],
                            deterministic, attn_impl=attn_impl, ring=ring,
                            kv_valid_len=kv_valid_len)
            new_caches[str(i)] = upd

    x = layers.layer_norm(params["ln_f"], x, eps=cfg.layer_norm_epsilon)
    x = constrain_batch(x)
    return x, new_caches


def gpt2_logits(params: Dict, cfg: GPT2Config, input_ids: jnp.ndarray,
                **kw) -> Tuple[jnp.ndarray, Optional[Dict]]:
    """Forward + tied lm head -> (logits [B, T, V], caches)."""
    hidden, caches = gpt2_forward(params, cfg, input_ids, **kw)
    logits = jnp.dot(hidden, params["wte"]["weight"].T,
                     preferred_element_type=hidden.dtype)
    return logits, caches


def token_nll_from_hidden(wte_weight: jnp.ndarray, hidden: jnp.ndarray,
                          targets: jnp.ndarray, *, chunk: int = 256,
                          checkpoint_chunks: bool = False) -> jnp.ndarray:
    """Per-token NLL straight from final hidden states — identical numbers
    to ``token_nll(logits, targets)`` (nll = logsumexp(h.W) - h.w_tgt)
    WITHOUT materializing the [B, T, V] logits tensor.

    At GPT-2 scale that tensor is 1.6 GB f32 per [8, 1024] batch and
    XLA's multi-pass log_softmax over it is pure HBM traffic; scanning
    the time axis in ``chunk``-sized slices keeps the transient at
    [B, chunk, V] with the logsumexp+gather fused per slice.

    ``checkpoint_chunks``: for TRAINING.  Without it the scan saves each
    chunk's [B, chunk, V] logits as a residual for the backward — the
    full logits tensor in nch pieces, no win.  With it the body is
    ``jax.checkpoint``ed, so the backward recomputes each chunk's logits
    from (hidden-chunk, W) and the softmax-minus-onehot cotangent flows
    to both without any O(T·V) residual ever living in HBM (the
    transposed scan accumulates dW across chunks).
    """
    b, t, h = hidden.shape
    hid, tgt = hidden[:, :-1], targets[:, 1:]
    n = t - 1
    chunk = max(1, min(chunk, n))   # short windows: one chunk, no waste
    pad = (-n) % chunk
    if pad:
        hid = jnp.pad(hid, ((0, 0), (0, pad), (0, 0)))
        tgt = jnp.pad(tgt, ((0, 0), (0, pad)))
    nch = (n + pad) // chunk
    hid = hid.reshape(b, nch, chunk, h).transpose(1, 0, 2, 3)
    tgt = tgt.reshape(b, nch, chunk).transpose(1, 0, 2)

    def body(carry, xs):
        hc, tc = xs
        logits = jnp.einsum("bch,vh->bcv", hc, wte_weight,
                            preferred_element_type=jnp.float32)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        tl = jnp.take_along_axis(logits, tc[..., None], axis=-1)[..., 0]
        return carry, lse - tl

    if checkpoint_chunks:
        body = jax.checkpoint(body)
    _, out = jax.lax.scan(body, 0, (hid, tgt))
    return out.transpose(1, 0, 2).reshape(b, nch * chunk)[:, :n]


def score_tokens(params: Dict, cfg: GPT2Config, input_ids: jnp.ndarray,
                 *, chunk: int = 256, **kw) -> jnp.ndarray:
    """Forward + per-token NLL [B, T-1] via the chunked lm head (the
    eval_ppl hot path; same numbers as token_nll(gpt2_logits(...)))."""
    hidden, _ = gpt2_forward(params, cfg, input_ids, **kw)
    return token_nll_from_hidden(params["wte"]["weight"], hidden, input_ids,
                                 chunk=chunk)


def token_nll(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Per-token NLL of ``targets`` under shifted ``logits``.

    Matches the reference's CrossEntropyLoss(reduction='none') over
    shifted logits/targets (eval_ppl_with_pretrained_lm.py:85-97):
    returns [B, T-1] NLLs for tokens 1..T-1.
    """
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = targets[:, 1:]
    return -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
