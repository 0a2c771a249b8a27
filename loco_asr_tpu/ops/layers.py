"""Functional NN layers over plain-dict parameter pytrees.

Design notes (TPU-first):
  * All layers are pure functions ``(params, x, ...) -> y`` so they compose
    under jit/pjit/vmap/scan with no hidden state.
  * Weight layouts are chosen for MXU-friendly ``x @ W`` contractions:
    Dense kernels are stored ``[in, out]`` (torch Linear stores ``[out, in]``;
    the torch importers transpose at load time, see models/*/import_torch.py).
  * Convolutions use ``lax.conv_general_dilated`` with NCH layout to keep
    numerical parity with the reference models' torch Conv1d semantics.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf-based) GELU; matches torch nn.functional.gelu default.

    The erf value (which autodiff saves for the backward) is tagged
    recompute-on-backward for the "lite" remat policy (ops/remat.py)."""
    e = _checkpoint_name(jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)),
                         "big")
    return 0.5 * x * (1.0 + e)


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """Tanh-approx GELU; matches HF "gelu_new" used by GPT-2."""
    c = math.sqrt(2.0 / math.pi)
    t = _checkpoint_name(
        jnp.tanh(c * (x + 0.044715 * jnp.power(x, 3.0))), "big")
    return 0.5 * x * (1.0 + t)


ACTIVATIONS = {
    "gelu": gelu,
    "gelu_new": gelu_new,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
}


# ---------------------------------------------------------------------------
# Dense / embedding
# ---------------------------------------------------------------------------

def dense_init(rng, in_dim: int, out_dim: int, *, bias: bool = True, dtype=jnp.float32):
    kr, _ = jax.random.split(rng)
    scale = 1.0 / math.sqrt(in_dim)
    p = {"kernel": jax.random.uniform(kr, (in_dim, out_dim), dtype, -scale, scale)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def dense(params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(x, params["kernel"], preferred_element_type=x.dtype)
    if "bias" in params:
        y = y + params["bias"]
    return y


def embedding_init(rng, vocab: int, dim: int, *, dtype=jnp.float32, padding_idx: Optional[int] = None):
    w = jax.random.normal(rng, (vocab, dim), dtype)
    if padding_idx is not None:
        w = w.at[padding_idx].set(0.0)
    return {"weight": w}


def embedding(params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["weight"], ids, axis=0)


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------

def layer_norm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params, x: jnp.ndarray, *, eps: float = 1e-5) -> jnp.ndarray:
    # Reduce in float32 for stability regardless of compute dtype.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.astype(x.dtype)
    return y * params["scale"] + params["bias"]


def group_norm_init(channels: int, dtype=jnp.float32):
    return {"scale": jnp.ones((channels,), dtype), "bias": jnp.zeros((channels,), dtype)}


def group_norm(params, x: jnp.ndarray, *, num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over [B, C, T] (torch nn.GroupNorm semantics)."""
    b, c, t = x.shape
    xf = x.astype(jnp.float32).reshape(b, num_groups, c // num_groups, t)
    mean = jnp.mean(xf, axis=(2, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(2, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, c, t).astype(x.dtype)
    return y * params["scale"][None, :, None] + params["bias"][None, :, None]


# ---------------------------------------------------------------------------
# Convolutions (NCH layout, torch Conv1d parity)
# ---------------------------------------------------------------------------

def conv1d_init(rng, in_ch: int, out_ch: int, kernel: int, *, groups: int = 1,
                bias: bool = True, dtype=jnp.float32):
    scale = 1.0 / math.sqrt(in_ch // groups * kernel)
    p = {"weight": jax.random.uniform(rng, (out_ch, in_ch // groups, kernel), dtype, -scale, scale)}
    if bias:
        p["bias"] = jnp.zeros((out_ch,), dtype)
    return p


def conv1d(params, x: jnp.ndarray, *, stride: int = 1, padding: int = 0,
           groups: int = 1, weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """1-D convolution on [B, C, T] with OIH weights (torch layout)."""
    w = params["weight"] if weight is None else weight
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if "bias" in params:
        y = y + params["bias"][None, :, None].astype(y.dtype)
    return y


def conv1d_nhc(x: jnp.ndarray, w_oih: jnp.ndarray, *, stride: int = 1,
               padding: int = 0, groups: int = 1,
               bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """1-D convolution on time-major [B, T, C] input with torch OIH weights.

    Numerically identical to :func:`conv1d` on the transposed operands
    (same contraction order), but keeps channels in the minor (lane)
    dimension end-to-end, which is the native TPU layout: on the
    batch-16x5s encoder prenet this removes an 813 us relayout copy
    between conv layers and runs the grouped positional conv ~1.8x
    faster (traced; docs/BENCH.md round-3 profiling section).
    """
    if jax.default_backend() != "tpu":
        # XLA:CPU's channels-last 1-D conv lowering compiles pathologically
        # slowly (the tiny-config train step went 38 s -> many MINUTES of
        # compile at T=16k samples, bisected to exactly this layout change);
        # route through the channel-major kernel + transposes there — the
        # numbers are identical and XLA fuses/cancels the transposes.
        y = jax.lax.conv_general_dilated(
            jnp.transpose(x, (0, 2, 1)), w_oih.astype(x.dtype),
            window_strides=(stride,), padding=[(padding, padding)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=groups)
        y = jnp.transpose(y, (0, 2, 1))
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y
    wh = jnp.transpose(w_oih, (2, 1, 0)).astype(x.dtype)   # OIH -> HIO
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x, wh, window_strides=(stride,), padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def weight_norm_conv1d_init(rng, in_ch: int, out_ch: int, kernel: int, *,
                            groups: int = 1, dtype=jnp.float32):
    """Weight-normalized conv (dim=2 over the kernel axis, torch parity).

    Matches ``nn.utils.weight_norm(conv, dim=2)`` as used by the SpeechT5
    positional conv embedding: ``g`` has shape (1, 1, K); the norm of ``v``
    is taken over (out_ch, in_ch/groups) independently per kernel position.
    """
    base = conv1d_init(rng, in_ch, out_ch, kernel, groups=groups, bias=True, dtype=dtype)
    v = base["weight"]
    g = jnp.linalg.norm(v.reshape(-1, v.shape[-1]), axis=0).reshape(1, 1, v.shape[-1])
    return {"weight_g": g.astype(dtype), "weight_v": v, "bias": base["bias"]}


def weight_norm_conv1d_weight(params) -> jnp.ndarray:
    v = params["weight_v"]
    norm = jnp.sqrt(jnp.sum(jnp.square(v.astype(jnp.float32)), axis=(0, 1), keepdims=True))
    return (params["weight_g"].astype(jnp.float32) * v.astype(jnp.float32) / norm).astype(v.dtype)


# ---------------------------------------------------------------------------
# Positional encodings (SpeechT5 family parity)
# ---------------------------------------------------------------------------

def sinusoidal_table(num_embeddings: int, dim: int, padding_idx: Optional[int] = None) -> np.ndarray:
    """fairseq-style sinusoidal table: [sin | cos] halves concatenated.

    Parity target: HF SpeechT5SinusoidalPositionalEmbedding.get_embedding.
    """
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = np.exp(np.arange(half, dtype=np.float64) * -emb)
    angles = np.arange(num_embeddings, dtype=np.float64)[:, None] * freqs[None, :]
    table = np.concatenate([np.sin(angles), np.cos(angles)], axis=1).astype(np.float32)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((num_embeddings, 1), np.float32)], axis=1)
    if padding_idx is not None:
        table[padding_idx, :] = 0.0
    return table


def interleaved_sinusoidal_table(max_len: int, dim: int) -> np.ndarray:
    """Interleaved sin/cos table (pe[:,0::2]=sin, pe[:,1::2]=cos).

    Parity target: HF SpeechT5ScaledPositionalEncoding (Transformer-TTS §3.2).
    """
    pe = np.zeros((max_len, dim), np.float32)
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float64) * -(math.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def positions_from_padding(valid_mask: jnp.ndarray, padding_idx: int,
                           past_length: int = 0) -> jnp.ndarray:
    """Position ids 'padding_idx+1, padding_idx+2, ...' on valid steps,
    ``padding_idx`` on padded steps (fairseq make_positions semantics)."""
    m = valid_mask.astype(jnp.int32)
    return (jnp.cumsum(m, axis=1) + past_length) * m + padding_idx


# ---------------------------------------------------------------------------
# Dropout (explicit-rng, inert when deterministic)
# ---------------------------------------------------------------------------

def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float,
            deterministic: bool) -> jnp.ndarray:
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    # one-byte masks are cheap to hold but expensive to regenerate
    # (threefry): the "hybrid"/"lite" remat policies save them, while the
    # masked OUTPUT is recompute-on-backward under "lite" (ops/remat.py)
    mask = _checkpoint_name(mask, "dropout_mask")
    return _checkpoint_name(jnp.where(mask, x / keep, 0.0).astype(x.dtype),
                            "big")
