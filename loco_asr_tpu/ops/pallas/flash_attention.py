"""Blockwise (flash) attention Pallas kernel for TPU.

O(T) memory causal attention for conversation-scale sequences — the
device-side answer to the reference's O(T*L) sliding-window scoring
(lms/src/utils.py:141-178) and the building block for sequence-parallel
ring attention (parallel/ring_attention.py).

Forward-only (scoring/decoding paths); training paths use the dense
attention in ops/attention.py (XLA fuses it well at trainer sequence
lengths).  Online-softmax accumulation in VMEM scratch; the kv axis is the
innermost grid dimension so scratch carries across kv blocks per q block.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANES = 128


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  scale: float, causal: bool, block_q: int, block_k: int,
                  num_k_blocks: int):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = qi * block_q
    k_start = ki * block_k
    # whole block strictly above the diagonal -> nothing to do
    run = (not causal) or (k_start <= q_start + block_q - 1)

    @pl.when(run)
    def _compute():
        q = q_ref[0].astype(jnp.float32)                  # [Bq, D]
        k = k_ref[0].astype(jnp.float32)                  # [Bk, D]
        v = v_ref[0].astype(jnp.float32)                  # [Bk, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask = (k_start + cols) <= (q_start + rows)
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, 0:1]                            # [Bq, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)                            # [Bq, Bk]
        alpha = jnp.exp(m_prev - m_new)                   # [Bq, 1]
        l_new = alpha * l_scr[:, 0:1] + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
    causal: bool = True, scale: Optional[float] = None,
    block_q: int = 128, block_k: int = 128,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """[B, H, T, D] q/k/v -> [B, H, Tq, D] attention output.

    Tq and Tk must be multiples of the block sizes after internal padding
    (handled here: inputs are zero-padded, outputs cropped; padded KEY
    positions are excluded by the causal mask for causal=True, and by an
    explicit key-length mask otherwise).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, tq, d = q.shape
    tk = k.shape[2]
    scale = scale if scale is not None else d ** -0.5

    block_q = min(block_q, max(8, tq))
    block_k = min(block_k, max(_LANES, 8))
    pq = -tq % block_q
    pk = -tk % block_k
    if not causal and pk:
        raise ValueError("non-causal flash requires Tk % block_k == 0 "
                         "(padded keys would enter the softmax)")
    if pq or pk:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pq), (0, 0)))
        # pad keys with NEG_INF-safe zeros; causal mask excludes them for
        # every valid (unpadded) query row since their index > any valid row
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))
    tq_p, tk_p = q.shape[2], k.shape[2]

    qf = q.reshape(b * h, tq_p, d)
    kf = k.reshape(b * h, tk_p, d)
    vf = v.reshape(b * h, tk_p, d)
    num_q = tq_p // block_q
    num_k = tk_p // block_k

    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, num_k_blocks=num_k)

    out = pl.pallas_call(
        kernel,
        grid=(b * h, num_q, num_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)

    return out.reshape(b, h, tq_p, d)[:, :, :tq]
