"""Ring attention: sequence-parallel attention over a mesh axis.

Conversation-scale sequences (hour-long podcast episodes, whole Fisher
calls) exceed one chip's memory; ring attention shards the sequence across
devices and rotates K/V blocks around the ICI ring while accumulating
online softmax — exact attention, O(T/n) memory per chip, communication
overlapped with block compute (SURVEY §2.3 plan; the TPU answer to the
reference's 1024-token context ceiling).

Built on shard_map + lax.ppermute: XLA lowers the permute onto the ICI
ring.  The per-block compute is dense (q_local x k_block) — at ring block
sizes the MXU is saturated; the Pallas flash kernel covers the
single-device long-context case instead.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

NEG_INF = -1e30


def _ring_attention_local(q, k, v, kv_valid_len, rel_pe, *, axis_name: str,
                          causal: bool, scale: Optional[float],
                          rel_max: Optional[int]):
    """Per-shard body. q/k/v: [B, H, T_local, D] (this device's sequence
    block); returns local attention output against the GLOBAL sequence.

    kv_valid_len: [B] global valid key count (right padding), or None.
    rel_pe: [2L, D] relative-position key table (SpeechT5 semantics:
    bias[i,j] = scale * q[i] . pe[clip(i-j, -L, L-1) + L]), or None.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, h, t_local, d = q.shape
    scale = scale if scale is not None else d ** -0.5

    q_pos = idx * t_local + jnp.arange(t_local)          # global q positions
    if rel_pe is not None:
        L = rel_max if rel_max is not None else rel_pe.shape[0] // 2
        qs = (q * scale).astype(q.dtype)  # rel term is scaled like content

    def step(i, carry):
        acc, m, l, k_cur, v_cur = carry
        src = (idx - i) % n                               # owner of k_cur
        k_pos = src * t_local + jnp.arange(k_cur.shape[2])

        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_cur,
                       preferred_element_type=jnp.float32) * scale
        if rel_pe is not None:
            # gather the small [2L, D] table into per-block Toeplitz keys,
            # then MXU einsum (per-element take_along_axis gathers are
            # ~100x slower on TPU)
            rel_idx = jnp.clip(q_pos[:, None] - k_pos[None, :], -L, L - 1) + L
            pos_keys = jnp.take(rel_pe.astype(q.dtype), rel_idx, axis=0)
            s = s + jnp.einsum("bhid,ijd->bhij", qs, pos_keys,
                               preferred_element_type=jnp.float32)
        if causal:
            mask = k_pos[None, :] <= q_pos[:, None]
            s = jnp.where(mask[None, None], s, NEG_INF)
        if kv_valid_len is not None:
            pad = k_pos[None, :] < kv_valid_len[:, None]   # [B, Tk]
            s = jnp.where(pad[:, None, None, :], s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32)

        # rotate K/V to the next device; XLA overlaps this with compute
        perm = [(j, (j + 1) % n) for j in range(n)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return acc_new, m_new, l_new, k_nxt, v_nxt

    init = (jnp.zeros((b, h, t_local, d), jnp.float32),
            jnp.full((b, h, t_local, 1), NEG_INF, jnp.float32),
            jnp.zeros((b, h, t_local, 1), jnp.float32),
            k, v)
    acc, m, l, _, _ = jax.lax.fori_loop(0, n, step, init)
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
    mesh: Mesh, axis_name: str, causal: bool = True,
    scale: Optional[float] = None,
    kv_valid_len: Optional[jnp.ndarray] = None,
    rel_pe: Optional[jnp.ndarray] = None,
    rel_max: Optional[int] = None,
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Exact attention over sequence-sharded [B, H, T, D] inputs.

    T must divide by the mesh axis size.  Inputs/outputs are globally
    shaped; shard_map splits the sequence axis over ``axis_name``.

    Optional extensions (SpeechT5 encoder / padded batches):
      kv_valid_len: [B] int32 valid key counts — keys at global positions
        >= the count are masked (right-padded batches).
      rel_pe: [2*rel_max, head_dim] relative-position key table; adds the
        HF SpeechT5 rel term scale*q.pe[clip(i-j)] with GLOBAL distances
        (bias spans shard boundaries correctly).
    """
    from .sp import sp_shard_map

    def local(q, k, v, kvl, pe):
        return _ring_attention_local(q, k, v, kvl, pe, axis_name=axis_name,
                                     causal=causal, scale=scale,
                                     rel_max=rel_max)

    return sp_shard_map(local, mesh, axis_name, q, k, v, kv_valid_len,
                        rel_pe, batch_axis=batch_axis)
