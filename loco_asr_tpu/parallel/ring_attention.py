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

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _ring_attention_local(q, k, v, *, axis_name: str, causal: bool,
                          scale: Optional[float]):
    """Per-shard body. q/k/v: [B, H, T_local, D] (this device's sequence
    block); returns local attention output against the GLOBAL sequence."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, h, t_local, d = q.shape
    scale = scale if scale is not None else d ** -0.5

    q_pos = idx * t_local + jnp.arange(t_local)          # global q positions

    def step(i, carry):
        acc, m, l, k_cur, v_cur = carry
        src = (idx - i) % n                               # owner of k_cur
        k_pos = src * t_local + jnp.arange(k_cur.shape[2])

        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_cur,
                       preferred_element_type=jnp.float32) * scale
        if causal:
            mask = k_pos[None, :] <= q_pos[:, None]
            s = jnp.where(mask[None, None], s, NEG_INF)

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
) -> jnp.ndarray:
    """Exact attention over sequence-sharded [B, H, T, D] inputs.

    T must divide by the mesh axis size.  Inputs/outputs are globally
    shaped; shard_map splits the sequence axis over ``axis_name``.
    """
    t = q.shape[2]
    n = mesh.shape[axis_name]
    if t % n:
        raise ValueError(f"sequence length {t} not divisible by mesh axis {n}")

    spec = P(None, None, axis_name, None)
    fn = jax.shard_map(
        functools.partial(_ring_attention_local, axis_name=axis_name,
                          causal=causal, scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    return fn(q, k, v)
