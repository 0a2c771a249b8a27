"""Ulysses (head-scatter) sequence parallelism — the all-to-all
alternative to ring attention (SURVEY §5 long-context row).

Inputs arrive sequence-sharded ([B, H, T/n, D] per device).  One
``all_to_all`` re-shards to head-sharded / sequence-gathered
([B, H/n, T, D]); each device then runs EXACT full-sequence attention on
its head slice (same math as the dense path in ops/attention.py, incl.
the SpeechT5 rel-pos term and key-padding); a second ``all_to_all``
restores sequence sharding.  Communication is 2 all-to-alls of the
activation size per layer — cheaper than the ring's (n-1) K/V hops when
the mesh axis rides fast ICI and H >= n, at the cost of holding the full
[T, T/head-slice] score tile per device (use the ring for the longest
sequences; Ulysses for head-rich models at moderate T).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

NEG_INF = -1e30


def _local_full_attention(q, k, v, kv_valid_len, rel_pe, *,
                          causal: bool, scale: Optional[float],
                          rel_max: Optional[int]):
    """Exact attention on [B, Hl, T, D] (a head slice, full sequence) —
    the dense-path math of ops/attention.py:139-162."""
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    t = q.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if rel_pe is not None:
        L = rel_max if rel_max is not None else rel_pe.shape[0] // 2
        idx = jnp.clip(jnp.arange(t)[:, None] - jnp.arange(t)[None, :],
                       -L, L - 1) + L
        pos_keys = jnp.take(rel_pe.astype(q.dtype), idx, axis=0)  # [T,T,D]
        s = s + jnp.einsum("bhid,ijd->bhij", (q * scale).astype(q.dtype),
                           pos_keys, preferred_element_type=jnp.float32)
    if causal:
        mask = jnp.arange(t)[None, :] <= jnp.arange(t)[:, None]
        s = jnp.where(mask[None, None], s, NEG_INF)
    if kv_valid_len is not None:
        pad = jnp.arange(t)[None, :] < kv_valid_len[:, None]      # [B, T]
        s = jnp.where(pad[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
                      preferred_element_type=jnp.float32).astype(q.dtype)


def ulysses_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
    mesh: Mesh, axis_name: str, causal: bool = True,
    scale: Optional[float] = None,
    kv_valid_len: Optional[jnp.ndarray] = None,
    rel_pe: Optional[jnp.ndarray] = None,
    rel_max: Optional[int] = None,
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Exact attention over sequence-sharded [B, H, T, D] inputs via
    head-scatter all-to-alls.  H and T must divide by the mesh axis size.
    Same contract as :func:`..ring_attention.ring_attention` (global
    shapes in/out; rel-pos distances are global)."""
    from .sp import sp_shard_map

    h = q.shape[1]
    n = mesh.shape[axis_name]
    if h % n:
        raise ValueError(f"num heads {h} not divisible by mesh axis {n} "
                         "(Ulysses scatters heads; use ring attention)")

    def local(q, k, v, kvl, pe):
        # [B, H, T/n, D] -> [B, H/n, T, D]: scatter heads, gather sequence
        a2a = lambda x: jax.lax.all_to_all(x, axis_name, split_axis=1,
                                          concat_axis=2, tiled=True)
        out = _local_full_attention(a2a(q), a2a(k), a2a(v), kvl, pe,
                                    causal=causal, scale=scale,
                                    rel_max=rel_max)
        # [B, H/n, T, D] -> [B, H, T/n, D]
        return jax.lax.all_to_all(out, axis_name, split_axis=2,
                                  concat_axis=1, tiled=True)

    return sp_shard_map(local, mesh, axis_name, q, k, v, kv_valid_len,
                        rel_pe, batch_axis=batch_axis)
