"""Shared assembly for the sequence-parallel attention schemes (ring /
Ulysses): impl resolution and the optional-argument shard_map plumbing,
so both schemes and both call sites (ops/attention.py, models/gpt2) stay
in sync through one definition."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def resolve_sp_impl(name: str) -> Callable:
    """'ring' | 'ulysses' -> the scheme's attention entry point."""
    if name == "ring":
        from .ring_attention import ring_attention
        return ring_attention
    if name == "ulysses":
        from .ulysses import ulysses_attention
        return ulysses_attention
    raise ValueError(f"unknown sequence-parallel impl {name!r}")


def sp_shard_map(
    local_fn: Callable, mesh: Mesh, axis_name: str,
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    kv_valid_len: Optional[jnp.ndarray], rel_pe: Optional[jnp.ndarray],
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Run ``local_fn(q, k, v, kv_valid_len_or_None, rel_pe_or_None)`` under
    shard_map with q/k/v sequence-sharded on ``axis_name`` and the optional
    extras replicated.  Both SP schemes share exactly this plumbing; adding
    a new optional input happens here once.

    ``batch_axis``: optional mesh axis carrying data parallelism — the
    batch dim of q/k/v (and kv_valid_len) shards over it, composing DP x SP
    on one mesh (e.g. mesh ("data", "sequence")); collectives inside the
    SP schemes run over ``axis_name`` only, so each data row attends its
    own batch shard."""
    t = q.shape[2]
    n = mesh.shape[axis_name]
    if t % n:
        raise ValueError(f"sequence length {t} not divisible by mesh axis {n}")

    spec = P(batch_axis, None, axis_name, None)
    have_len, have_pe = kv_valid_len is not None, rel_pe is not None
    args = [q, k, v]
    in_specs = [spec, spec, spec]
    if have_len:
        args.append(kv_valid_len)
        in_specs.append(P(batch_axis))
    if have_pe:
        args.append(rel_pe)
        in_specs.append(P())

    def body(*xs):
        kvl = xs[3] if have_len else None
        pe = xs[3 + have_len] if have_pe else None
        return local_fn(xs[0], xs[1], xs[2], kvl, pe)

    fn = jax.shard_map(body, mesh=mesh, in_specs=tuple(in_specs),
                       out_specs=spec, check_vma=False)
    return fn(*args)
