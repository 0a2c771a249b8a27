"""Activation-sharding constraints at module boundaries.

Model functions stay mesh-agnostic pure functions: the sharded train /
eval steps activate a context (``activation_mesh``) and the model
forwards pin their batch-carrying boundary activations with
``constrain_batch`` — the megatron activation layout (leading axis
sharded over the data axes, everything else replicated between blocks).
Without an active context every call is a no-op, so single-device paths
and the TPU-chip pipelines are untouched.

Why this exists beyond being standard production practice: GSPMD left
to propagate shardings on a 3-axis (data, fsdp, tensor) mesh chose an
activations-sharded-over-'fsdp'-HIDDEN layout for the encoder output,
and the XLA:CPU SPMD pipeline (jax 0.9.0) miscompiled the composed
encoder->decoder program — self-attention outputs off by O(1) while
every stage matched in isolation; deterministic, identical under GSPMD
and Shardy, vanishing when intermediates are returned or any mesh axis
is trivial (tests/test_sharding.py::test_sharded_forward_parity_3axis
pins the fixed behavior).  Pinning boundary layouts removes the exotic
propagation entirely; on TPU it is also the intended layout, so this is
not a CPU-only workaround.
"""

from __future__ import annotations

import contextlib
import contextvars
import math
from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

_ACTIVE: contextvars.ContextVar[Optional[Tuple[Mesh, Tuple[str, ...]]]] = \
    contextvars.ContextVar("loco_activation_mesh", default=None)


@contextlib.contextmanager
def activation_mesh(mesh: Mesh, batch_axes: Sequence[str] = ("data", "fsdp")):
    """Activate boundary-activation constraints for code traced inside.

    ``batch_axes``: mesh axes the batch dimension is sharded over
    (parallel.mesh.data_sharding uses ('data', 'fsdp')).  Axes missing
    from the mesh or of size 1 are dropped; with none left, the context
    is inert.
    """
    axes = tuple(a for a in batch_axes
                 if a in mesh.shape and mesh.shape[a] > 1)
    token = _ACTIVE.set((mesh, axes) if axes else None)
    try:
        yield
    finally:
        _ACTIVE.reset(token)


def constrain_batch(x: jax.Array) -> jax.Array:
    """Pin axis 0 of ``x`` to the active data axes (replicate the rest).

    No-op without an active ``activation_mesh`` context, for rank-0
    arrays, or when the batch dim is not divisible by the data axes.
    """
    active = _ACTIVE.get()
    if active is None or getattr(x, "ndim", 0) == 0:
        return x
    mesh, axes = active
    width = math.prod(mesh.shape[a] for a in axes)
    if x.shape[0] % width:
        return x
    spec = PartitionSpec(axes, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
