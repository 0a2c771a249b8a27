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
import logging
import math
from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

logger = logging.getLogger(__name__)
_warned_skip = set()

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

    No-op without an active ``activation_mesh`` context or for rank-0
    arrays.  A batch dim not divisible by the data-axes width also
    skips the pin — but that silently disables the miscompile guard,
    so it warns (once per shape/width): size batches to a multiple of
    the DP width (x grad_accum; parallel.train.shard_batch pads this
    way for the trainers).
    """
    active = _ACTIVE.get()
    if active is None or getattr(x, "ndim", 0) == 0:
        return x
    mesh, axes = active
    width = math.prod(mesh.shape[a] for a in axes)
    if x.shape[0] % width:
        key = (x.shape[0], width)
        if key not in _warned_skip:
            _warned_skip.add(key)
            logger.warning(
                "constrain_batch: batch dim %d not divisible by data-axes "
                "width %d — activation-sharding constraint SKIPPED for "
                "this tensor (free GSPMD propagation; see act_sharding.py "
                "for the miscompile class this normally guards)",
                x.shape[0], width)
        return x
    spec = PartitionSpec(axes, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
