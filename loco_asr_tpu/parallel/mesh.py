"""Device mesh construction and axis conventions.

The reference has no distributed layer at all (single
torch.device("cuda"/"cpu") everywhere — SURVEY.md §2.3); this subsystem is
new, built the TPU way: one ``jax.sharding.Mesh`` whose named axes carry
all parallelism, with XLA inserting collectives over ICI/DCN from sharding
annotations.

Axis conventions (MeshAxes):
  data    -- pure data parallelism (gradients psum over ICI/DCN)
  fsdp    -- data parallelism with parameter sharding (ZeRO-3 style:
             params all-gathered per layer, grads reduce-scattered)
  tensor  -- megatron-style tensor parallelism inside attention/FFN blocks
  (sequence parallelism for conversation-scale attention rides the same
  mesh via ops/pallas ring attention; no separate axis is reserved until
  a workload needs simultaneous TP+SP.)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    data: str = "data"
    fsdp: str = "fsdp"
    tensor: str = "tensor"

    @property
    def names(self) -> Tuple[str, str, str]:
        return (self.data, self.fsdp, self.tensor)


AXES = MeshAxes()


def make_mesh(data: int = -1, fsdp: int = 1, tensor: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, fsdp, tensor) mesh.  ``-1`` absorbs remaining devices.

    Device order follows jax.devices(), which enumerates ICI-contiguous
    devices adjacently — keeping tensor (the chattiest axis) innermost so
    its collectives ride the shortest ICI hops.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    dims = [data, fsdp, tensor]
    known = int(np.prod([d for d in dims if d > 0]))
    for i, d in enumerate(dims):
        if d == -1:
            if n % known:
                raise ValueError(f"{n} devices not divisible by {known}")
            dims[i] = n // known
            known *= dims[i]
            break
    want = int(np.prod(dims))
    if want > n:
        raise ValueError(f"mesh {dims} needs {want} devices, have {n}")
    grid = np.asarray(devs[:want]).reshape(dims)
    return Mesh(grid, AXES.names)


def slice_groups(devices: Sequence[jax.Device],
                 num_slices: Optional[int] = None) -> list:
    """Group devices by TPU slice.  Uses each device's ``slice_index`` when
    the runtime reports one; if ``num_slices`` is given and exceeds what the
    runtime reports (CPU meshes, single-slice testing), devices are split
    into that many equal contiguous groups — contiguous ``jax.devices()``
    are ICI-adjacent, so the simulated grouping has the same locality
    structure as real slices.
    """
    devs = list(devices)
    groups: dict = {}
    for d in devs:
        groups.setdefault(getattr(d, "slice_index", 0), []).append(d)
    granules = [groups[k] for k in sorted(groups)]
    if num_slices is not None and num_slices > len(granules):
        if num_slices % len(granules):
            raise ValueError(
                f"cannot split {len(granules)} slice(s) into {num_slices}")
        k = num_slices // len(granules)        # groups per real slice
        split = []
        for g in granules:
            if k == 0 or len(g) % k:
                # must divide by the GROUP COUNT, not the group size —
                # 8 devices into 3 groups would otherwise silently yield 4
                raise ValueError(
                    f"slice of {len(g)} devices not divisible into "
                    f"{k} groups")
            per = len(g) // k
            split.extend(g[i:i + per] for i in range(0, len(g), per))
        granules = split
        assert len(granules) == num_slices, (len(granules), num_slices)
    if num_slices is not None and len(granules) != num_slices:
        # e.g. requesting FEWER slices than the runtime reports: silently
        # building the layout over all reported slices would put unexpected
        # axes on DCN — refuse instead
        raise ValueError(
            f"num_slices={num_slices} but the device set resolves to "
            f"{len(granules)} slice group(s)")
    if len({len(g) for g in granules}) != 1:
        raise ValueError("slices have unequal device counts")
    return granules


def make_multislice_mesh(data: int = -1, fsdp: int = 1, tensor: int = 1,
                         num_slices: Optional[int] = None,
                         devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh spanning multiple TPU slices: the data axis is laid out across
    slices so its collectives (gradient all-reduce) ride DCN while
    fsdp/tensor stay inside a slice on ICI (SURVEY §2.3 plan: 'DCN data
    parallelism across slices').

    The hybrid grid is built first-party (same layout as jax's
    ``mesh_utils.create_hybrid_device_mesh``: slices stacked along the
    outermost/data axis, ICI axes inside a slice) so the multi-slice path
    is testable on CPU meshes via ``num_slices`` simulated grouping.

    Falls back to :func:`make_mesh` when the runtime reports one slice
    and no explicit ``num_slices`` is requested.
    """
    devs = list(devices if devices is not None else jax.devices())
    granules = slice_groups(devs, num_slices)
    n_slices = len(granules)
    if n_slices <= 1:
        return make_mesh(data, fsdp, tensor, devices=devs)

    per_slice = len(granules[0])
    if fsdp * tensor > per_slice or per_slice % (fsdp * tensor):
        raise ValueError(f"fsdp*tensor={fsdp * tensor} must divide the "
                         f"per-slice device count {per_slice}")
    if data == -1:
        data = len(devs) // (fsdp * tensor)
    if data % n_slices:
        raise ValueError(f"data axis {data} must divide across {n_slices} slices")
    data_per_slice = data // n_slices
    if data_per_slice * fsdp * tensor != per_slice:
        raise ValueError(
            f"mesh ({data},{fsdp},{tensor}) needs {data_per_slice * fsdp * tensor}"
            f" devices per slice, slices have {per_slice}")
    # Each slice contributes a (data/n_slices, fsdp, tensor) inner grid of
    # ICI-adjacent devices; slices stack along the data axis so only data
    # collectives cross DCN.
    grid = np.stack([
        np.asarray(g).reshape(data_per_slice, fsdp, tensor) for g in granules
    ]).reshape(data, fsdp, tensor)
    return Mesh(grid, AXES.names)


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding over data x fsdp (the combined DP width)."""
    return NamedSharding(mesh, P((AXES.data, AXES.fsdp)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
