"""Parameter partition rules: param-tree path -> PartitionSpec.

Megatron-style TP for transformer blocks plus FSDP sharding of the
remaining large axis.  Rules are regex -> spec tables per model family,
applied to flattened pytree paths (utils.pytree.flatten_with_paths), the
sharding analogue of the checkpoint renaming tables.

Kernel layout reminder: our dense kernels are [in, out].
  * column-parallel (shard OUT over tensor): q/k/v projections, FFN up,
    qkv fused (GPT-2 c_attn), lm_head
  * row-parallel (shard IN over tensor): attention out_proj, FFN down
  * embeddings: shard the embedding dim over tensor (keeps gathers local)
  * FSDP shards whichever large axis tensor did not take.
"""

from __future__ import annotations

import logging
import re
from typing import Dict, List, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.pytree import flatten_with_paths, unflatten_from_paths
from .mesh import AXES

Rule = Tuple[str, P]

logger = logging.getLogger(__name__)

_F, _T = AXES.fsdp, AXES.tensor

# Shared transformer rules (SpeechT5 + GPT-2 use the same module names
# where it matters).
TRANSFORMER_RULES: List[Rule] = [
    # attention projections (SpeechT5 naming)
    (r"\.(q_proj|k_proj|v_proj)\.kernel$", P(_F, _T)),
    (r"\.(q_proj|k_proj|v_proj)\.bias$", P(_T)),
    (r"\.out_proj\.kernel$", P(_T, _F)),
    (r"\.out_proj\.bias$", P()),
    # feed-forward (SpeechT5 naming)
    (r"\.intermediate_dense\.kernel$", P(_F, _T)),
    (r"\.intermediate_dense\.bias$", P(_T)),
    (r"\.output_dense\.kernel$", P(_T, _F)),
    (r"\.output_dense\.bias$", P()),
    # GPT-2 naming: fused qkv + mlp
    (r"\.c_attn\.kernel$", P(_F, _T)),
    (r"\.c_attn\.bias$", P(_T)),
    (r"attn\.c_proj\.kernel$", P(_T, _F)),
    (r"mlp\.c_fc\.kernel$", P(_F, _T)),
    (r"mlp\.c_fc\.bias$", P(_T)),
    (r"mlp\.c_proj\.kernel$", P(_T, _F)),
    # embeddings / heads
    (r"(wte|embed_tokens)\.weight$", P(_F, _T)),
    (r"wpe\.weight$", P(None, _T)),
    (r"lm_head\.kernel$", P(_F, _T)),
    # SpeechT5 speech prenet: conv feature encoder is tiny -> replicate;
    # feature projection is a real matmul
    (r"feature_projection\.projection\.kernel$", P(_F, _T)),
    (r"pos_conv_embed\.conv\.weight_v$", P(_T, None, None)),
    # relative position table: replicate (small)
    (r"pe_k\.weight$", P()),
]


def spec_for(path: str, rules: Sequence[Rule]) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path):
            return spec
    return P()  # replicate by default


def partition_specs(params: Dict, rules: Sequence[Rule] = TRANSFORMER_RULES) -> Dict:
    """Param tree -> tree of PartitionSpec with identical structure."""
    flat = flatten_with_paths(params)
    return unflatten_from_paths({k: spec_for(k, rules) for k in flat})


def validate_spec(spec: P, shape: Tuple[int, ...],
                  axis_sizes: Dict[str, int], path: str = "") -> P:
    """Resolve a rule spec against a concrete shape + mesh-axis sizes.

    1. Drop sharding on dims the array can't honor (indivisible dims —
       keeps the rules usable for toy test configs).
    2. RELOCATE a dropped mesh axis to another dim that CAN honor it
       (combined with whatever trivial/compatible axes already sit
       there).  The motivating case is gpt2-xl's wte [50257, 1600] under
       --mesh 1,8,1: the vocab dim is not divisible by fsdp=8, and
       without relocation ~920 MB of embedding + Adam state would be
       silently replicated on every chip; moving fsdp to the (divisible)
       embedding dim keeps the state fully sharded
       (tests/test_fsdp_memory.py pins the residue).
    3. Only if no dim can take the axis is it dropped for real — logged
       as a warning, since at real scale that means a mistyped rule or
       an odd vocab and the memory/step-time cost is large.
    """
    out: List = []
    dropped: List[Tuple] = []
    for i, s in enumerate(spec):
        if s is not None and i >= len(shape):
            # a rule naming a dim the array doesn't have is a mistyped
            # rule, not a divisibility accident — keep it loud
            logger.warning(
                "partition rule ignored: %s spec entry %r at dim %d but "
                "array rank is %d", path or "<param>", s, i, len(shape))
            continue
        if s is None or i >= len(shape):
            out.append(None)
            continue
        names = s if isinstance(s, tuple) else (s,)
        size = int(np.prod([axis_sizes[n] for n in names]))
        if shape[i] % size == 0:
            out.append(s)
        else:
            out.append(None)
            if size > 1:
                dropped.append((i, names, size))
    out += [None] * (len(shape) - len(out))
    out = out[:len(shape)]

    for i, names, size in dropped:
        placed = False
        for j in range(len(shape)):
            if j == i:
                continue
            here = out[j]
            here_names = (() if here is None
                          else (here if isinstance(here, tuple) else (here,)))
            if any(n in here_names for n in names):
                continue
            combined = here_names + names
            csize = int(np.prod([axis_sizes[n] for n in combined]))
            if shape[j] % csize == 0:
                out[j] = combined if len(combined) > 1 else combined[0]
                # at real scale a relocation means the RULE's layout isn't
                # what runs (collectives/layouts differ) — warn for big
                # params, stay quiet for toy test shapes
                level = (logger.warning if int(np.prod(shape)) >= 1 << 20
                         else logger.info)
                level(
                    "partition rule relocated: %s mesh axis %r moved from "
                    "dim %d (size %d, indivisible) to dim %d (size %d)",
                    path or "<param>", names, i, shape[i], j, shape[j])
                placed = True
                break
        if not placed:
            logger.warning(
                "partition rule dropped: %s dim %d (size %s) not divisible "
                "by mesh axis %r (size %d) — tensor axis will be REPLICATED",
                path or "<param>", i, shape[i], names, size)
    return P(*out)


def _validate(spec: P, shape: Tuple[int, ...], mesh: Mesh,
              path: str = "") -> P:
    return validate_spec(spec, shape, dict(mesh.shape), path=path)


def shard_params(params: Dict, mesh: Mesh,
                 rules: Sequence[Rule] = TRANSFORMER_RULES) -> Dict:
    """Place a param tree onto the mesh per the rules (validated per-shape)."""
    flat = flatten_with_paths(params)
    out = {}
    for k, v in flat.items():
        spec = _validate(spec_for(k, rules), np.shape(v), mesh, path=k)
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return unflatten_from_paths(out)


def sharding_tree(params: Dict, mesh: Mesh,
                  rules: Sequence[Rule] = TRANSFORMER_RULES) -> Dict:
    """NamedSharding tree (validated), for jit in/out_shardings."""
    flat = flatten_with_paths(params)
    return unflatten_from_paths({
        k: NamedSharding(mesh, _validate(spec_for(k, rules), np.shape(v), mesh,
                                         path=k))
        for k, v in flat.items()
    })
