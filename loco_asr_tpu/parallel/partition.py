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


def _validate(spec: P, shape: Tuple[int, ...], mesh: Mesh,
              path: str = "") -> P:
    """Drop sharding on axes the array can't honor (tiny dims); keeps the
    rules usable for toy test configs.  Every drop is logged — at real
    scale a silently-replicated tensor means a mistyped rule or an odd
    vocab, and the memory/step-time cost is large."""
    out = []
    for i, s in enumerate(spec):
        if s is None:
            out.append(None)
            continue
        names = s if isinstance(s, tuple) else (s,)
        size = int(np.prod([mesh.shape[n] for n in names]))
        if i < len(shape) and shape[i] % size == 0:
            out.append(s)
        else:
            logger.warning(
                "partition rule dropped: %s dim %d (size %s) not divisible "
                "by mesh axis %r (size %d) — tensor axis will be REPLICATED",
                path or "<param>", i, shape[i] if i < len(shape) else "<absent>",
                s, size)
            out.append(None)
    out += [None] * (len(shape) - len(out))
    return P(*out[:len(shape)])


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
