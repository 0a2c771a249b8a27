"""Pytree helpers: path-flattening, torch interop, parameter counting.

Model parameters throughout the framework are plain nested dicts of
``jnp.ndarray`` leaves.  Keeping the tree a vanilla dict (instead of a
framework module class) makes checkpoint import a pure renaming problem --
the TPU-side port of the reference's fairseq->HF ``Mapping`` contract
(reference: speech_text/map_speecht5_hf.py:1-181).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def flatten_with_paths(tree: Params, sep: str = ".") -> Dict[str, jnp.ndarray]:
    """Flatten a nested dict into {"a.b.c": leaf} form."""
    out: Dict[str, jnp.ndarray] = {}

    def rec(prefix: str, node: Any) -> None:
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}{sep}{k}" if prefix else str(k), v)
        else:
            out[prefix] = node

    rec("", tree)
    return out


def unflatten_from_paths(flat: Dict[str, Any], sep: str = ".") -> Params:
    """Inverse of :func:`flatten_with_paths`."""
    tree: Params = {}
    for path, leaf in flat.items():
        keys = path.split(sep)
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = leaf
    return tree


def num_params(tree: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def cast_floating(tree: Params, dtype) -> Params:
    """Cast floating-point leaves to ``dtype`` (ints/bools untouched)."""

    def cast(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def from_torch(x) -> np.ndarray:
    """torch.Tensor -> np.ndarray (no torch import at module scope)."""
    return np.asarray(x.detach().cpu().numpy())


def torch_state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    return {k: from_torch(v) for k, v in state_dict.items()}


def map_leaves_with_paths(
    tree: Params, fn: Callable[[str, jnp.ndarray], jnp.ndarray], sep: str = "."
) -> Params:
    flat = flatten_with_paths(tree, sep)
    return unflatten_from_paths({k: fn(k, v) for k, v in flat.items()}, sep)


def iter_leaves(tree: Params, sep: str = ".") -> Iterator[Tuple[str, jnp.ndarray]]:
    yield from flatten_with_paths(tree, sep).items()


def assert_trees_match(expected: Params, got: Params) -> None:
    """Strict-key + shape check, the analogue of torch load_state_dict(strict)."""
    e = flatten_with_paths(expected)
    g = flatten_with_paths(got)
    missing = sorted(set(e) - set(g))
    unexpected = sorted(set(g) - set(e))
    if missing or unexpected:
        raise ValueError(
            f"Param tree mismatch. Missing: {missing[:8]}{'...' if len(missing) > 8 else ''} "
            f"Unexpected: {unexpected[:8]}{'...' if len(unexpected) > 8 else ''}"
        )
    bad = [
        (k, tuple(np.shape(e[k])), tuple(np.shape(g[k])))
        for k in e
        if tuple(np.shape(e[k])) != tuple(np.shape(g[k]))
    ]
    if bad:
        raise ValueError(f"Shape mismatches: {bad[:8]}")
