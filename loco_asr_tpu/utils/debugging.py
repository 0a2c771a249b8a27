"""Debugging aids: NaN checking and determinism verification (SURVEY §5
sanitizers row: 'jax debug/nan-check flags + deterministic-RNG tests').
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def nan_checks(enable: bool = True):
    """Enable jax_debug_nans within the scope (raises at the op producing
    the first NaN instead of propagating it)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_all_finite(tree, name: str = "tree") -> None:
    for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            raise FloatingPointError(f"{name}: non-finite values in leaf {i}")


def check_deterministic(fn: Callable, *args, runs: int = 2) -> bool:
    """Run ``fn(*args)`` repeatedly and verify bit-identical outputs —
    the RNG-discipline check (all randomness must flow through explicit
    PRNG keys, never hidden state)."""
    ref = jax.tree_util.tree_map(np.asarray, fn(*args))
    for _ in range(runs - 1):
        out = jax.tree_util.tree_map(np.asarray, fn(*args))
        for a, b in zip(jax.tree_util.tree_leaves(ref),
                        jax.tree_util.tree_leaves(out)):
            if not np.array_equal(a, b):
                return False
    return True
