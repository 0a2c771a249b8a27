"""Rematerialization policies for transformer layer stacks.

Why this exists (measured on v5e, docs/BENCH.md round-3 profiling):
without remat, XLA autodiff through the scanned encoder saves every
intermediate the backward touches — per layer that is the attention
probabilities (stored in bf16 AND an f32 copy), several f32 copies of
the [B, T, ffn] intermediates, and one-byte pred dropout masks for
every dropout site.  At batch 16 x 5 s that is multiple GB of HBM
written in the forward and re-read by the backward; the train step is
HBM-bandwidth-bound (bytes 4.8x fwd vs FLOPs 2.4x).  Plain
``jax.checkpoint`` ("full") swings the other way: it saves only the
layer inputs and recomputes EVERYTHING in the backward — including the
threefry dropout masks, which are expensive to generate — measured
+27% step time.

The named policies here pick intermediates by value: store what is
cheap to hold and expensive to recompute (pred dropout masks, MXU dot
outputs), recompute the fat f32 elementwise chains.

  "none"   no remat (save-everything XLA default)
  "full"   plain jax.checkpoint — save layer inputs only
  "dots"   jax.checkpoint_policies.dots_saveable — save MXU dot
           outputs, recompute elementwise (norms, GELU, softmax,
           dropout masks)
  "hybrid" dots + dropout masks (masks are tagged with
           ``checkpoint_name('dropout_mask')`` in ops.layers.dropout) —
           avoids re-paying mask generation in the backward
  "lite"   the inverse policy, built from the measured per-op trace:
           save EVERYTHING except the tensors tagged "big" via
           :func:`tag_big` — the [B, H, T, T] attention-score chain and
           the [B, T, ffn] FFN chain.  Their recompute is a handful of
           MXU einsums + VPU passes (~2 ms/step at batch 16 x 5 s)
           while their saves cost multiple GB of HBM round trip; pred
           dropout masks and every [B, T, H] tensor stay saved, so no
           threefry regeneration and no layer re-forward

Every policy is EXACT: recomputed values replay the same ops with the
same rng, so loss and grads match the no-remat step bit-for-bit
(pinned by tests/test_remat_policies.py).  ``prevent_cse=False`` is
used throughout — safe and recommended when the checkpointed function
is a ``lax.scan`` body or is otherwise executed inside a loop (the
scan boundary already prevents the CSE that flag guards against).
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
from jax.ad_checkpoint import checkpoint_name

RematSpec = Union[bool, str, None]

_NAMES = ("none", "full", "dots", "hybrid", "lite")


def tag_big(x):
    """Mark ``x`` recompute-on-backward under the "lite" policy.

    Applied to the fat intermediates of the attention/FFN chains
    (anything O(B*H*T*T) or O(B*T*ffn)).  A no-op unless the enclosing
    function runs under jax.checkpoint with the "lite" policy."""
    return checkpoint_name(x, "big")


def canonicalize(spec: RematSpec) -> str:
    """bool/str/None -> one of "none" | "full" | "dots" | "hybrid"."""
    if spec is None or spec is False:
        return "none"
    if spec is True:
        return "full"
    s = str(spec).lower()
    if s not in _NAMES:
        raise ValueError(f"unknown remat spec {spec!r}; expected one of "
                         f"{_NAMES} (or bool)")
    return s


def policy_for(spec: RematSpec) -> Optional[Callable]:
    """The jax.checkpoint policy for ``spec`` (None for "full")."""
    name = canonicalize(spec)
    cp = jax.checkpoint_policies
    if name == "full":
        return None  # jax.checkpoint default: nothing saveable
    if name == "dots":
        return cp.dots_saveable
    if name == "hybrid":
        return cp.save_from_both_policies(
            cp.dots_saveable, cp.save_only_these_names("dropout_mask"))
    if name == "lite":
        return cp.save_anything_except_these_names("big")
    raise ValueError(name)  # "none" has no policy — guard in apply()


def apply(fn: Callable, spec: RematSpec) -> Callable:
    """Wrap ``fn`` in jax.checkpoint per ``spec`` ("none" returns it as-is)."""
    name = canonicalize(spec)
    if name == "none":
        return fn
    if name == "full":
        return jax.checkpoint(fn, prevent_cse=False)
    return jax.checkpoint(fn, policy=policy_for(name), prevent_cse=False)
