"""Checkpointing: save AND resume (fixing the reference's save-only gap,
train_classifier.py:132-171 — torch.save of weights with no optimizer state
and no resume path; SURVEY.md §5 checkpoint row).

Primary backend is orbax (async-capable, TPU-friendly); a plain .npz
fallback keeps small-model flows dependency-light.  State = {params,
opt_state, step, extra} as one pytree.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from .pytree import flatten_with_paths, unflatten_from_paths


def save_npz(path: str, tree: Dict) -> None:
    """Flat .npz snapshot of a pytree (positions/ints preserved)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {k: np.asarray(v) for k, v in flatten_with_paths(tree).items()}
    np.savez(path, **flat)


def load_npz(path: str) -> Dict:
    with np.load(path, allow_pickle=False) as z:
        return unflatten_from_paths({k: z[k] for k in z.files})


class Checkpointer:
    """Step-indexed checkpoint directory with resume + best-tracking.

    Layout: {dir}/step_{N}/ (orbax) or {dir}/step_{N}.npz, plus
    {dir}/status.json recording latest/best.
    """

    def __init__(self, directory: str, use_orbax: Optional[bool] = None):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        if use_orbax is None:
            try:
                import orbax.checkpoint  # noqa: F401
                use_orbax = True
            except ImportError:
                use_orbax = False
        self.use_orbax = use_orbax

    # -- status ------------------------------------------------------------
    def _status_path(self) -> str:
        return os.path.join(self.directory, "status.json")

    def status(self) -> Dict[str, Any]:
        if os.path.exists(self._status_path()):
            with open(self._status_path()) as f:
                return json.load(f)
        return {"latest": None, "best": None, "best_metric": None}

    def _write_status(self, st: Dict[str, Any]) -> None:
        with open(self._status_path(), "w") as f:
            json.dump(st, f)

    # -- save/restore --------------------------------------------------------
    def _step_path(self, step: int) -> str:
        base = os.path.join(self.directory, f"step_{step}")
        return base if self.use_orbax else base + ".npz"

    def save(self, step: int, state: Dict, metric: Optional[float] = None,
             mode: str = "min") -> None:
        state = jax.device_get(state)
        if self.use_orbax:
            import orbax.checkpoint as ocp
            path = os.path.abspath(self._step_path(step))
            ckptr = ocp.PyTreeCheckpointer()
            ckptr.save(path, state, force=True)
        else:
            save_npz(self._step_path(step), state)
        st = self.status()
        st["latest"] = step
        if metric is not None:
            better = (st["best_metric"] is None
                      or (metric < st["best_metric"] if mode == "min"
                          else metric > st["best_metric"]))
            if better:
                st["best"], st["best_metric"] = step, float(metric)
        self._write_status(st)

    def restore(self, step: Optional[int] = None,
                target: Optional[Dict] = None) -> Optional[Dict]:
        """Restore a step (default: latest). Returns None if nothing saved."""
        st = self.status()
        if step is None:
            step = st["latest"]
        if step is None:
            return None
        if self.use_orbax:
            import orbax.checkpoint as ocp
            ckptr = ocp.PyTreeCheckpointer()
            return ckptr.restore(os.path.abspath(self._step_path(step)),
                                 item=target)
        return load_npz(self._step_path(step))

    def restore_best(self, target: Optional[Dict] = None) -> Optional[Dict]:
        st = self.status()
        return None if st["best"] is None else self.restore(st["best"], target)

    def steps(self) -> list:
        """All saved step numbers, ascending."""
        out = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                out.append(int(name[len("step_"):].split(".")[0]))
        return sorted(out)


def average_checkpoints(states: list) -> Dict:
    """Elementwise mean of parameter trees — standard ASR checkpoint
    averaging over the last k saves (reduces single-checkpoint variance).
    Accepts param trees (or state dicts; pass [s["params"] for s in ...])."""
    if not states:
        raise ValueError("no states to average")
    n = float(len(states))

    def mean(*leaves):
        acc = np.asarray(leaves[0], np.float64)
        for leaf in leaves[1:]:
            acc = acc + np.asarray(leaf, np.float64)
        return (acc / n).astype(np.asarray(leaves[0]).dtype)

    return jax.tree_util.tree_map(mean, *states)


def average_last_k(ckpt: "Checkpointer", k: int = 5) -> Optional[Dict]:
    """Average the params of the last k saved checkpoints."""
    steps = ckpt.steps()[-k:]
    if not steps:
        return None
    states = [ckpt.restore(s) for s in steps]
    return average_checkpoints([s["params"] for s in states])
