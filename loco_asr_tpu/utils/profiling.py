"""Profiling and tracing utilities (SURVEY §5: the reference has a single
wall-clock delta; we provide first-class tracing + honest device timing).

* trace(dir): context manager around jax.profiler (TensorBoard-format
  traces of XLA execution).
* annotate(name): TraceAnnotation for host-side spans.
* device_time_per_iter(fn, *args): HONEST per-iteration device time via
  chained-loop differencing — N iterations inside one jit'd fori_loop,
  one host sync, two loop lengths differenced.  Required on relay-attached
  TPUs where block_until_ready acks at dispatch (see bench.py and
  .claude/skills/verify/SKILL.md).
* StepTimer: rolling steps/sec + examples/sec meter for training loops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def device_time_per_iter(fn: Callable, *args, iters: int = 20,
                         warmup_iters: int = 2) -> float:
    """Seconds per iteration of ``fn(*args) -> pytree`` measured on device.

    ``fn`` must be a pure jax function of its args; a scalar carry is mixed
    into the first argument each iteration so no two iterations compute
    identical values, AND every execution gets a fresh scalar ``salt`` so
    no two *calls* are identical either.  Both matter on this relay TPU:
    without the salt, the timed call repeats the warm call bit-for-bit and
    the relay sometimes serves it from a result cache, reading ~0 ms
    (observed on the flash-attention sweep, docs/BENCH.md round-3 note).
    """

    def chained(n):
        @jax.jit
        def run(salt, *a):
            def body(i, carry):
                perturbed = jax.tree_util.tree_map(
                    lambda x: (x + carry * jnp.asarray(1e-9, x.dtype)
                               if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                               else x),
                    a[0])
                out = fn(perturbed, *a[1:])
                leaves = [l for l in jax.tree_util.tree_leaves(out)
                          if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)]
                return leaves[0].ravel()[0].astype(jnp.float32) if leaves else carry
            return jax.lax.fori_loop(0, n, body, salt * jnp.float32(1e-9))
        return run

    lo, hi = chained(warmup_iters), chained(warmup_iters + iters)
    float(lo(jnp.float32(1.0), *args))
    float(hi(jnp.float32(2.0), *args))
    t0 = time.perf_counter()
    float(lo(jnp.float32(3.0), *args))
    d_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(hi(jnp.float32(4.0), *args))
    d_hi = time.perf_counter() - t0
    return max((d_hi - d_lo) / iters, 1e-9)


def device_time_per_iter_state(step_fn: Callable, params, opt_state, batch,
                               rng, iters: int = 8,
                               warmup_iters: int = 2) -> Tuple[float, Any, Any]:
    """Chained-loop timing for ``step_fn(params, opt_state, batch, rng)
    -> (new_params, new_opt_state, metrics)`` where the fori_loop CARRIES
    the full (params, opt_state) through iterations.

    Two differences vs :func:`device_time_per_iter` that matter for
    models near the HBM ceiling (gpt2-xl class):

    * the loop carry lets XLA alias each iteration's param/opt buffers in
      place, so peak memory matches the donated training loop instead of
      holding pre- and post-step copies simultaneously;
    * the jitted runner donates its (params, opt_state) arguments and
      RETURNS the evolved state, which the caller feeds into the next
      timing call — at no point do two full copies of the state exist.

    Honesty guards: metrics["loss"] + metrics["grad_norm"] feed the
    scalar carry (grad_norm touches every gradient leaf), every updated
    leaf of the FINAL params is summed into the returned scalar (the
    in-loop iterations consume each other's params by construction; only
    the last iteration's update is DCE-able, and the final sum pins it),
    a fresh ``salt`` argument per execution keeps calls unique, and each
    timed call ends with a FRESH dependent dispatch (a reduce over a
    returned param leaf) — the relay has been observed acking even the
    scalar fetch of a donated call before execution finished, and worse,
    returning EQUAL walls for different loop lengths when two donated
    executables alternate (the round-4 gpt2-large row read 0.0 ms/step
    under two-length differencing).  Repeated SAME-executable calls with
    the dependent sync measure honestly (validated against throughput
    physics), so this timer runs ONE loop length three times and takes
    the median; the per-call relay RTT (~60 ms incl. the sync) is NOT
    differenced away — an overestimate bounded by RTT/iters (~2% at
    gpt2-large scale), the safe direction.

    Returns ``(seconds_per_iter, final_params, final_opt_state)`` — the
    caller's original params/opt_state buffers are donated away.
    """
    del warmup_iters  # one warm call compiles; loop length is fixed

    def chained(n):
        def run(salt, p, o, b, key):
            def body(i, carry):
                p, o, s = carry
                np_, no_, m = step_fn(p, o, b, jax.random.fold_in(key, i))
                # s (seeded from salt) mixes into the return so the jit
                # output genuinely depends on the per-call salt
                return (np_, no_,
                        s * jnp.float32(1e-9)
                        + (m["loss"] + m["grad_norm"]).astype(jnp.float32))
            p, o, s = jax.lax.fori_loop(
                0, n, body, (p, o, salt * jnp.float32(1e-9)))
            tot = sum(jnp.sum(x).astype(jnp.float32)
                      for x in jax.tree_util.tree_leaves(p)
                      if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating))
            return p, o, s + tot * jnp.float32(1e-20)
        return jax.jit(run, donate_argnums=(1, 2))

    def _sync(p, s):
        float(s)
        leaf = next(x for x in jax.tree_util.tree_leaves(p)
                    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating))
        return float(jnp.sum(leaf))

    runner = chained(iters)
    params, opt_state, s = runner(jnp.float32(1.0), params, opt_state,
                                  batch, rng)
    _sync(params, s)                      # compile + warm
    walls = []
    for j in range(3):
        t0 = time.perf_counter()
        params, opt_state, s = runner(jnp.float32(2.0 + j), params,
                                      opt_state, batch, rng)
        _sync(params, s)
        walls.append(time.perf_counter() - t0)
    per = sorted(walls)[1] / iters        # median of 3
    return max(per, 1e-9), params, opt_state


class StepTimer:
    """Rolling steps/sec + items/sec meter."""

    def __init__(self, window: int = 50):
        self.window = window
        self._t0 = time.perf_counter()
        self._steps = 0
        self._items = 0

    def step(self, items: int = 0) -> Optional[dict]:
        self._steps += 1
        self._items += items
        if self._steps >= self.window:
            dt = time.perf_counter() - self._t0
            out = {"steps_per_sec": self._steps / dt,
                   "items_per_sec": self._items / dt}
            self._t0 = time.perf_counter()
            self._steps = self._items = 0
            return out
        return None
