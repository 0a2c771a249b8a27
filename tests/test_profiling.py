"""Profiling utilities."""

import numpy as np

import jax.numpy as jnp

from loco_asr_tpu.utils.profiling import StepTimer, device_time_per_iter


def test_device_time_per_iter_positive():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((256, 256)).astype(np.float32))

    def fn(a):
        return jnp.tanh(a @ a)

    dt = device_time_per_iter(fn, x, iters=5, warmup_iters=1)
    assert dt > 0


def test_step_timer_window():
    t = StepTimer(window=3)
    assert t.step(4) is None
    assert t.step(4) is None
    out = t.step(4)
    assert out is not None and out["items_per_sec"] > 0
