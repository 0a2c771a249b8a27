"""Test configuration: force CPU with a virtual 8-device mesh so sharding
and collective paths are exercised without TPU hardware (SURVEY.md §4).

Note: the environment pre-registers a TPU PJRT plugin that ignores the
JAX_PLATFORMS env var, so we must set the platform through jax.config
before any backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Parity tests compare against torch fp32; keep MXU-style bf16 out of tests.
jax.config.update("jax_default_matmul_precision", "highest")


import pytest


@pytest.fixture(autouse=True)
def _restore_prng_impl():
    """Trainer mains call pipelines.common.setup_rng_impl (process-global
    jax config); restore it so a train test can't leak 'rbg' into later
    tests whose pinned values assume threefry init."""
    old = jax.config.jax_default_prng_impl
    yield
    if jax.config.jax_default_prng_impl != old:
        jax.config.update("jax_default_prng_impl", old)
