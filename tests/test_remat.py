"""Rematerialization: remat'd loss/grads must equal the non-remat ones."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loco_asr_tpu.models.speecht5 import model as st5
from loco_asr_tpu.models.speecht5.config import tiny_config


@pytest.mark.slow
def test_remat_grads_match():
    cfg = tiny_config(apply_spec_augment=False, mask_time_prob=0.0)
    params = st5.asr_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((2, 640)).astype(np.float32) * 0.1)
    mask = jnp.ones((2, 640), jnp.int32)
    labels = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 5)))

    def loss(p, remat):
        return st5.asr_loss(p, cfg, wav, mask, labels, deterministic=True,
                            remat=remat)[0]

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
