"""Debug utilities + framework determinism guarantees."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loco_asr_tpu.utils.debugging import (assert_all_finite, check_deterministic,
                                          nan_checks)


def test_assert_all_finite():
    assert_all_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        assert_all_finite({"a": jnp.asarray([1.0, np.nan])})


def test_nan_checks_context():
    with nan_checks():
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: x / 0.0 * 0.0)(jnp.float32(0.0)).block_until_ready()
    # restored afterwards: silent NaN
    out = jax.jit(lambda x: x / 0.0 * 0.0)(jnp.float32(0.0))
    assert np.isnan(float(out))


def test_model_forwards_deterministic():
    """Same inputs + same explicit rng => bit-identical outputs, for the
    encoder (with SpecAugment rng) and the training step."""
    from loco_asr_tpu.models.speecht5 import model as st5
    from loco_asr_tpu.models.speecht5.config import tiny_config

    cfg = tiny_config()
    params = st5.asr_init(jax.random.PRNGKey(0), cfg)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((2, 640)).astype(np.float32))
    rng = jax.random.PRNGKey(7)

    fwd = jax.jit(lambda p, w, r: st5.encode_speech(
        p, cfg, w, deterministic=False, rng=r)[0])
    assert check_deterministic(lambda: fwd(params, wav, rng))


@pytest.mark.slow
def test_dropout_rng_changes_output():
    from loco_asr_tpu.models.speecht5 import model as st5
    from loco_asr_tpu.models.speecht5.config import tiny_config

    cfg = tiny_config(mask_time_prob=0.5, mask_time_length=2)
    params = st5.asr_init(jax.random.PRNGKey(0), cfg)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((2, 640)).astype(np.float32))
    a = st5.encode_speech(params, cfg, wav, deterministic=False,
                          rng=jax.random.PRNGKey(1))[0]
    b = st5.encode_speech(params, cfg, wav, deterministic=False,
                          rng=jax.random.PRNGKey(2))[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))
