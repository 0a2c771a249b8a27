"""Fused conv1+instance-norm+GELU kernel == the XLA reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loco_asr_tpu.ops import layers
from loco_asr_tpu.ops.pallas.conv_frontend import conv1_instance_norm_gelu


def _reference(wav, weight, scale, bias, stride=5):
    x = wav[:, None, :]
    y = jax.lax.conv_general_dilated(
        x, weight, (stride,), [(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    y = layers.group_norm({"scale": scale, "bias": bias}, y,
                          num_groups=weight.shape[0])
    return layers.gelu(y)


@pytest.mark.parametrize("t,chunk", [(8000, 256), (5003, 128)])
def test_fused_frontend_matches_reference(t, chunk):
    rng = np.random.default_rng(0)
    c = 32
    wav = jnp.asarray(rng.standard_normal((2, t)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.standard_normal((c, 1, 10)).astype(np.float32) * 0.3)
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.2 + 1.0)
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)

    want = np.asarray(_reference(wav, w, scale, bias))
    got = np.asarray(conv1_instance_norm_gelu(wav, w, scale, bias,
                                              chunk_frames=chunk,
                                              interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_fused_frontend_rejects_bad_geometry():
    with pytest.raises(ValueError, match="2\\*stride"):
        conv1_instance_norm_gelu(jnp.zeros((1, 100)), jnp.zeros((4, 1, 8)),
                                 jnp.ones(4), jnp.zeros(4), interpret=True)
