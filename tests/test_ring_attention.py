"""Ring attention over the virtual 8-device mesh == dense attention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from loco_asr_tpu.parallel.ring_attention import ring_attention


@pytest.fixture(scope="module")
def mesh_sp():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("sp",))


def _dense(q, k, v, causal):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if causal:
        t = q.shape[2]
        mask = jnp.arange(t)[None, :] <= jnp.arange(t)[:, None]
        s = jnp.where(mask[None, None], s, -1e30)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1),
                      v.astype(jnp.float32)).astype(q.dtype)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_dense(mesh_sp, causal):
    rng = np.random.default_rng(0)
    shape = (2, 3, 64, 16)  # T=64 over 8 devices -> 8 per shard
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    want = _dense(q, k, v, causal)
    got = ring_attention(q, k, v, mesh=mesh_sp, axis_name="sp", causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_ring_rejects_indivisible(mesh_sp):
    q = jnp.zeros((1, 1, 60, 8))
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q, q, q, mesh=mesh_sp, axis_name="sp")


def test_ring_long_context_memory_shape(mesh_sp):
    """Longer-than-single-chip-style run: just exercises the loop at a
    length where dense scores would be 64x the shard memory."""
    rng = np.random.default_rng(1)
    shape = (1, 2, 512, 16)
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    out = ring_attention(q, q, q, mesh=mesh_sp, axis_name="sp", causal=True)
    assert out.shape == shape
    assert bool(jnp.isfinite(out).all())
