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


@pytest.fixture(scope="module")
def mesh2():
    return Mesh(np.array(jax.devices()[:2]), ("sp",))


def test_ring_rel_pe_and_padding_match_dense(mesh2):
    """SpeechT5 semantics: rel-pos bias over GLOBAL distances + right-pad
    key masking, vs the dense rel-pos reference in ops.attention."""
    from loco_asr_tpu.ops import attention as att

    rng = np.random.default_rng(2)
    b, h, t, d, L = 2, 2, 32, 8, 5
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    pe = jnp.asarray(rng.standard_normal((2 * L, d)).astype(np.float32))
    valid = jnp.asarray([t, t - 7], jnp.int32)

    # dense oracle with the same factorized rel term + key padding
    scale = d ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    idx = jnp.clip(jnp.arange(t)[:, None] - jnp.arange(t)[None, :], -L, L - 1) + L
    qpe = jnp.einsum("bhid,md->bhim", q, pe) * scale
    s = s + jnp.take_along_axis(qpe, jnp.broadcast_to(idx, (b, h, t, t)), -1)
    pad = jnp.arange(t)[None, :] < valid[:, None]
    s = jnp.where(pad[:, None, None, :], s, -1e30)
    want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1),
                      v.astype(jnp.float32))

    got = ring_attention(q, k, v, mesh=mesh2, axis_name="sp", causal=False,
                         rel_pe=pe, rel_max=L, kv_valid_len=valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_gpt2_ring_nll_equals_single_device(mesh2):
    """Sequence-parallel GPT-2 scoring == single-device NLLs (the eval_ppl
    --sequence_parallel contract)."""
    from loco_asr_tpu.models.gpt2 import model as g

    cfg = g.tiny_gpt2_config(n_positions=64, n_embd=32, n_head=4)
    params = g.gpt2_init(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(3).integers(
        0, cfg.vocab_size, (2, 64)))

    want = g.token_nll(g.gpt2_logits(params, cfg, ids)[0], ids)
    got = g.token_nll(g.gpt2_logits(params, cfg, ids, attn_impl="ring",
                                    ring=(mesh2, "sp"))[0], ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_encoder_ring_matches_dense(mesh2):
    """SpeechT5 encoder with attn_impl='ring' == dense rel-pos encoder,
    including a ragged padding mask."""
    from loco_asr_tpu.models.speecht5 import encoder as enc
    from loco_asr_tpu.models.speecht5.config import tiny_config

    cfg = tiny_config(hidden_size=32, encoder_attention_heads=4,
                      encoder_ffn_dim=64, apply_spec_augment=False)
    params = enc.encoder_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 32, 32)).astype(np.float32))
    mask = jnp.asarray([[1] * 32, [1] * 20 + [0] * 12], jnp.int32)

    want = enc.encoder(params, cfg, x, mask)
    got = enc.encoder(params, cfg, x, mask, attn_impl="ring",
                      ring=(mesh2, "sp"))
    # padded positions carry garbage in both; compare valid ones
    m = np.asarray(mask)[..., None].astype(bool)
    np.testing.assert_allclose(np.asarray(got) * m, np.asarray(want) * m,
                               atol=2e-5, rtol=2e-5)
