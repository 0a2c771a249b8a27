"""Ulysses (head-scatter all-to-all) sequence parallelism == dense
attention, mirroring the ring-attention contract tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from loco_asr_tpu.parallel.ulysses import ulysses_attention


@pytest.fixture(scope="module")
def mesh2():
    return Mesh(np.array(jax.devices()[:2]), ("sp",))


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
def test_ulysses_matches_dense(mesh2, causal):
    rng = np.random.default_rng(0)
    shape = (2, 4, 32, 8)   # 4 heads over 2 devices, T=32 -> 16 per shard
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    want = _dense(q, k, v, causal)
    got = ulysses_attention(q, k, v, mesh=mesh2, axis_name="sp",
                            causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_ulysses_rejects_indivisible_heads(mesh2):
    q = jnp.zeros((1, 3, 32, 8))  # 3 heads, 2 devices
    with pytest.raises(ValueError, match="heads"):
        ulysses_attention(q, q, q, mesh=mesh2, axis_name="sp")


def test_ulysses_rel_pe_and_padding_match_dense(mesh2):
    """SpeechT5 semantics: global-distance rel-pos + right-pad masking."""
    rng = np.random.default_rng(2)
    b, h, t, d, L = 2, 2, 32, 8, 5
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    pe = jnp.asarray(rng.standard_normal((2 * L, d)).astype(np.float32))
    valid = jnp.asarray([t, t - 7], jnp.int32)

    scale = d ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    idx = jnp.clip(jnp.arange(t)[:, None] - jnp.arange(t)[None, :],
                   -L, L - 1) + L
    qpe = jnp.einsum("bhid,md->bhim", q, pe) * scale
    s = s + jnp.take_along_axis(qpe, jnp.broadcast_to(idx, (b, h, t, t)), -1)
    pad = jnp.arange(t)[None, :] < valid[:, None]
    s = jnp.where(pad[:, None, None, :], s, -1e30)
    want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1),
                      v.astype(jnp.float32))

    got = ulysses_attention(q, k, v, mesh=mesh2, axis_name="sp",
                            causal=False, rel_pe=pe, rel_max=L,
                            kv_valid_len=valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_gpt2_ulysses_nll_equals_single_device(mesh2):
    """eval_ppl --sequence_parallel N --sp_impl ulysses contract."""
    from loco_asr_tpu.models.gpt2 import model as g

    cfg = g.tiny_gpt2_config(n_positions=64, n_embd=32, n_head=4)
    params = g.gpt2_init(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(3).integers(
        0, cfg.vocab_size, (2, 64)))

    want = g.token_nll(g.gpt2_logits(params, cfg, ids)[0], ids)
    got = g.token_nll(g.gpt2_logits(params, cfg, ids, attn_impl="ulysses",
                                    ring=(mesh2, "sp"))[0], ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_encoder_ulysses_matches_dense(mesh2):
    """SpeechT5 encoder with attn_impl='ulysses' == dense rel-pos encoder
    under a ragged padding mask."""
    from loco_asr_tpu.models.speecht5 import encoder as enc
    from loco_asr_tpu.models.speecht5.config import tiny_config

    cfg = tiny_config(hidden_size=32, encoder_attention_heads=4,
                      encoder_ffn_dim=64, apply_spec_augment=False)
    params = enc.encoder_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 32, 32)).astype(np.float32))
    mask = jnp.asarray([[1] * 32, [1] * 20 + [0] * 12], jnp.int32)

    want = enc.encoder(params, cfg, x, mask)
    got = enc.encoder(params, cfg, x, mask, attn_impl="ulysses",
                      ring=(mesh2, "sp"))
    m = np.asarray(mask)[..., None].astype(bool)
    np.testing.assert_allclose(np.asarray(got) * m, np.asarray(want) * m,
                               atol=2e-5, rtol=2e-5)
