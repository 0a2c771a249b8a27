"""Unit tests for ops/attention helpers (masks, rel-pos table, KV update)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loco_asr_tpu.ops import attention


def test_causal_bias_offset():
    b = np.asarray(attention.causal_attention_bias(2, 5, offset=3))[0, 0]
    # query rows are global positions 3 and 4
    assert (b[0, :4] == 0).all() and b[0, 4] < -1e8
    assert (b[1] == 0).all()


def test_padding_bias():
    mask = jnp.asarray([[1, 1, 0]])
    b = np.asarray(attention.padding_attention_bias(mask))[0, 0, 0]
    assert b[0] == 0 and b[1] == 0 and b[2] < -1e8


def test_relative_position_bias_clipping():
    table = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(6, 4)  # max_len 3
    pe = np.asarray(attention.relative_position_bias_table(table, 5, 3))
    # HF convention: distance i - j, clipped to [-3, 2], offset by 3
    assert pe.shape == (5, 5, 4)
    np.testing.assert_array_equal(pe[0, 4], np.asarray(table[0]))   # -4 -> clip -3 -> idx 0
    np.testing.assert_array_equal(pe[4, 0], np.asarray(table[5]))   # +4 -> clip +2 -> idx 5
    np.testing.assert_array_equal(pe[2, 2], np.asarray(table[3]))   # 0 -> idx 3


def test_kv_cache_update_and_masking():
    rng = jax.random.PRNGKey(0)
    p = attention.mha_init(rng, 8)
    x1 = jnp.ones((1, 2, 8))
    cache = {"k": jnp.zeros((1, 2, 6, 4)), "v": jnp.zeros((1, 2, 6, 4))}
    out, cache = attention.multi_head_attention(
        p, x1, num_heads=2, kv_cache=cache, cache_index=jnp.int32(0))
    assert cache["k"].shape == (1, 2, 6, 4)
    # positions 0-1 written, rest still zero
    assert not np.allclose(np.asarray(cache["k"][:, :, :2]), 0.0)
    np.testing.assert_array_equal(np.asarray(cache["k"][:, :, 2:]), 0.0)

    # second write lands at the cache index
    out2, cache2 = attention.multi_head_attention(
        p, x1 * 2, num_heads=2, kv_cache=cache, cache_index=jnp.int32(2))
    assert not np.allclose(np.asarray(cache2["k"][:, :, 2:4]), 0.0)


def test_mha_cross_attention_shapes():
    rng = jax.random.PRNGKey(1)
    p = attention.mha_init(rng, 8)
    q = jnp.ones((2, 3, 8))
    kv = jnp.ones((2, 7, 8))
    out, _ = attention.multi_head_attention(p, q, num_heads=2,
                                            key_value_states=kv)
    assert out.shape == (2, 3, 8)


def test_rel_pe_factorized_matches_position_bias():
    """The qpe + Toeplitz-gather rel path must equal the literal HF
    position_bias einsum (same math, no [T,T,head_dim] tensor)."""
    from loco_asr_tpu.ops import attention, layers

    rng = jax.random.PRNGKey(0)
    b, t, d, h, L = 2, 96, 64, 4, 20
    params = attention.mha_init(rng, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d)) * 0.3
    pe = jax.random.normal(jax.random.PRNGKey(2), (2 * L, d // h)) * 0.3
    mask = jnp.asarray(np.array([[1] * t, [1] * 70 + [0] * (t - 70)]))
    bias = attention.padding_attention_bias(mask)

    pos_bias = attention.relative_position_bias_table(pe, t, L)
    out_old, _ = attention.multi_head_attention(
        params, x, num_heads=h, attention_bias=bias, position_bias=pos_bias)
    out_new, _ = attention.multi_head_attention(
        params, x, num_heads=h, attention_bias=bias, rel_pe=pe, rel_max=L)
    np.testing.assert_allclose(np.asarray(out_old), np.asarray(out_new),
                               atol=1e-5, rtol=1e-5)


def test_mha_flash_matches_dense_rel():
    """attn_impl='flash' (Pallas banded kernel) == dense rel path, with a
    right-padded batch."""
    from loco_asr_tpu.ops import attention

    rng = jax.random.PRNGKey(0)
    b, t, d, h, L = 2, 160, 64, 4, 20
    params = attention.mha_init(rng, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d)) * 0.3
    pe = jax.random.normal(jax.random.PRNGKey(2), (2 * L, d // h)) * 0.3
    valid = np.array([t, 101], np.int32)
    mask = jnp.asarray((np.arange(t)[None, :] < valid[:, None]).astype(np.int32))
    bias = attention.padding_attention_bias(mask)

    out_dense, _ = attention.multi_head_attention(
        params, x, num_heads=h, attention_bias=bias, rel_pe=pe, rel_max=L)
    out_flash, _ = attention.multi_head_attention(
        params, x, num_heads=h, rel_pe=pe, rel_max=L,
        kv_valid_len=jnp.asarray(valid), attn_impl="flash")
    # valid rows must agree; padded rows differ (flash keeps them unmasked
    # as queries, dense too — both attend only valid keys) — compare all.
    np.testing.assert_allclose(np.asarray(out_dense), np.asarray(out_flash),
                               atol=1e-5, rtol=1e-5)


def test_encoder_flash_matches_dense():
    """Full SpeechT5 encoder: attn_impl flash == dense on a padded batch."""
    from loco_asr_tpu.models.speecht5 import encoder as enc
    from loco_asr_tpu.models.speecht5.config import SpeechT5Config

    cfg = SpeechT5Config(hidden_size=64, encoder_layers=2,
                         encoder_attention_heads=4, encoder_ffn_dim=128,
                         encoder_max_relative_position=20)
    params = enc.encoder_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 96, 64)) * 0.3
    valid = np.array([96, 57], np.int32)
    mask = jnp.asarray((np.arange(96)[None, :] < valid[:, None]).astype(np.int32))

    out_dense = enc.encoder(params, cfg, x, mask)
    out_flash = enc.encoder(params, cfg, x, mask, attn_impl="flash")
    np.testing.assert_allclose(np.asarray(out_dense), np.asarray(out_flash),
                               atol=2e-5, rtol=1e-4)
