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
