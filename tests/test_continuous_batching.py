"""Continuous-batching decode (decode/batcher.py): slot-level admission
with per-stream cache offsets must reproduce per-utterance greedy decode
exactly, while running fewer total device steps than static batching."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loco_asr_tpu.decode import batcher
from loco_asr_tpu.decode.beam import greedy_decode
from loco_asr_tpu.models.speecht5 import model as st5
from loco_asr_tpu.models.speecht5.config import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = st5.asr_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    # varied lengths so slots retire at different times
    utts = [(f"utt{i}", rng.standard_normal(n).astype(np.float32) * 0.1)
            for i, n in enumerate([3200, 2400, 3200, 1600, 2800, 3200])]
    return cfg, params, utts


def reference_tokens(cfg, params, wav, audio_samples, max_len):
    w = np.zeros((1, audio_samples), np.float32)
    w[0, : len(wav)] = wav
    m = np.zeros((1, audio_samples), np.int32)
    m[0, : len(wav)] = 1
    enc, mask = st5.encode_speech(params, cfg, jnp.asarray(w), jnp.asarray(m))
    toks, lens = greedy_decode(params, cfg, enc, mask, max_len=max_len)
    return np.asarray(toks)[0], int(np.asarray(lens)[0])


@pytest.mark.slow
def test_matches_per_utterance_greedy(setup):
    cfg, params, utts = setup
    max_len, bucket = 12, 3200
    results = batcher.decode_continuous(
        params, cfg, utts, slots=2, chunk_steps=4, max_len=max_len,
        audio_samples=bucket)
    assert set(results) == {u for u, _ in utts}
    for uid, wav in utts:
        ref_toks, ref_len = reference_tokens(cfg, params, wav, bucket, max_len)
        toks, length = results[uid]
        assert length == ref_len, uid
        np.testing.assert_array_equal(toks, ref_toks, err_msg=uid)


def test_more_utterances_than_slots_all_complete(setup):
    cfg, params, utts = setup
    results = batcher.decode_continuous(
        params, cfg, utts, slots=3, chunk_steps=3, max_len=8,
        audio_samples=3200)
    assert len(results) == len(utts)
    for toks, length in results.values():
        assert toks.shape == (8,)
        assert 0 < length <= 8


def test_per_stream_cache_index_matches_scalar():
    """The vector cache_index path (the batcher's substrate) must equal the
    scalar path when all offsets agree."""
    from loco_asr_tpu.models.speecht5 import decoder as dec

    cfg = tiny_config()
    params = st5.asr_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    enc = jnp.asarray(rng.standard_normal((2, 5, cfg.hidden_size))
                      .astype(np.float32))
    mask = jnp.ones((2, 5), jnp.int32)
    tok = jnp.asarray([[7], [9]], jnp.int32)

    c1 = dec.init_decode_cache(cfg, 2, 6)
    c2 = dec.init_decode_cache(cfg, 2, 6)
    for t in range(3):
        l1, c1 = st5.asr_decode_step(params, cfg, tok, jnp.int32(t),
                                     enc, mask, c1)
        l2, c2 = st5.asr_decode_step(params, cfg, tok,
                                     jnp.full((2,), t, jnp.int32),
                                     enc, mask, c2)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=1e-6, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(c1),
                    jax.tree_util.tree_leaves(c2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_beam_continuous_matches_per_utterance_beam(setup):
    """Beam-mode continuous batching == per-utterance beam_search (top
    hypothesis tokens and length), across slot refills."""
    from loco_asr_tpu.decode.beam import beam_search

    cfg, params, utts = setup
    max_len, bucket, k = 10, 3200, 3
    results = batcher.decode_continuous_beam(
        params, cfg, utts, slots=2, beam_size=k, chunk_steps=4,
        max_len=max_len, audio_samples=bucket)
    assert set(results) == {u for u, _ in utts}
    for uid, wav in utts:
        w = np.zeros((1, bucket), np.float32)
        w[0, : len(wav)] = wav
        m = np.zeros((1, bucket), np.int32)
        m[0, : len(wav)] = 1
        enc, mask = st5.encode_speech(params, cfg, jnp.asarray(w),
                                      jnp.asarray(m))
        hyp = beam_search(params, cfg, enc, mask, beam_size=k,
                          max_len=max_len)
        toks, length = results[uid]
        assert length == int(np.asarray(hyp.lengths)[0, 0]), uid
        np.testing.assert_array_equal(
            toks, np.asarray(hyp.tokens)[0, 0], err_msg=uid)


@pytest.mark.slow
def test_fusion_continuous_matches_per_utterance(setup):
    """Continuous batching with an LM fusion scorer == per-utterance
    greedy_decode(fusion=...) — the per-slot LM cache offsets must track
    the decoder's."""
    from loco_asr_tpu.decode.fusion import FusionLM
    from loco_asr_tpu.models.gpt2 import model as g

    cfg, params, utts = setup
    lm_cfg = g.tiny_gpt2_config(vocab_size=cfg.vocab_size, n_positions=32,
                                n_embd=16, n_head=2)
    fusion = FusionLM(g.gpt2_init(jax.random.PRNGKey(7), lm_cfg), lm_cfg,
                      weight=0.4)
    max_len, bucket = 10, 3200
    results = batcher.decode_continuous(
        params, cfg, utts, slots=2, chunk_steps=4, max_len=max_len,
        audio_samples=bucket, fusion=fusion)
    assert set(results) == {u for u, _ in utts}
    for uid, wav in utts:
        w = np.zeros((1, bucket), np.float32)
        w[0, : len(wav)] = wav
        m = np.zeros((1, bucket), np.int32)
        m[0, : len(wav)] = 1
        enc, mask = st5.encode_speech(params, cfg, jnp.asarray(w),
                                      jnp.asarray(m))
        toks, lens = greedy_decode(params, cfg, enc, mask, max_len=max_len,
                                   fusion=fusion)
        got_toks, got_len = results[uid]
        assert got_len == int(np.asarray(lens)[0]), uid
        np.testing.assert_array_equal(got_toks, np.asarray(toks)[0],
                                      err_msg=uid)


@pytest.mark.slow
def test_beam_fusion_continuous_matches_per_utterance(setup):
    """Beam + LM fusion in the continuous batcher == per-utterance
    beam_search(fusion=...) — the beam-flat LM cache must reorder by
    parent beam in lockstep with the decoder cache."""
    from loco_asr_tpu.decode.beam import beam_search
    from loco_asr_tpu.decode.fusion import FusionLM
    from loco_asr_tpu.models.gpt2 import model as g

    cfg, params, utts = setup
    lm_cfg = g.tiny_gpt2_config(vocab_size=cfg.vocab_size, n_positions=32,
                                n_embd=16, n_head=2)
    fusion = FusionLM(g.gpt2_init(jax.random.PRNGKey(9), lm_cfg), lm_cfg,
                      weight=0.5)
    max_len, bucket, k = 9, 3200, 2
    results = batcher.decode_continuous_beam(
        params, cfg, utts, slots=2, beam_size=k, chunk_steps=3,
        max_len=max_len, audio_samples=bucket, fusion=fusion)
    assert set(results) == {u for u, _ in utts}
    for uid, wav in utts:
        w = np.zeros((1, bucket), np.float32)
        w[0, : len(wav)] = wav
        m = np.zeros((1, bucket), np.int32)
        m[0, : len(wav)] = 1
        enc, mask = st5.encode_speech(params, cfg, jnp.asarray(w),
                                      jnp.asarray(m))
        hyp = beam_search(params, cfg, enc, mask, beam_size=k,
                          max_len=max_len, fusion=fusion)
        toks, length = results[uid]
        assert length == int(np.asarray(hyp.lengths)[0, 0]), uid
        np.testing.assert_array_equal(
            toks, np.asarray(hyp.tokens)[0, 0], err_msg=uid)
