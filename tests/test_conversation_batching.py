"""Conversation carry-over inside the continuous batcher: slot =
conversation stream, the fusion LM's KV persists across that stream's
utterances (the serving form of the reference's conversation-stream
semantics, /root/reference/lms/src/utils.py:108-139; BASELINE config 5).

Equality contract: interleaved multi-conversation traffic through
``decode_conversations`` produces EXACTLY the tokens of each conversation
decoded alone sequentially with greedy_decode + ConversationContext
(decode/context.py) — including across the rolling-window refresh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loco_asr_tpu.decode import batcher
from loco_asr_tpu.decode.beam import greedy_decode
from loco_asr_tpu.decode.context import ConversationContext
from loco_asr_tpu.decode.fusion import FusionLM
from loco_asr_tpu.models.gpt2 import model as g
from loco_asr_tpu.models.speecht5 import model as st5
from loco_asr_tpu.models.speecht5.config import tiny_config

BUCKET = 3200


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = st5.asr_init(jax.random.PRNGKey(0), cfg)
    lm_cfg = g.tiny_gpt2_config(vocab_size=cfg.vocab_size, n_positions=64,
                                n_embd=16, n_head=2)
    fusion = FusionLM(g.gpt2_init(jax.random.PRNGKey(7), lm_cfg), lm_cfg,
                      weight=0.4)
    rng = np.random.default_rng(0)
    # 3 conversations x 2-3 utterances, varied lengths so slots interleave
    convs = []
    for c, lens in enumerate([[3200, 2400, 2800], [1600, 3200], [2800, 2400]]):
        wavs = [rng.standard_normal(n).astype(np.float32) * 0.1 for n in lens]
        convs.append((f"conv{c}", wavs))
    return cfg, params, fusion, convs


def sequential_reference(cfg, params, fusion, wavs, max_len,
                         max_positions=None, decode_reserve=None):
    """Each conversation decoded alone: greedy + ConversationContext(B=1)."""
    kw = {}
    if max_positions is not None:
        kw["max_positions"] = max_positions
    if decode_reserve is not None:
        kw["decode_reserve"] = decode_reserve
    ctx = ConversationContext(lm=fusion, batch=1, **kw)
    outs = []
    for wav in wavs:
        w = np.zeros((1, BUCKET), np.float32)
        w[0, : len(wav)] = wav
        m = np.zeros((1, BUCKET), np.int32)
        m[0, : len(wav)] = 1
        enc, mask = st5.encode_speech(params, cfg, jnp.asarray(w),
                                      jnp.asarray(m))
        cache, start = ctx.state()
        toks, lens, cache = greedy_decode(
            params, cfg, enc, mask, max_len=max_len, fusion=fusion,
            lm_cache=cache, lm_start=start, return_lm_cache=True)
        ctx.append(toks, lens, cache)
        outs.append((np.asarray(toks)[0], int(np.asarray(lens)[0])))
    return outs


@pytest.mark.slow
def test_carry_over_matches_sequential(setup):
    cfg, params, fusion, convs = setup
    max_len = 10
    results = batcher.decode_conversations(
        params, cfg, convs, fusion=fusion, slots=2, chunk_steps=4,
        max_len=max_len, audio_samples=BUCKET)
    assert set(results) == {c for c, _ in convs}
    for conv_id, wavs in convs:
        ref = sequential_reference(cfg, params, fusion, wavs, max_len)
        got = results[conv_id]
        assert len(got) == len(wavs), conv_id
        for u, ((g_toks, g_len), (r_toks, r_len)) in enumerate(zip(got, ref)):
            assert g_len == r_len, f"{conv_id} utt {u}"
            np.testing.assert_array_equal(g_toks, r_toks,
                                          err_msg=f"{conv_id} utt {u}")


@pytest.mark.slow
def test_carry_over_with_rolling_refresh(setup):
    """Conversations long enough to trigger the rolling-window refresh: the
    batcher's per-slot refresh must reproduce ConversationContext's
    drop-oldest-half + re-prime numerics."""
    cfg, params, fusion, convs = setup
    max_len = 10
    # n_positions=64; reserve 16 => refresh when a stream's history
    # exceeds 48 tokens (a few utterances in)
    kw = dict(max_positions=64, decode_reserve=16)
    results = batcher.decode_conversations(
        params, cfg, convs, fusion=fusion, slots=2, chunk_steps=3,
        max_len=max_len, audio_samples=BUCKET, **kw)
    for conv_id, wavs in convs:
        ref = sequential_reference(cfg, params, fusion, wavs, max_len, **kw)
        got = results[conv_id]
        for u, ((g_toks, g_len), (r_toks, r_len)) in enumerate(zip(got, ref)):
            assert g_len == r_len, f"{conv_id} utt {u}"
            np.testing.assert_array_equal(g_toks, r_toks,
                                          err_msg=f"{conv_id} utt {u}")


@pytest.mark.slow
def test_more_conversations_than_slots(setup):
    """Slots are reused across conversations; LM state must fully reset
    between the outgoing and incoming conversation in a slot."""
    cfg, params, fusion, convs = setup
    max_len = 8
    results = batcher.decode_conversations(
        params, cfg, convs, fusion=fusion, slots=1, chunk_steps=4,
        max_len=max_len, audio_samples=BUCKET)
    # slots=1 forces strict sequential reuse of one slot
    for conv_id, wavs in convs:
        ref = sequential_reference(cfg, params, fusion, wavs, max_len)
        got = results[conv_id]
        for u, ((g_toks, g_len), (r_toks, r_len)) in enumerate(zip(got, ref)):
            assert g_len == r_len, f"{conv_id} utt {u}"
            np.testing.assert_array_equal(g_toks, r_toks,
                                          err_msg=f"{conv_id} utt {u}")


def sequential_beam_reference(cfg, params, fusion, wavs, beam_size, max_len,
                              length_penalty=1.0, max_positions=None,
                              decode_reserve=None):
    """Each conversation decoded alone: beam + carry-over via
    beam_decode_with_context (the BASELINE configs 4+5 reference)."""
    from loco_asr_tpu.decode.context import beam_decode_with_context

    kw = {}
    if max_positions is not None:
        kw["max_positions"] = max_positions
    if decode_reserve is not None:
        kw["decode_reserve"] = decode_reserve
    ctx = ConversationContext(lm=fusion, batch=1, **kw)
    outs = []
    for wav in wavs:
        w = np.zeros((1, BUCKET), np.float32)
        w[0, : len(wav)] = wav
        m = np.zeros((1, BUCKET), np.int32)
        m[0, : len(wav)] = 1
        enc, mask = st5.encode_speech(params, cfg, jnp.asarray(w),
                                      jnp.asarray(m))
        hyp = beam_decode_with_context(
            params, cfg, enc, mask, ctx, beam_size=beam_size,
            max_len=max_len, length_penalty=length_penalty)
        outs.append((np.asarray(hyp.tokens)[0, 0],
                     int(np.asarray(hyp.lengths)[0, 0])))
    return outs


@pytest.mark.slow
def test_beam_carry_over_matches_sequential(setup):
    """decode_conversations(beam_size=2): interleaved beam conversation
    streams == each conversation decoded alone with
    beam_decode_with_context (beam + fusion + carry-over combined)."""
    cfg, params, fusion, convs = setup
    max_len, k = 10, 2
    results = batcher.decode_conversations(
        params, cfg, convs, fusion=fusion, slots=2, chunk_steps=4,
        max_len=max_len, beam_size=k, audio_samples=BUCKET)
    for conv_id, wavs in convs:
        ref = sequential_beam_reference(cfg, params, fusion, wavs, k, max_len)
        got = results[conv_id]
        assert len(got) == len(wavs), conv_id
        for u, ((g_toks, g_len), (r_toks, r_len)) in enumerate(zip(got, ref)):
            assert g_len == r_len, f"{conv_id} utt {u}"
            np.testing.assert_array_equal(g_toks, r_toks,
                                          err_msg=f"{conv_id} utt {u}")


@pytest.mark.slow
def test_beam_carry_over_with_rolling_refresh(setup):
    """Beam conversation streams across the rolling-window refresh: the
    per-slot drop-oldest-half + re-prime must reproduce
    ConversationContext's numerics under beam decoding too."""
    cfg, params, fusion, convs = setup
    max_len, k = 10, 2
    kw = dict(max_positions=64, decode_reserve=16)
    results = batcher.decode_conversations(
        params, cfg, convs, fusion=fusion, slots=2, chunk_steps=3,
        max_len=max_len, beam_size=k, audio_samples=BUCKET, **kw)
    for conv_id, wavs in convs:
        ref = sequential_beam_reference(cfg, params, fusion, wavs, k,
                                        max_len, **kw)
        got = results[conv_id]
        for u, ((g_toks, g_len), (r_toks, r_len)) in enumerate(zip(got, ref)):
            assert g_len == r_len, f"{conv_id} utt {u}"
            np.testing.assert_array_equal(g_toks, r_toks,
                                          err_msg=f"{conv_id} utt {u}")


def test_requires_fusion(setup):
    cfg, params, _, convs = setup
    with pytest.raises(ValueError, match="fusion"):
        batcher.decode_conversations(params, cfg, convs, fusion=None,
                                     slots=2, max_len=8,
                                     audio_samples=BUCKET)


@pytest.mark.slow
def test_decode_asr_conversation_cli(tmp_path, monkeypatch):
    """decode_asr --continuous --conversation: recording id = conversation
    stream; every utterance decodes and lands in hyp.text."""
    import os
    import wave

    from loco_asr_tpu.models.gpt2 import model as gg
    from loco_asr_tpu.pipelines import decode_asr
    from loco_asr_tpu.utils.checkpoint import save_npz

    rng = np.random.default_rng(0)
    root = tmp_path / "kaldi"
    root.mkdir()
    for rec, secs in [("rec1", 2.0), ("rec2", 1.5)]:
        pcm = (rng.standard_normal(int(16000 * secs)) * 3000).astype(np.int16)
        with wave.open(str(root / f"{rec}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
    (root / "text").write_text(
        "rec1-A-000000-000100 hello there\n"
        "rec1-A-000100-000200 how are you\n"
        "rec2-A-000000-000150 fine thanks\n")
    (root / "segments").write_text(
        "rec1-A-000000-000100 rec1 0.0 1.0\n"
        "rec1-A-000100-000200 rec1 1.0 2.0\n"
        "rec2-A-000000-000150 rec2 0.0 1.5\n")
    (root / "wav.scp").write_text(
        f"rec1 {root}/rec1.wav\nrec2 {root}/rec2.wav\n")

    # fusion LM checkpoint matching decode_asr's --conversation tiny config
    # (n_positions = max(4*(max_decode_len+8), 128))
    lm_cfg = gg.tiny_gpt2_config(vocab_size=256, n_embd=32, n_head=4,
                                 n_positions=128)
    lm_path = str(tmp_path / "lm.npz")
    save_npz(lm_path, gg.gpt2_init(jax.random.PRNGKey(3), lm_cfg))

    monkeypatch.chdir(tmp_path)
    rc = decode_asr.main([
        "--data_dir", str(root), "--out_dir", "exp/conv", "--tiny",
        "--beam_size", "1", "--max_decode_len", "8", "--batch_size", "2",
        "--max_seconds", "1.5", "--continuous", "--conversation",
        "--lm_checkpoint", lm_path])
    assert rc == 0
    lines = open("exp/conv/hyp.text").read().strip().splitlines()
    assert len(lines) == 3
    assert sorted(l.split()[0] for l in lines) == [
        "rec1-A-000000-000100", "rec1-A-000100-000200",
        "rec2-A-000000-000150"]
    assert os.path.exists("exp/conv/wer.json")

    # beam x conversation (BASELINE configs 4+5): same surface, K beams
    rc = decode_asr.main([
        "--data_dir", str(root), "--out_dir", "exp/convbeam", "--tiny",
        "--beam_size", "2", "--max_decode_len", "8", "--batch_size", "2",
        "--max_seconds", "1.5", "--continuous", "--conversation",
        "--lm_checkpoint", lm_path])
    assert rc == 0
    blines = open("exp/convbeam/hyp.text").read().strip().splitlines()
    assert sorted(l.split()[0] for l in blines) == sorted(
        l.split()[0] for l in lines)


def test_zero_utterance_conversation_and_reserve_validation(setup):
    """Regressions: a conversation with no utterances must yield an empty
    result list (not IndexError inside slot admission), and an oversized
    decode_reserve must error loudly instead of silently corrupting the
    LM context (negative rolling-window limit)."""
    cfg, params, fusion, convs = setup
    mixed = [("empty0", [])] + convs[:1] + [("empty1", [])]
    results = batcher.decode_conversations(
        params, cfg, mixed, fusion=fusion, slots=2, chunk_steps=4,
        max_len=10, audio_samples=BUCKET)
    assert results["empty0"] == [] and results["empty1"] == []
    assert len(results[convs[0][0]]) == len(convs[0][1])

    with pytest.raises(ValueError, match="max_positions"):
        # an utterance longer than the LM window can never be scored —
        # its KV writes would silently fall past the cache
        batcher.decode_conversations(
            params, cfg, convs, fusion=fusion, slots=2, chunk_steps=4,
            max_len=fusion.cfg.n_positions, audio_samples=BUCKET,
            decode_reserve=fusion.cfg.n_positions + 1)
