"""Podcast/long-audio path: manifest IO, energy segmentation, episode
transcription with conversation carry-over."""

import json

import numpy as np
import pytest

import jax

from loco_asr_tpu.data import podcasts
from loco_asr_tpu.decode.long_audio import transcribe_long_audio
from loco_asr_tpu.decode.fusion import FusionLM
from loco_asr_tpu.models.gpt2 import model as g
from loco_asr_tpu.models.speecht5 import model as st5
from loco_asr_tpu.models.speecht5.config import tiny_config


def test_manifest_roundtrip(tmp_path):
    eps = [podcasts.Episode("ep1", str(tmp_path / "a.wav"), duration=10.0,
                            segments=[podcasts.EpisodeSegment(0.0, 2.5, "hi")])]
    p = str(tmp_path / "manifest.jsonl")
    podcasts.write_manifest(p, eps)
    back = podcasts.load_manifest(p)
    assert back[0].episode_id == "ep1"
    assert back[0].segments[0].end == 2.5


def test_stream_windows():
    wav = np.arange(100000, dtype=np.float32)
    wins = list(podcasts.stream_windows(wav, 16000, window_seconds=2.0,
                                        hop_seconds=1.0))
    assert wins[0][0] == 0.0 and len(wins[0][1]) == 32000
    assert wins[1][0] == 1.0
    # windows cover the tail
    last_start, last = wins[-1]
    assert int(last_start * 16000) + len(last) == 100000


def test_segment_by_energy():
    sr = 16000
    rng = np.random.default_rng(0)
    sil = np.zeros(sr // 2, np.float32)
    speech = (rng.standard_normal(sr) * 0.3).astype(np.float32)
    wav = np.concatenate([sil, speech, sil, speech, sil])
    segs = podcasts.segment_by_energy(wav, sr, min_gap_s=0.2)
    assert len(segs) == 2
    (s1, e1), (s2, e2) = segs
    assert abs(s1 - 0.5) < 0.1 and abs(e1 - 1.5) < 0.1
    assert abs(s2 - 2.0) < 0.1


def test_segment_splits_long_runs():
    sr = 1000
    wav = np.ones(sr * 7, np.float32)
    segs = podcasts.segment_by_energy(wav, sr, max_segment_s=2.0)
    assert all(e - s <= 2.0 + 1e-6 for s, e in segs)
    assert abs(segs[-1][1] - 7.0) < 0.05


@pytest.mark.slow
def test_transcribe_episodes_cli(tmp_path, monkeypatch):
    import wave

    from loco_asr_tpu.pipelines import transcribe_episodes

    rng = np.random.default_rng(5)
    sr = 16000
    sil = np.zeros(sr // 2, np.float32)
    sp = (rng.standard_normal(sr // 2) * 0.3).astype(np.float32)
    wav = np.concatenate([sil, sp, sil])
    pcm = (wav * 30000).astype(np.int16)
    audio_path = tmp_path / "ep1.wav"
    with wave.open(str(audio_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    podcasts.write_manifest(str(tmp_path / "manifest.jsonl"), [
        podcasts.Episode("ep1", str(audio_path), duration=1.5)])

    monkeypatch.chdir(tmp_path)
    rc = transcribe_episodes.main([
        "--manifest", str(tmp_path / "manifest.jsonl"),
        "--out_dir", "out", "--tiny", "--max_decode_len", "6"])
    assert rc == 0
    import json as _json

    lines = [_json.loads(l) for l in open("out/ep1.jsonl")]
    assert lines and all("start" in l and "token_ids" in l for l in lines)


@pytest.mark.slow
def test_transcribe_long_audio_with_context():
    cfg = tiny_config(apply_spec_augment=False, mask_time_prob=0.0)
    params = st5.asr_init(jax.random.PRNGKey(0), cfg)
    lm_cfg = g.tiny_gpt2_config(vocab_size=cfg.vocab_size, n_positions=128)
    lm = FusionLM(g.gpt2_init(jax.random.PRNGKey(1), lm_cfg), lm_cfg, weight=0.5)

    sr = 16000
    rng = np.random.default_rng(2)
    sil = np.zeros(sr // 2, np.float32)
    sp = lambda: (rng.standard_normal(sr // 2) * 0.3).astype(np.float32)
    wav = np.concatenate([sil, sp(), sil, sp(), sil])

    segs = transcribe_long_audio(params, cfg, wav, sr, fusion=lm,
                                 max_decode_len=6)
    assert len(segs) == 2
    for s in segs:
        assert s.end > s.start
        assert all(isinstance(t, int) for t in s.token_ids)


@pytest.mark.slow
def test_transcribe_long_audio_flash_matches_dense():
    """attn_impl='flash' (banded rel-pos kernel, interpret mode on CPU)
    must transcribe identically to the dense encoder."""
    cfg = tiny_config(apply_spec_augment=False, mask_time_prob=0.0)
    params = st5.asr_init(jax.random.PRNGKey(0), cfg)

    sr = 16000
    rng = np.random.default_rng(3)
    sil = np.zeros(sr // 2, np.float32)
    sp = lambda: (rng.standard_normal(sr // 2) * 0.3).astype(np.float32)
    wav = np.concatenate([sil, sp(), sil, sp(), sil])

    dense = transcribe_long_audio(params, cfg, wav, sr, max_decode_len=6)
    flash = transcribe_long_audio(params, cfg, wav, sr, max_decode_len=6,
                                  attn_impl="flash")
    assert [s.token_ids for s in flash] == [s.token_ids for s in dense]
