"""Batched multi-episode transcription (transcribe_episodes --continuous):
every episode is a conversation stream in the continuous batcher, decoded
concurrently, with per-episode WER scored against manifest segment texts
(VERDICT r2 item 10)."""

import json
import wave

import numpy as np
import pytest

from loco_asr_tpu.data import podcasts

pytestmark = pytest.mark.slow  # heavy tier: full pipeline drives / virtual-mesh collectives


@pytest.fixture(scope="module")
def manifest(tmp_path_factory):
    root = tmp_path_factory.mktemp("episodes")
    rng = np.random.default_rng(5)
    sr = 16000
    eps = []
    for e, n_segs in enumerate([3, 2]):
        parts, segments, t = [], [], 0.0
        for s in range(n_segs):
            sil = np.zeros(sr // 4, np.float32)
            sp = (rng.standard_normal(sr // 2) * 0.3).astype(np.float32)
            parts += [sil, sp]
            start = t + 0.25
            segments.append(podcasts.EpisodeSegment(start, start + 0.5,
                                                    f"ref text {e} {s}"))
            t += 0.75
        parts.append(np.zeros(sr // 4, np.float32))
        wav = np.concatenate(parts)
        pcm = (wav * 30000).astype(np.int16)
        path = root / f"ep{e}.wav"
        with wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
        eps.append(podcasts.Episode(f"ep{e}", str(path),
                                    duration=t + 0.25, segments=segments))
    mpath = str(root / "manifest.jsonl")
    podcasts.write_manifest(mpath, eps)
    return mpath


def _check_outputs(out_dir, n_segments_by_ep):
    for ep, n in n_segments_by_ep.items():
        lines = [json.loads(l) for l in open(f"{out_dir}/{ep}.jsonl")]
        assert len(lines) == n, (ep, len(lines))
        assert all("start" in l and "token_ids" in l for l in lines)
    rows = [json.loads(l) for l in open(f"{out_dir}/metrics.jsonl")]
    by_ep = {r["episode"]: r for r in rows if "episode" in r}
    assert set(by_ep) == set(n_segments_by_ep)
    return by_ep


def test_episodes_continuous_no_lm(manifest, tmp_path, monkeypatch):
    from loco_asr_tpu.pipelines import transcribe_episodes

    monkeypatch.chdir(tmp_path)
    rc = transcribe_episodes.main([
        "--manifest", manifest, "--out_dir", "out", "--tiny",
        "--max_decode_len", "6", "--batch_seconds", "1.0",
        "--continuous", "--slots", "2", "--chunk_steps", "3"])
    assert rc == 0
    by_ep = _check_outputs("out", {"ep0": 3, "ep1": 2})
    # manifest has reference texts -> WER is scored per episode
    for row in by_ep.values():
        assert "wer" in row and row["wer"] >= 0.0
        assert row["corpus_rtfx"] > 0


def test_episodes_continuous_with_lm_carry_over(manifest, tmp_path,
                                                monkeypatch):
    import jax

    from loco_asr_tpu.models.gpt2 import model as g
    from loco_asr_tpu.pipelines import transcribe_episodes
    from loco_asr_tpu.utils.checkpoint import save_npz

    # random tiny LM saved to .npz: matches the pipeline's lm_model=tiny
    # config (transcribe_episodes.py lm_cfg)
    lm_cfg = g.tiny_gpt2_config(vocab_size=256, n_embd=32, n_head=4,
                                n_positions=512)
    lm_path = str(tmp_path / "lm.npz")
    save_npz(lm_path, g.gpt2_init(jax.random.PRNGKey(3), lm_cfg))

    monkeypatch.chdir(tmp_path)
    rc = transcribe_episodes.main([
        "--manifest", manifest, "--out_dir", "out_lm", "--tiny",
        "--max_decode_len", "6", "--batch_seconds", "1.0",
        "--continuous", "--slots", "2", "--chunk_steps", "3",
        "--lm_checkpoint", lm_path])
    assert rc == 0
    by_ep = _check_outputs("out_lm", {"ep0": 3, "ep1": 2})
    for row in by_ep.values():
        assert "wer" in row


def test_episodes_continuous_beam(manifest, tmp_path, monkeypatch):
    """--beam_size > 1 in episode mode: beam + per-episode LM carry-over
    (and beam-only without an LM) both produce a full output set."""
    import jax

    from loco_asr_tpu.models.gpt2 import model as g
    from loco_asr_tpu.pipelines import transcribe_episodes
    from loco_asr_tpu.utils.checkpoint import save_npz

    lm_cfg = g.tiny_gpt2_config(vocab_size=256, n_embd=32, n_head=4,
                                n_positions=512)
    lm_path = str(tmp_path / "lm.npz")
    save_npz(lm_path, g.gpt2_init(jax.random.PRNGKey(3), lm_cfg))

    monkeypatch.chdir(tmp_path)
    rc = transcribe_episodes.main([
        "--manifest", manifest, "--out_dir", "out_beam", "--tiny",
        "--max_decode_len", "6", "--batch_seconds", "1.0",
        "--continuous", "--slots", "2", "--chunk_steps", "3",
        "--beam_size", "2", "--lm_checkpoint", lm_path])
    assert rc == 0
    _check_outputs("out_beam", {"ep0": 3, "ep1": 2})

    rc = transcribe_episodes.main([
        "--manifest", manifest, "--out_dir", "out_beam_nolm", "--tiny",
        "--max_decode_len", "6", "--batch_seconds", "1.0",
        "--continuous", "--slots", "2", "--chunk_steps", "3",
        "--beam_size", "2"])
    assert rc == 0
    _check_outputs("out_beam_nolm", {"ep0": 3, "ep1": 2})
