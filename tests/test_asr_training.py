"""WER metric, Kaldi ASR dataset, and the ASR training pipeline (smoke,
tiny config, synthetic Kaldi dir with segments + command-pipe wav.scp)."""

import os
import subprocess
import sys
import wave

import numpy as np
import pytest

from loco_asr_tpu.utils.wer import cer, edit_distance, wer, wer_details


def test_edit_distance_ops():
    d, ops = edit_distance("a b c d".split(), "a x c".split())
    assert d == 2 and ops == {"sub": 1, "ins": 0, "del": 1}


def test_wer_values():
    assert wer(["the cat sat"], ["the cat sat"]) == 0.0
    assert wer(["the cat sat"], ["the bat sat"]) == pytest.approx(1 / 3)
    assert wer(["a b"], ["a b c"]) == pytest.approx(0.5)  # insertion
    assert cer(["abc"], ["axc"]) == pytest.approx(1 / 3)
    d = wer_details(["the cat sat"], ["the bat"])
    assert d["sub_rate"] == pytest.approx(1 / 3)
    assert d["del_rate"] == pytest.approx(1 / 3)


@pytest.fixture(scope="module")
def kaldi_dir(tmp_path_factory):
    """Synthetic 2-recording Kaldi dir: one direct wav path, one command
    pipe, with segments."""
    root = tmp_path_factory.mktemp("kaldi")
    rng = np.random.default_rng(0)

    def write_wav(path, seconds):
        pcm = (rng.standard_normal(int(16000 * seconds)) * 3000).astype(np.int16)
        with wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())

    write_wav(root / "rec1.wav", 2.0)
    write_wav(root / "rec2.wav", 1.5)
    (root / "text").write_text(
        "rec1-A-000000-000100 hello there friend\n"
        "rec1-A-000100-000200 how are you\n"
        "rec2-A-000000-000150 fine thanks\n")
    (root / "segments").write_text(
        "rec1-A-000000-000100 rec1 0.0 1.0\n"
        "rec1-A-000100-000200 rec1 1.0 2.0\n"
        "rec2-A-000000-000150 rec2 0.0 1.5\n")
    cat = f"cat {root}/rec2.wav"
    (root / "wav.scp").write_text(
        f"rec1 {root}/rec1.wav\n"
        f"rec2 {cat} |\n")
    return str(root)


def test_kaldi_asr_dataset(kaldi_dir):
    from loco_asr_tpu.data.asr_dataset import KaldiAsrDataset
    from loco_asr_tpu.data.tokenizer import CharTokenizer

    ds = KaldiAsrDataset(kaldi_dir)
    assert len(ds) == 3
    ex = ds.examples[0]
    wav = ds.load_waveform(ex)
    assert len(wav) == 16000  # 1.0s segment
    batches = list(ds.batches(CharTokenizer(), batch_size=2, eos_id=1))
    total = sum(len(b["utt_ids"]) for b in batches)
    assert total == 3
    b = batches[0]
    assert b["input_values"].shape == b["attention_mask"].shape
    assert b["labels"].shape[0] == b["input_values"].shape[0]
    # labels end with eos then pad
    row = b["labels"][0]
    valid = row[row != -100]
    assert valid[-1] == 1


@pytest.mark.slow
def test_decode_asr_pipeline(kaldi_dir, tmp_path, monkeypatch):
    import json

    from loco_asr_tpu.pipelines import decode_asr

    monkeypatch.chdir(tmp_path)
    rc = decode_asr.main([
        "--data_dir", kaldi_dir, "--out_dir", "exp/dec", "--tiny",
        "--beam_size", "2", "--max_decode_len", "8", "--batch_size", "2",
        "--max_seconds", "1.0", "--lm_weight", "0.2"])
    assert rc == 0
    assert os.path.exists("exp/dec/hyp.text")
    with open("exp/dec/wer.json") as f:
        details = json.load(f)
    assert 0.0 <= details["wer"]
    assert details["ref_words"] > 0
    lines = open("exp/dec/hyp.text").read().strip().splitlines()
    assert len(lines) == 3 and lines[0].split()[0].startswith("rec")


@pytest.mark.slow
def test_train_asr_pipeline_smoke(kaldi_dir, tmp_path, monkeypatch):
    from loco_asr_tpu.pipelines import train_asr

    monkeypatch.chdir(tmp_path)
    # mesh 2,1,2 and short audio: the CI box has ONE cpu core, and XLA's
    # cpu collective rendezvous hard-aborts if participants take >40 s to
    # arrive — keep per-device work tiny.
    rc = train_asr.main([
        "--train_dir", kaldi_dir, "--dev_dir", kaldi_dir,
        "--out_dir", "exp/test", "--tiny", "--steps", "4",
        "--batch_size", "2", "--eval_every", "4", "--save_every", "2",
        "--mesh", "2,1,2", "--max_seconds", "0.5", "--decode_max_len", "8",
        "--eval_batches", "2", "--warmup_steps", "1"])
    assert rc == 0
    assert os.path.exists("exp/test/metrics.jsonl")
    assert os.path.exists("exp/test/ckpt/status.json")
    lines = open("exp/test/metrics.jsonl").read().strip().splitlines()
    assert any("dev_wer" in l for l in lines)

    # resume path: restores step and continues
    rc = train_asr.main([
        "--train_dir", kaldi_dir, "--dev_dir", kaldi_dir,
        "--out_dir", "exp/test", "--tiny", "--steps", "6",
        "--batch_size", "2", "--eval_every", "6", "--save_every", "2",
        "--mesh", "2,1,2", "--max_seconds", "0.5", "--decode_max_len", "8",
        "--eval_batches", "1", "--warmup_steps", "1", "--resume"])
    assert rc == 0


@pytest.mark.slow
def test_train_asr_conversation_windows(kaldi_dir, tmp_path, monkeypatch):
    """--conversation_seconds: train on conversation windows end-to-end
    (window construction -> flash attention -> real steps from a Kaldi
    dir — the LoCo long-context training seam, VERDICT r3 item 1)."""
    from loco_asr_tpu.pipelines import train_asr

    monkeypatch.chdir(tmp_path)
    # --dev_dir exercises the conversation eval path too (flash-impl
    # encode + eval loss + greedy decode over windows)
    rc = train_asr.main([
        "--train_dir", kaldi_dir, "--dev_dir", kaldi_dir,
        "--out_dir", "exp/conv", "--tiny",
        "--steps", "2", "--batch_size", "2", "--eval_every", "2",
        "--save_every", "2", "--mesh", "1,1,1", "--eval_batches", "1",
        "--conversation_seconds", "2.5", "--attn_impl", "flash",
        "--warmup_steps", "1", "--decode_max_len", "4"])
    assert rc == 0
    assert os.path.exists("exp/conv/ckpt/status.json")
    lines = open("exp/conv/metrics.jsonl").read().strip().splitlines()
    assert any("dev_wer" in l for l in lines)


@pytest.mark.slow
def test_decode_asr_continuous_matches_static(kaldi_dir, tmp_path, monkeypatch):
    """--continuous (slot-level admission) must emit the same hypotheses
    as static greedy batching for every utterance."""
    from loco_asr_tpu.pipelines import decode_asr

    monkeypatch.chdir(tmp_path)
    common = ["--data_dir", kaldi_dir, "--tiny", "--beam_size", "1",
              "--max_decode_len", "8", "--batch_size", "2",
              "--max_seconds", "1.5"]
    assert decode_asr.main(common + ["--out_dir", "exp/static"]) == 0
    assert decode_asr.main(common + ["--out_dir", "exp/cont",
                                     "--continuous"]) == 0
    static = sorted(open("exp/static/hyp.text").read().splitlines())
    cont = sorted(open("exp/cont/hyp.text").read().splitlines())
    assert cont == static


@pytest.mark.slow
def test_decode_asr_data_parallel_matches_single(kaldi_dir, tmp_path,
                                                 monkeypatch):
    """--data_parallel 2: sharded encoder + greedy loop must emit the same
    hypotheses as the single-device run (params replicated, batch rows
    sharded; DP pad rows fall off at the zip)."""
    from loco_asr_tpu.pipelines import decode_asr

    monkeypatch.chdir(tmp_path)
    common = ["--data_dir", kaldi_dir, "--tiny", "--beam_size", "1",
              "--max_decode_len", "6", "--batch_size", "3",
              "--max_seconds", "1.0"]
    assert decode_asr.main(common + ["--out_dir", "exp/single"]) == 0
    assert decode_asr.main(common + ["--out_dir", "exp/dp",
                                     "--data_parallel", "2"]) == 0
    single = sorted(open("exp/single/hyp.text").read().splitlines())
    dp = sorted(open("exp/dp/hyp.text").read().splitlines())
    assert dp == single


@pytest.mark.slow
def test_decode_asr_continuous_beam_matches_static(kaldi_dir, tmp_path,
                                                   monkeypatch):
    """--continuous with beam_size > 1 must match static beam decoding."""
    from loco_asr_tpu.pipelines import decode_asr

    monkeypatch.chdir(tmp_path)
    common = ["--data_dir", kaldi_dir, "--tiny", "--beam_size", "2",
              "--max_decode_len", "8", "--batch_size", "2",
              "--max_seconds", "1.5"]
    assert decode_asr.main(common + ["--out_dir", "exp/static"]) == 0
    assert decode_asr.main(common + ["--out_dir", "exp/cont",
                                     "--continuous"]) == 0
    static = sorted(open("exp/static/hyp.text").read().splitlines())
    cont = sorted(open("exp/cont/hyp.text").read().splitlines())
    assert cont == static
