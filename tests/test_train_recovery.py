"""Failure detection (SURVEY §5): both trainers must detect a non-finite
loss, roll back to the last checkpoint, skip the offending batch, and
finish with finite parameters.

Fault injection is explicit (`--nan_inject_step N` poisons step N once) so
the recovery path is deterministic to test — the reference has no failure
handling at all (SURVEY §5 failure-detection row)."""

import json
import os
import wave

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: full pipeline drives / virtual-mesh collectives


@pytest.fixture(scope="module")
def kaldi_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("kaldi_recovery")
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(16000 * 2) * 3000).astype(np.int16)
    with wave.open(str(root / "rec1.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    (root / "text").write_text(
        "rec1-A-000000-000100 hello there\n"
        "rec1-A-000100-000200 how are you\n")
    (root / "segments").write_text(
        "rec1-A-000000-000100 rec1 0.0 1.0\n"
        "rec1-A-000100-000200 rec1 1.0 2.0\n")
    (root / "wav.scp").write_text(f"rec1 {root}/rec1.wav\n")
    return str(root)


def _events(path):
    with open(path) as f:
        return [json.loads(l) for l in f.read().strip().splitlines()]


def test_train_asr_nan_recovery(kaldi_dir, tmp_path, monkeypatch):
    import jax

    from loco_asr_tpu.pipelines import train_asr
    from loco_asr_tpu.utils.checkpoint import Checkpointer

    monkeypatch.chdir(tmp_path)
    rc = train_asr.main([
        "--train_dir", kaldi_dir, "--out_dir", "exp/nan",
        "--tiny", "--steps", "4", "--batch_size", "2",
        "--eval_every", "100", "--save_every", "2",
        "--max_seconds", "0.5", "--warmup_steps", "1",
        "--mesh", "1,1,1",
        "--nan_recovery", "--nan_inject_step", "3"])
    assert rc == 0
    events = _events("exp/nan/metrics.jsonl")
    assert any(e.get("event") == "nan_rollback" for e in events)
    # training continued to the requested step count after the rollback
    state = Checkpointer("exp/nan/ckpt").restore()
    assert int(state["step"]) == 4
    for leaf in jax.tree_util.tree_leaves(state["params"]):
        assert np.isfinite(np.asarray(leaf)).all()


def test_train_lm_nan_recovery(tmp_path, monkeypatch):
    import jax

    from loco_asr_tpu.pipelines import train_lm
    from loco_asr_tpu.utils.checkpoint import Checkpointer

    monkeypatch.chdir(tmp_path)
    text = tmp_path / "train.txt"
    text.write_text(
        "rec1-A-000000-000100 hello there friend\n"
        "rec1-A-000100-000200 how are you today\n"
        "rec2-A-000000-000100 fine thanks and you\n")
    rc = train_lm.main([
        "--train_file", str(text), "--out_dir", "exp/lmnan",
        "--model", "tiny", "--seq_len", "16", "--batch_size", "2",
        "--steps", "4", "--save_every", "2", "--eval_every", "100",
        "--log_every", "1", "--warmup_steps", "1", "--mesh", "1,1,1",
        "--nan_recovery", "--nan_inject_step", "3"])
    assert rc == 0
    events = _events("exp/lmnan/metrics.jsonl")
    assert any(e.get("event") == "nan_rollback" for e in events)
    state = Checkpointer("exp/lmnan/ckpt").restore()
    assert int(state["step"]) == 4
    for leaf in jax.tree_util.tree_leaves(state["params"]):
        assert np.isfinite(np.asarray(leaf)).all()


def test_train_lm_nan_before_first_checkpoint(tmp_path, monkeypatch):
    """NaN injected BEFORE any checkpoint exists: rollback must fall back
    to the initial state (regression: restore returned None, params stayed
    poisoned, and the loop never advanced — infinite loop)."""
    import jax

    from loco_asr_tpu.pipelines import train_lm
    from loco_asr_tpu.utils.checkpoint import Checkpointer

    monkeypatch.chdir(tmp_path)
    text = tmp_path / "train.txt"
    text.write_text(
        "rec1-A-000000-000100 hello there friend\n"
        "rec1-A-000100-000200 how are you today\n")
    rc = train_lm.main([
        "--train_file", str(text), "--out_dir", "exp/early",
        "--model", "tiny", "--seq_len", "16", "--batch_size", "2",
        "--steps", "3", "--save_every", "3", "--eval_every", "100",
        "--log_every", "1", "--warmup_steps", "1", "--mesh", "1,1,1",
        "--nan_recovery", "--nan_inject_step", "1"])
    assert rc == 0
    events = _events("exp/early/metrics.jsonl")
    assert any(e.get("event") == "nan_rollback" for e in events)
    state = Checkpointer("exp/early/ckpt").restore()
    assert int(state["step"]) == 3
    for leaf in jax.tree_util.tree_leaves(state["params"]):
        assert np.isfinite(np.asarray(leaf)).all()


def test_train_lm_nan_without_recovery_poisons(tmp_path, monkeypatch):
    """Control: without --nan_recovery the poisoned step corrupts the
    parameters (this is the failure mode the recovery path exists for)."""
    import jax

    from loco_asr_tpu.pipelines import train_lm
    from loco_asr_tpu.utils.checkpoint import Checkpointer

    monkeypatch.chdir(tmp_path)
    text = tmp_path / "train.txt"
    text.write_text(
        "rec1-A-000000-000100 hello there friend\n"
        "rec1-A-000100-000200 how are you today\n")
    rc = train_lm.main([
        "--train_file", str(text), "--out_dir", "exp/raw",
        "--model", "tiny", "--seq_len", "16", "--batch_size", "2",
        "--steps", "4", "--save_every", "4", "--eval_every", "100",
        "--log_every", "1", "--warmup_steps", "1", "--mesh", "1,1,1",
        "--nan_inject_step", "3"])
    assert rc == 0
    state = Checkpointer("exp/raw/ckpt").restore()
    finite = all(np.isfinite(np.asarray(l)).all()
                 for l in jax.tree_util.tree_leaves(state["params"]))
    assert not finite
