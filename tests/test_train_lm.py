"""LM training pipeline smoke + loss-decrease on a tiny corpus."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: full pipeline drives / virtual-mesh collectives


@pytest.fixture
def fisher_train(tmp_path):
    p = tmp_path / "text"
    rng = np.random.default_rng(0)
    words = ["yeah", "so", "the", "topic", "is", "music", "right", "well"]
    lines = []
    for rec in range(4):
        t = 100
        for u in range(20):
            text = " ".join(rng.choice(words, rng.integers(3, 8)))
            lines.append(f"fe_03_{rec:05d}-{'AB'[u%2]}-{t:06d}-{t+80:06d} {text}")
            t += 100
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_train_lm_smoke_and_resume(fisher_train, tmp_path, monkeypatch):
    from loco_asr_tpu.pipelines import train_lm

    monkeypatch.chdir(tmp_path)
    rc = train_lm.main([
        "--train_file", fisher_train, "--dev_file", fisher_train,
        "--out_dir", "exp/lm", "--model", "tiny", "--seq_len", "32",
        "--batch_size", "4", "--steps", "30", "--eval_every", "30",
        "--save_every", "15", "--mesh", "2,1,2", "--warmup_steps", "2",
        "--log_every", "10"])
    assert rc == 0
    lines = [json.loads(l) for l in open("exp/lm/metrics.jsonl")]
    losses = [l["loss"] for l in lines if "loss" in l]
    ppls = [l["dev_ppl"] for l in lines if "dev_ppl" in l]
    assert ppls and np.isfinite(ppls[-1])
    # loss must move below the uniform-distribution floor within 30 steps
    assert losses and losses[-1] < np.log(256) - 0.1

    rc = train_lm.main([
        "--train_file", fisher_train, "--out_dir", "exp/lm",
        "--model", "tiny", "--seq_len", "32", "--batch_size", "4",
        "--steps", "32", "--eval_every", "100", "--save_every", "100",
        "--mesh", "2,1,2", "--warmup_steps", "2", "--resume"])
    assert rc == 0
