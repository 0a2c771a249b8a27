"""The LoCo context-gain experiment, pinned at CPU scale.

The reference's core experiment is the indep-vs-max_len PPL comparison
(eval_ppl_with_pretrained_lm.py:67-73) — conversation context should
make the LM measurably better.  data/synthetic_conversations.py builds a
corpus where that is true by construction (per-conversation names:
in-utterance entropy, in-context copies; dev names unseen in training),
and pipelines/loco_experiment.py runs the comparison with the real
train_lm/eval_ppl pipelines.  This test pins that the measured gain is
NONZERO at a 2-minute scale; the full-scale measured run (gain 0.371
nats/token, PPL 4.97 -> 3.43) is recorded in docs/LOCO_EXPERIMENT.md.
"""

import json

import pytest


@pytest.mark.slow
def test_lm_context_gain_is_positive(tmp_path):
    from loco_asr_tpu.pipelines import loco_experiment

    out = tmp_path / "loco"
    rc = loco_experiment.main([
        "--out_dir", str(out), "--stage", "lm",
        "--lm_convs", "60", "--lm_dev_convs", "10", "--lm_utts", "8",
        "--lm_steps", "400", "--lm_batch", "8", "--seq_len", "128",
        "--lm_n_embd", "64", "--lm_n_layer", "3",
        "--rng_impl", "threefry", "--seed", "0"])
    assert rc == 0
    with open(out / "results.json") as f:
        lm = json.load(f)["lm"]
    # context must help: max_len (full-history windows) beats indep
    # (per-utterance scoring) on held-out conversations whose names were
    # never seen in training.  At this scale the full experiment
    # measures ~0.1-0.4 nats/token; 0.02 is the flakiness-safe floor
    # that still proves the machinery delivers a real gain.
    gain = lm["nll_indep"] - lm["nll_max_len"]
    assert gain > 0.02, lm
    assert lm["ppl_max_len"] < lm["ppl_indep"], lm
    # streaming mode (the O(T) evaluator) must realize the same gain
    assert lm["ppl_streaming"] < lm["ppl_indep"], lm


@pytest.mark.slow
def test_asr_corpus_generator_contract(tmp_path):
    """ASR-twin corpus: names present in every utterance's transcript,
    degraded-audio repeats, disjoint dev names, Kaldi-dir layout the
    standard pipelines consume."""
    import numpy as np

    from loco_asr_tpu.data.asr_dataset import KaldiAsrDataset
    from loco_asr_tpu.data.synthetic_conversations import (
        ASR_NAME_CHARS, make_asr_corpus, render_utterance)

    tr, dev = make_asr_corpus(str(tmp_path / "asr"), n_train=3, n_dev=2,
                              n_utts=3, seed=0)
    for root in (tr, dev):
        ds = KaldiAsrDataset(root)
        assert len(ds) == (3 if root == tr else 2) * 3
        wav = ds.load_waveform(ds.examples[0])
        assert wav.size > 0 and np.isfinite(wav).all()

    def names(root):
        out = set()
        with open(f"{root}/text") as f:
            for line in f:
                for w in line.split()[1:]:
                    if all(c in ASR_NAME_CHARS for c in w):
                        out.add(w)
        return out

    tr_names, dev_names = names(tr), names(dev)
    assert tr_names and dev_names
    assert not (tr_names & dev_names)     # copying, not memorization

    # degradation: the name segment's tone is buried in noise
    rng = np.random.default_rng(0)
    clean = render_utterance("ab klmn cd", rng)
    degraded = render_utterance("ab klmn cd", rng, degrade_name="klmn")
    n = int(0.05 * 16000)
    seg = slice(3 * n, 7 * n)             # chars 3-6 = the name
    assert not np.allclose(clean[seg], degraded[seg])
    np.testing.assert_array_equal(clean[:3 * n], degraded[:3 * n])
