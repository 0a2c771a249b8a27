"""Grand integration: the whole framework end-to-end on synthetic data.

fisher_prep CLI (LDC tree -> Kaldi dirs with splits)
  -> train_lm on the train split's conversation streams
  -> eval_ppl with the TRAINED checkpoint (dev PPL must beat random init)
  -> decode_asr on the dev split with the trained LM as the fusion scorer.
"""

import json
import os
import pickle

import numpy as np
import pytest

from tests.test_fisher_prep_cli import _make_corpus

pytestmark = pytest.mark.slow  # heavy tier: full pipeline drives / virtual-mesh collectives


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    root = tmp_path_factory.mktemp("grand")
    corpus, splits = _make_corpus(root)
    cwd = os.getcwd()
    os.chdir(root)
    try:
        from loco_asr_tpu.pipelines import fisher_prep as cli

        rc = cli.main([corpus, "--out_dir", "data/train_all",
                       "--split_dir", splits, "--split_out", "data",
                       "--sets", "train", "dev"])
        assert rc == 0
        yield str(root)
    finally:
        os.chdir(cwd)


def test_grand_pipeline(prepared, monkeypatch):
    monkeypatch.chdir(prepared)
    from loco_asr_tpu.pipelines import decode_asr, eval_ppl, train_lm

    # 1) train an LM on the train split's conversation streams
    rc = train_lm.main([
        "--train_file", "data/train/text", "--out_dir", "exp/lm",
        "--model", "tiny", "--seq_len", "32", "--batch_size", "4",
        "--steps", "40", "--eval_every", "100", "--save_every", "40",
        "--mesh", "1,1,1", "--warmup_steps", "2", "--log_every", "10"])
    assert rc == 0

    # 2) PPL with the trained checkpoint beats random init on dev text
    for name, extra in (("rand", []), ("trained", ["--checkpoint", "exp/lm/ckpt"])):
        rc = eval_ppl.main(["-i", "data/dev/text", "-o", f"exp/ppl_{name}",
                            "--model", "tiny", "--context_type", "indep",
                            "--bsize", "8"] + extra)
        assert rc == 0
    def mean_nll(d):
        with open(os.path.join(d, "rec_id2nlls.pkl"), "rb") as f:
            nlls = pickle.load(f)
        flat = [x for v in nlls.values() for x in v]
        return float(np.mean(flat))
    # dev recordings share the train vocabulary/style -> trained LM must win
    assert mean_nll("exp/ppl_trained") < mean_nll("exp/ppl_rand") - 0.1

    # 3) beam decode the dev split with the trained LM fused
    rc = decode_asr.main([
        "--data_dir", "data/dev", "--out_dir", "exp/decode", "--tiny",
        "--beam_size", "2", "--max_decode_len", "8", "--batch_size", "2",
        "--max_seconds", "2.0", "--lm_checkpoint", "exp/lm/ckpt",
        "--lm_weight", "0.3", "--vocab_size", "256"])
    assert rc == 0
    with open("exp/decode/wer.json") as f:
        details = json.load(f)
    assert details["ref_words"] > 0
    assert os.path.exists("exp/decode/hyp.text")
