"""FULL-SIZE numerical parity against in-environment HF oracles.

The tiny-config parity tests (test_speecht5_parity, test_gpt2_parity) pin
the algorithms; this tier measures the actual accumulation behavior at
production scale — hidden 768, 12 encoder layers, the real 7-layer conv
stack, 124M-param GPT-2 — using RANDOMLY-INITIALIZED full-size HF models
built from config (no network, no weight files; torch + transformers are
local).  This closes docs/VALIDATION.md risk (a): f32 drift over 12
layers at hidden 768 is measured here, not extrapolated.

Budgets: encoder embedding MAE <1e-3 (BASELINE.md, defined by
/root/reference/speech_text/extract_speecht5_finetuned_embeddings_slurp.py:104)
and per-token NLL delta <5e-3
(/root/reference/lms/src/eval_ppl_with_pretrained_lm.py:78-97).

Runs the EXACT check code of scripts/validate_real_weights.py — a
machine with the real weights runs the same functions on its dirs.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, ".")

from scripts import validate_real_weights as v  # noqa: E402

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def full_speecht5_dir(tmp_path_factory):
    from transformers import SpeechT5Config, SpeechT5ForSpeechToText

    d = tmp_path_factory.mktemp("st5_full")
    torch.manual_seed(0)
    # default SpeechT5Config == microsoft/speecht5_asr dims (hidden 768,
    # 12 encoder layers, 7-conv feature encoder, vocab 81)
    model = SpeechT5ForSpeechToText(SpeechT5Config())
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


@pytest.fixture(scope="module")
def full_gpt2_dir(tmp_path_factory):
    from transformers import GPT2Config, GPT2LMHeadModel

    d = tmp_path_factory.mktemp("gpt2_full")
    torch.manual_seed(0)
    GPT2LMHeadModel(GPT2Config()).save_pretrained(d, safe_serialization=True)
    return str(d)


def test_full_size_speecht5_encoder_parity(full_speecht5_dir):
    r = v.check_speecht5_hf(full_speecht5_dir, audio_paths=None, seconds=3.0)
    print(f"\nfull-size speecht5 parity: {r}")
    assert r["status"] == "pass", r
    assert r["mae"] < v.EMBED_MAE_BUDGET


def test_full_size_gpt2_nll_parity(full_gpt2_dir):
    r = v.check_gpt2(full_gpt2_dir)
    print(f"\nfull-size gpt2 parity: {r}")
    assert r["status"] == "pass", r
    assert r["max_abs_nll_delta"] < v.NLL_TOL
