"""The real-weight validation harness (scripts/validate_real_weights.py)
must itself be proven runnable: save TINY HF checkpoints locally (no
network) and drive every check through the exact code path a machine with
the real microsoft/speecht5_asr + gpt2 weights would use.  The full-size
parities stay unmeasured here (docs/VALIDATION.md); this pins that the
procedure works."""

import json
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, ".")

from scripts import validate_real_weights as v  # noqa: E402

pytestmark = pytest.mark.slow  # heavy tier: full pipeline drives / virtual-mesh collectives


@pytest.fixture(scope="module")
def tiny_speecht5_dir(tmp_path_factory):
    from tests.test_speecht5_parity import hf_tiny_config
    from transformers import SpeechT5ForSpeechToText

    d = tmp_path_factory.mktemp("st5")
    torch.manual_seed(0)
    SpeechT5ForSpeechToText(hf_tiny_config()).save_pretrained(d)
    return str(d)


@pytest.fixture(scope="module")
def tiny_gpt2_dir(tmp_path_factory):
    from transformers import GPT2Config, GPT2LMHeadModel

    d = tmp_path_factory.mktemp("gpt2")
    torch.manual_seed(0)
    GPT2LMHeadModel(GPT2Config(
        vocab_size=61, n_positions=32, n_embd=16, n_layer=2,
        n_head=2)).save_pretrained(d)
    return str(d)


def test_check_speecht5_hf(tiny_speecht5_dir):
    # short audio: the tiny config's stride-10 conv keeps 1/10 of samples
    # as frames, and HF torch attention over them is slow on one CPU core
    r = v.check_speecht5_hf(tiny_speecht5_dir, audio_paths=None, seconds=0.2)
    assert r["status"] == "pass", r
    assert r["mae"] < 1e-4          # tiny-size parity is tighter than budget


def test_check_gpt2(tiny_gpt2_dir):
    r = v.check_gpt2(tiny_gpt2_dir)
    assert r["status"] == "pass", r
    assert r["max_abs_nll_delta"] < 1e-4


def test_cli_reports_all_checks(tiny_gpt2_dir, tmp_path):
    out = tmp_path / "report.json"
    rc = v.main(["--gpt2_hf", tiny_gpt2_dir, "--out", str(out)])
    assert rc == 0
    rows = json.loads(out.read_text())
    names = {r["check"] for r in rows}
    assert names == {"speecht5-hf-encoder-parity", "speecht5-base-graft",
                     "gpt2-nll-parity", "slurp-embedding-parity",
                     "shorten-sph2pipe-golden"}
    by = {r["check"]: r for r in rows}
    assert by["gpt2-nll-parity"]["status"] == "pass"
    assert by["speecht5-hf-encoder-parity"]["status"] == "skipped"


def test_check_speecht5_base_with_synthetic_fairseq(tmp_path):
    """Drive the fairseq-graft check with a synthetic full-size checkpoint
    built by inverse-renaming our own init (tests/test_fairseq_import.py's
    mapping), so the real-weight path is proven runnable end-to-end."""
    import jax
    import numpy as np

    from loco_asr_tpu.models.speecht5 import model as st5
    from loco_asr_tpu.models.speecht5.config import SpeechT5Config
    from tests.test_fairseq_import import to_fairseq_state

    cfg = SpeechT5Config()
    src = st5.asr_init(jax.random.PRNGKey(0), cfg)
    state = to_fairseq_state(src)
    state["text_encoder_prenet.encoder_prenet.0.weight"] = np.zeros(
        (cfg.vocab_size, cfg.hidden_size), np.float32)
    ckpt = tmp_path / "speecht5_base.pt"
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in state.items()}}, ckpt)

    r = v.check_speecht5_base(str(ckpt), seconds=0.5)
    assert r["status"] == "pass", r
