"""Data-layer behavior tests: SLURP adapter, Kaldi IO, Fisher prep/split,
LM datasets (indep bucketing + max_len sliding windows)."""

import json
import os

import numpy as np
import pytest

from loco_asr_tpu.data import kaldi, lm_datasets, fisher_prep, fisher_split
from loco_asr_tpu.data.intent_classes import INTENT_CLASSES, NUM_INTENT_CLASSES
from loco_asr_tpu.data.slurp import SlurpDataset, encode_intent, onehot_intent


# ---------------------------------------------------------------------------
# intent label space
# ---------------------------------------------------------------------------

def test_intent_classes_sorted_unique():
    assert NUM_INTENT_CLASSES == 101
    assert INTENT_CLASSES == sorted(set(INTENT_CLASSES))
    v = onehot_intent("alarm_set")
    assert v.shape == (101,) and v.sum() == 1.0
    assert v[encode_intent("alarm_set")] == 1.0


# ---------------------------------------------------------------------------
# SLURP adapter
# ---------------------------------------------------------------------------

@pytest.fixture
def slurp_root(tmp_path):
    root = tmp_path / "slurp"
    (root / "dataset/slurp").mkdir(parents=True)
    (root / "audio/slurp_real").mkdir(parents=True)
    (root / "audio/slurp_synth").mkdir(parents=True)
    items = [
        {"slurp_id": 1, "sentence": "wake me up", "intent": "alarm_set",
         "action": "set", "scenario": "alarm",
         "recordings": [{"file": "a1.flac"},
                        {"file": "a1-headset.flac", "headset": True}]},
        {"slurp_id": 2, "sentence": "play music", "intent": "play_music",
         "action": "play", "scenario": "play",
         "recordings": [{"file": "b1.flac"}]},
    ]
    for split in ("train", "train_synthetic"):
        with open(root / "dataset/slurp" / f"{split}.jsonl", "w") as f:
            for it in items:
                f.write(json.dumps(it) + "\n")
    return str(root)


def test_slurp_headset_preference(slurp_root):
    ds = SlurpDataset(slurp_root, mode="train", task="intent")
    assert len(ds) == 2
    sid, sent, path, sr, label = ds[0]
    assert sid == 1 and sr == 16000 and label == "alarm_set"
    assert path.endswith("slurp_real/a1-headset.flac")  # headset preferred
    _, _, path2, _, _ = ds[1]
    assert path2.endswith("slurp_real/b1.flac")  # fallback to first
    assert ds.intents == ["alarm_set", "play_music"]


def test_slurp_synthetic_uses_synth_audio(slurp_root):
    ds = SlurpDataset(slurp_root, mode="train_synthetic")
    assert "slurp_synth" in ds[0][2]


def test_reference_pickle_layout_roundtrip(tmp_path):
    """The reference-compat cache layout: one pickle per utterance with
    {id, embedding, target} (extract_*.py:91-93 / slurp_embeddings_and_
    targets.py:19-28)."""
    from loco_asr_tpu.data import embedding_store

    records = [(7, np.random.default_rng(0).standard_normal((5, 4)).astype(np.float32),
                np.eye(3, dtype=np.float32)[1])]
    d = str(tmp_path / "pk")
    embedding_store.write_reference_pickles(d, records)
    files = os.listdir(d)
    assert files == ["7_embedding_and_target.pickle"]
    back = list(embedding_store.read_reference_pickles(d))
    assert back[0][0] == 7
    np.testing.assert_array_equal(back[0][1], records[0][1])
    np.testing.assert_array_equal(back[0][2], records[0][2])


# ---------------------------------------------------------------------------
# Kaldi IO
# ---------------------------------------------------------------------------

def test_kaldi_roundtrip(tmp_path):
    p = str(tmp_path / "text")
    kaldi.write_key_value_file(p, [("u1-A-0-1", "hello there"), ("u2-B-0-1", "yo")])
    d = kaldi.read_key_value_file(p)
    assert d == {"u1-A-0-1": "hello there", "u2-B-0-1": "yo"}
    s2u = kaldi.utt2spk_to_spk2utt({"u1": "s1", "u2": "s1", "u3": "s2"})
    assert list(s2u) == ["s1", "s2"] and s2u["s1"] == ["u1", "u2"]
    assert kaldi.recording_id("fe_03_0001-A-000100-000200") == "fe_03_0001"


# ---------------------------------------------------------------------------
# Fisher prep
# ---------------------------------------------------------------------------

def test_fisher_prep(tmp_path):
    t = tmp_path / "fe_03_00001.txt"
    t.write_text(
        "# fe_03_00001.sph\n\n"
        "7.38 8.78 A: an- so the topic is [laugh]\n"
        "9.00 10.5 B: ((unintelligible))\n"
        "11.0 12.0 B: yes [mn] right\n"
        "13.0 13.5 A: okay\n"
        "14.0 14.5 A: ok\n")
    out = str(tmp_path / "out")
    files = fisher_prep.prepare_fisher([str(t)], out)
    text = kaldi.read_key_value_file(files["text"])
    # '((' line dropped; single-word line kept (2 fields incl id)
    assert "fe_03_00001-B-000900-001050" not in text
    assert text["fe_03_00001-A-000738-000878"] == "an- so the topic is [laughter]"
    assert text["fe_03_00001-B-001100-001200"] == "yes [noise] right"
    assert text["fe_03_00001-A-001300-001350"] == "okay"
    # parser parity quirk: the reference perl regex (\S.+\S|\S) cannot match
    # a 2-character word, so 'ok' lines are silently dropped — ours too.
    assert "fe_03_00001-A-001400-001450" not in text
    seg = kaldi.read_segments(files["segments"])
    assert seg["fe_03_00001-A-000738-000878"] == ("fe_03_00001-A", 7.38, 8.78)
    u2s = kaldi.read_key_value_file(files["utt2spk"])
    assert u2s["fe_03_00001-B-001100-001200"] == "fe_03_00001-B"
    r2fc = kaldi.read_key_value_file(files["reco2file_and_channel"])
    assert r2fc["fe_03_00001-A"] == "fe_03_00001 A"


def test_fisher_prep_rejects_bad_header(tmp_path):
    t = tmp_path / "fe_03_00002.txt"
    t.write_text("# fe_03_99999.sph\n7.0 8.0 A: hi there\n")
    with pytest.raises(ValueError, match="Mismatch call-id"):
        fisher_prep.parse_transcript(str(t))


# ---------------------------------------------------------------------------
# Fisher split filter
# ---------------------------------------------------------------------------

def test_fisher_split(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    (data / "text").write_text("rec1-A-0-1 hello\nrec2-A-0-1 world\nrec1-B-0-1 hi\n")
    (data / "frame_shift").write_text("0.01\n")
    splits = tmp_path / "splits"
    splits.mkdir()
    (splits / "train.recids").write_text("rec1\n")
    (splits / "dev.recids").write_text("rec2\n")
    out = fisher_split.split_data_dir(str(splits), str(data), str(tmp_path / "out"),
                                      sets=("train", "dev"))
    train_text = open(os.path.join(out["train"], "text")).read().splitlines()
    assert train_text == ["rec1-A-0-1 hello", "rec1-B-0-1 hi"]
    dev_text = open(os.path.join(out["dev"], "text")).read().splitlines()
    assert dev_text == ["rec2-A-0-1 world"]
    assert open(os.path.join(out["train"], "frame_shift")).read() == "0.01\n"


# ---------------------------------------------------------------------------
# LM datasets
# ---------------------------------------------------------------------------

class CharTokenizer:
    """Trivial per-character tokenizer with GPT-2-style API."""

    bos_token_id = 0
    eos_token_id = 1

    def __call__(self, text):
        return {"input_ids": [2 + (ord(c) % 57) for c in text.replace(" ", "_")]}


@pytest.fixture
def fisher_text(tmp_path):
    p = tmp_path / "text"
    p.write_text(
        "rec1-A-000100-000200 hello world\n"
        "rec1-B-000150-000250 yes\n"
        "rec1-A-000300-000400 ok then\n"
        "rec2-A-000100-000200 hi\n"
        "rec1-A-000100-000200 duplicate line\n")
    return str(p)


def test_indep_dataset_batching(fisher_text):
    tok = CharTokenizer()
    ds = lm_datasets.IndepTextDataset(fisher_text, tok, batch_size=2)
    assert len(ds.utt_ids) == 4  # duplicate dropped
    # sorted by length; each batch has a single length
    for batch in ds:
        lens = {len(x) for x in batch}
        assert len(lens) == 1
    # every sequence starts with BOS, ends with EOS
    for ids in ds.text_ids:
        assert ids[0] == tok.bos_token_id and ids[-1] == tok.eos_token_id


def test_indep_padded_batches(fisher_text):
    tok = CharTokenizer()
    ds = lm_datasets.IndepTextDataset(fisher_text, tok, batch_size=3)
    total = 0
    for ids, lens, idx in ds.padded_batches(multiple=8):
        assert ids.shape[1] % 8 == 0
        for row, L in zip(ids, lens):
            assert row[L - 1] == tok.eos_token_id
        total += len(lens)
    assert total == 4


def test_maxlen_chronological_stream(fisher_text):
    tok = CharTokenizer()
    ds = lm_datasets.MaxLenTextDataset(fisher_text, tok, max_len=6, batch_size=2)
    # rec1 utterances must be in time order regardless of channel:
    # 000100 (hello world), 000150 (yes), 000300 (ok then)
    want = (tok("hello world")["input_ids"] + [1]
            + tok("yes")["input_ids"] + [1]
            + tok("ok then")["input_ids"] + [1])
    assert ds.rec_id2tokens["rec1"] == want


def test_maxlen_window_semantics(tmp_path):
    tok = CharTokenizer()
    p = tmp_path / "text"
    # rec with 10 tokens incl eos; max_len 4 -> windows v[i:i+4], i=0..5
    p.write_text("r-A-000001-000002 abcdefghi\n")
    ds = lm_datasets.MaxLenTextDataset(str(p), tok, max_len=4, batch_size=3)
    v = ds.rec_id2tokens["r"]
    assert len(v) == 10
    seen = list(ds)
    # first yield: the first window alone, first=True
    first = seen[0]
    assert first[2] is True and first[0] == [v[0:4]]
    # remaining windows in batches of <=3, stride 1
    rest = [w for batch in seen[1:] for w in batch[0]]
    assert rest == [v[i:i + 4] for i in range(1, 6)]
    assert seen[-1][3] is True  # last flag
    # reference quirk: final token v[-1] is never the last element scored
    assert rest[-1][-1] == v[-2]


def test_maxlen_short_recording_single_batch(tmp_path):
    tok = CharTokenizer()
    p = tmp_path / "text"
    p.write_text("s-A-000001-000002 ab\n")  # 2 chars + eos = 3 tokens < max_len
    ds = lm_datasets.MaxLenTextDataset(str(p), tok, max_len=8, batch_size=2)
    out = list(ds)
    assert len(out) == 1
    batch, rec_ids, first, last = out[0]
    assert first is True and last is True and rec_ids == ["s"]
    assert batch == [ds.rec_id2tokens["s"]]


def test_maxlen_exact_length_recording_yields_nothing(tmp_path):
    tok = CharTokenizer()
    p = tmp_path / "text"
    p.write_text("x-A-000001-000002 abcdefg\n")  # 7 chars + eos = 8 tokens
    ds = lm_datasets.MaxLenTextDataset(str(p), tok, max_len=8, batch_size=2)
    assert len(ds.rec_id2tokens["x"]) == 8
    assert list(ds) == []  # reference quirk: dropped entirely


def test_compute_ppl_per_recording():
    nlls = [[1.0, 2.0], [3.0], [0.5]]
    ids = ["r1-A-0-1", "r1-A-2-3", "r2-B-0-1"]
    rec2nlls, rec2ppl = lm_datasets.compute_ppl_per_recording(nlls, ids)
    assert rec2nlls["r1"] == [1.0, 2.0, 3.0]
    np.testing.assert_allclose(rec2ppl["r1"], np.exp(2.0))
    np.testing.assert_allclose(rec2ppl["r2"], np.exp(0.5))
