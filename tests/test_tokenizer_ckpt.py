"""BPE tokenizer and checkpointing tests."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from loco_asr_tpu.data.tokenizer import (CharTokenizer, GPT2BPETokenizer,
                                         bytes_to_unicode, load_tokenizer)
from loco_asr_tpu.utils.checkpoint import Checkpointer, load_npz, save_npz


def test_bytes_to_unicode_reversible():
    b2u = bytes_to_unicode()
    assert len(b2u) == 256
    assert len(set(b2u.values())) == 256


def _toy_bpe():
    # vocab over byte-units + merged units for "lo" "low" "er" "lower"
    units = [bytes_to_unicode()[b] for b in range(256)]
    vocab = {u: i for i, u in enumerate(units)}
    for extra in ("lo", "low", "er", "low" + "er", "Ġlow"):
        vocab.setdefault(extra, len(vocab))
    vocab["<|endoftext|>"] = len(vocab)
    merges = [("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er"),
              ("Ġ", "low")]
    return GPT2BPETokenizer(vocab, merges)


def test_bpe_merges_applied_in_rank_order():
    tok = _toy_bpe()
    ids = tok.encode("lower")
    assert [tok.decoder[i] for i in ids] == ["lower"]
    # rank order: for "Ġlower", (low,er) rank 3 beats (Ġ,low) rank 4,
    # so the result is [Ġ, lower], not [Ġlow, er]
    pieces = [tok.decoder[i] for i in tok.encode("a lower")]
    assert pieces == ["a", "Ġ", "lower"]
    # leading-space merge applies when no higher-rank merge competes
    assert [tok.decoder[i] for i in tok.encode(" low")] == ["Ġlow"]


def test_bpe_roundtrip_utf8():
    tok = _toy_bpe()
    for text in ("hello world", "café — ok", "low lower lowest"):
        assert tok.decode(tok.encode(text)) == text


def test_bpe_from_files(tmp_path):
    import json

    tok = _toy_bpe()
    (tmp_path / "vocab.json").write_text(json.dumps(tok.encoder))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for (a, b) in tok.bpe_ranks))
    tok2 = load_tokenizer(str(tmp_path))
    text = "the lower one"
    assert tok2.encode(text) == tok.encode(text)
    assert tok2.bos_token_id == tok.encoder["<|endoftext|>"]


def test_char_tokenizer_in_range():
    tok = CharTokenizer(vocab_size=61)
    ids = tok("hello")["input_ids"]
    assert all(2 <= i < 61 for i in ids)


def test_checkpointer_save_restore_best(tmp_path):
    ck = Checkpointer(str(tmp_path / "ck"), use_orbax=False)
    assert ck.restore() is None
    state1 = {"params": {"w": np.ones((3,))}, "step": np.asarray(1)}
    state2 = {"params": {"w": np.full((3,), 2.0)}, "step": np.asarray(2)}
    ck.save(1, state1, metric=0.5)
    ck.save(2, state2, metric=0.9)  # worse; best stays at 1
    latest = ck.restore()
    np.testing.assert_array_equal(latest["params"]["w"], 2.0)
    best = ck.restore_best()
    np.testing.assert_array_equal(best["params"]["w"], 1.0)


def test_checkpointer_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    ck = Checkpointer(str(tmp_path / "ck"), use_orbax=True)
    state = {"params": {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}}
    ck.save(3, state, metric=1.0)
    out = ck.restore()
    np.testing.assert_allclose(np.asarray(out["params"]["b"]["c"]), 1.0)


def test_average_checkpoints(tmp_path):
    from loco_asr_tpu.utils.checkpoint import (Checkpointer, average_checkpoints,
                                               average_last_k)

    a = {"w": np.asarray([1.0, 2.0], np.float32), "n": {"b": np.float32(0.0)}}
    b = {"w": np.asarray([3.0, 4.0], np.float32), "n": {"b": np.float32(2.0)}}
    avg = average_checkpoints([a, b])
    np.testing.assert_allclose(avg["w"], [2.0, 3.0])
    np.testing.assert_allclose(avg["n"]["b"], 1.0)

    ck = Checkpointer(str(tmp_path / "ck"), use_orbax=False)
    for i, s in enumerate((a, b)):
        ck.save(i + 1, {"params": s})
    assert ck.steps() == [1, 2]
    avg2 = average_last_k(ck, k=2)
    np.testing.assert_allclose(avg2["w"], [2.0, 3.0])


def test_npz_roundtrip(tmp_path):
    tree = {"a": np.arange(3), "b": {"c": np.ones((2, 2), np.float32)}}
    p = str(tmp_path / "t.npz")
    save_npz(p, tree)
    out = load_npz(p)
    np.testing.assert_array_equal(out["a"], tree["a"])
    np.testing.assert_array_equal(out["b"]["c"], tree["b"]["c"])
