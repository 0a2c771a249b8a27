"""ConversationAsrDataset: conversation-window ASR training examples.

Pins the window-construction semantics against the reference's
conversation-stream design:
  * chronological utterance order by the utt-id timestamp key
    (reference lms/src/utils.py:110-112; utt-id scheme
    fisher_data_prep.sh:130-137) regardless of text-file line order;
  * recording+channel separation (Fisher reco id = callid-side,
    data/fisher_prep.py) — conversations stay intact
    (split_fisher_data_based_on_ids.py:53);
  * text concatenation with separator tokens between utterances
    (the LM stream's EOS-between-utterances, lms/src/utils.py:129-130);
  * windows split at utterance boundaries, audio = concatenated
    segment crops.
"""

import wave

import numpy as np
import pytest


SR = 16000


@pytest.fixture(scope="module")
def conv_kaldi_dir(tmp_path_factory):
    """Fisher-shaped Kaldi dir: one 2-channel call (both sides as separate
    recordings, per-channel wav.scp entries) + a second call; text lines
    deliberately OUT of chronological order."""
    root = tmp_path_factory.mktemp("conv_kaldi")
    rng = np.random.default_rng(0)

    def write_wav(path, seconds):
        pcm = (rng.standard_normal(int(SR * seconds)) * 3000).astype(np.int16)
        with wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SR)
            w.writeframes(pcm.tobytes())

    write_wav(root / "callA.wav", 6.0)   # rec1-A: 4 utts of 1s
    write_wav(root / "callB.wav", 4.0)   # rec1-B: 2 utts
    write_wav(root / "call2.wav", 3.0)   # rec2-A: 2 utts
    # centisecond zero-padded utt ids; lines shuffled on purpose
    (root / "text").write_text(
        "rec1-A-000200-000300 third a\n"
        "rec1-A-000000-000100 first a\n"
        "rec1-B-000050-000150 first b\n"
        "rec1-A-000100-000200 second a\n"
        "rec2-A-000000-000100 first two\n"
        "rec1-A-000300-000400 fourth a\n"
        "rec1-B-000250-000350 second b\n"
        "rec2-A-000150-000250 second two\n")
    (root / "segments").write_text(
        "rec1-A-000000-000100 rec1-A 0.0 1.0\n"
        "rec1-A-000100-000200 rec1-A 1.0 2.0\n"
        "rec1-A-000200-000300 rec1-A 2.0 3.0\n"
        "rec1-A-000300-000400 rec1-A 3.0 4.0\n"
        "rec1-B-000050-000150 rec1-B 0.5 1.5\n"
        "rec1-B-000250-000350 rec1-B 2.5 3.5\n"
        "rec2-A-000000-000100 rec2-A 0.0 1.0\n"
        "rec2-A-000150-000250 rec2-A 1.5 2.5\n")
    (root / "wav.scp").write_text(
        f"rec1-A {root}/callA.wav\n"
        f"rec1-B {root}/callB.wav\n"
        f"rec2-A {root}/call2.wav\n")
    return str(root)


def test_windows_chronological_and_channel_separated(conv_kaldi_dir):
    from loco_asr_tpu.data.asr_dataset import ConversationAsrDataset

    ds = ConversationAsrDataset(conv_kaldi_dir, window_seconds=1000.0)
    # one window per recording+channel at a huge budget
    by_reco = {w.reco_id: w for w in ds.windows}
    assert set(by_reco) == {"rec1-A", "rec1-B", "rec2-A"}
    assert len(ds) == 3
    # chronological despite shuffled text lines
    assert by_reco["rec1-A"].utt_ids == [
        "rec1-A-000000-000100", "rec1-A-000100-000200",
        "rec1-A-000200-000300", "rec1-A-000300-000400"]
    assert by_reco["rec1-A"].texts == ["first a", "second a",
                                       "third a", "fourth a"]
    assert by_reco["rec1-B"].utt_ids == [
        "rec1-B-000050-000150", "rec1-B-000250-000350"]
    # channels never mix
    assert all(u.startswith("rec1-B") for u in by_reco["rec1-B"].utt_ids)
    assert by_reco["rec1-A"].text == "first a second a third a fourth a"


def test_windows_pack_at_utterance_boundaries(conv_kaldi_dir):
    from loco_asr_tpu.data.asr_dataset import ConversationAsrDataset

    # 2.5s budget: rec1-A's four 1s utts -> [2, 2]; rec1-B's two 1s -> [2];
    # rec2-A's two 1s -> [2]
    ds = ConversationAsrDataset(conv_kaldi_dir, window_seconds=2.5)
    wins = [w for w in ds.windows if w.reco_id == "rec1-A"]
    assert [len(w.utt_ids) for w in wins] == [2, 2]
    assert wins[0].utt_ids == ["rec1-A-000000-000100", "rec1-A-000100-000200"]
    assert wins[1].utt_ids == ["rec1-A-000200-000300", "rec1-A-000300-000400"]
    assert wins[0].seconds == pytest.approx(2.0)
    # an utterance is never split across windows
    all_utts = [u for w in ds.windows for u in w.utt_ids]
    assert len(all_utts) == len(set(all_utts)) == 8

    # 1.5s budget: every 1s utterance gets its own window
    ds1 = ConversationAsrDataset(conv_kaldi_dir, window_seconds=1.5)
    assert all(len(w.utt_ids) == 1 for w in ds1.windows)
    assert len(ds1.windows) == 8


def test_window_audio_is_concatenated_segment_crops(conv_kaldi_dir):
    from loco_asr_tpu.data.asr_dataset import (ConversationAsrDataset,
                                               KaldiAsrDataset)

    ds = ConversationAsrDataset(conv_kaldi_dir, window_seconds=2.5)
    base = KaldiAsrDataset(conv_kaldi_dir)
    win = next(w for w in ds.windows if w.reco_id == "rec1-A")
    wav = ds.load_window_waveform(win)
    assert len(wav) == 2 * SR
    # equals the two per-utterance crops back to back
    ex = {e.utt_id: e for e in base.examples}
    ref = np.concatenate([base.load_waveform(ex[u]) for u in win.utt_ids])
    np.testing.assert_array_equal(wav, ref)


def test_batches_separator_tokens_and_shapes(conv_kaldi_dir):
    from loco_asr_tpu.data.asr_dataset import ConversationAsrDataset
    from loco_asr_tpu.data.tokenizer import CharTokenizer

    tok = CharTokenizer()
    ds = ConversationAsrDataset(conv_kaldi_dir, window_seconds=2.5)
    batches = list(ds.batches(tok, batch_size=2, eos_id=1,
                              audio_multiple=SR, label_multiple=8))
    assert sum(len(b["utt_ids"]) for b in batches) == len(ds)
    b = batches[0]
    assert b["input_values"].shape == b["attention_mask"].shape
    assert b["input_values"].shape[0] == b["labels"].shape[0]
    # find the rec1-A first window's labels and check the separator layout:
    # tok(t1) + [sep] + tok(t2) + [sep==eos]
    for batch in batches:
        for row, wid, text in zip(batch["labels"], batch["utt_ids"],
                                  batch["texts"]):
            if not wid.startswith("rec1-A"):
                continue
            valid = [int(t) for t in row if t != -100]
            parts = text.split()   # two utterances, each "<word> a"
            # separator appears exactly twice (after each utterance)
            assert valid.count(1) == 2
            assert valid[-1] == 1
            # decoding the non-sep prefix reproduces the first utterance
            first_seg = valid[:valid.index(1)]
            assert tok.decode(first_seg) == " ".join(parts[:2])


def test_segmentless_utterances_become_singleton_windows(tmp_path):
    """Utterances without a segments entry (whole-recording utts) form
    one-utterance windows and never merge with others."""
    import wave as wave_mod

    root = tmp_path / "k"
    root.mkdir()
    rng = np.random.default_rng(1)
    for rec, secs in [("solo1", 1.0), ("solo2", 0.5)]:
        pcm = (rng.standard_normal(int(SR * secs)) * 3000).astype(np.int16)
        with wave_mod.open(str(root / f"{rec}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SR)
            w.writeframes(pcm.tobytes())
    (root / "text").write_text("solo1 hello world\nsolo2 bye\n")
    (root / "wav.scp").write_text(
        f"solo1 {root}/solo1.wav\nsolo2 {root}/solo2.wav\n")
    # no segments file at all
    from loco_asr_tpu.data.asr_dataset import ConversationAsrDataset

    ds = ConversationAsrDataset(str(root), window_seconds=1000.0)
    assert len(ds) == 2
    assert all(len(w.utt_ids) == 1 for w in ds.windows)
    wav = ds.load_window_waveform(ds.windows[0])
    assert len(wav) == SR  # the whole 1.0 s recording


def test_eos_appended_after_truncation(conv_kaldi_dir):
    from loco_asr_tpu.data.asr_dataset import ConversationAsrDataset
    from loco_asr_tpu.data.tokenizer import CharTokenizer

    ds = ConversationAsrDataset(conv_kaldi_dir, window_seconds=1000.0)
    b = next(ds.batches(CharTokenizer(), batch_size=3, eos_id=1,
                        max_label_len=8, label_multiple=8))
    for row in b["labels"]:
        valid = [int(t) for t in row if t != -100]
        assert len(valid) <= 8
        assert valid[-1] == 1
    # the cut is counted, not silent
    assert b["truncation"]["label_tokens"] > 0


def test_label_rows_never_exceed_cap_with_bos_and_eos(conv_kaldi_dir):
    """bos+eos room is reserved BEFORE truncation (rows previously could
    reach max_label_len+1 with both set)."""
    from loco_asr_tpu.data.asr_dataset import (ConversationAsrDataset,
                                               KaldiAsrDataset)
    from loco_asr_tpu.data.tokenizer import CharTokenizer

    tok = CharTokenizer()
    for ds in (ConversationAsrDataset(conv_kaldi_dir, window_seconds=1000.0),
               KaldiAsrDataset(conv_kaldi_dir)):
        for b in ds.batches(tok, batch_size=3, bos_id=2, eos_id=1,
                            max_label_len=8, label_multiple=8):
            for row in b["labels"]:
                valid = [int(t) for t in row if t != -100]
                assert len(valid) <= 8
                assert valid[0] == 2 and valid[-1] == 1


def test_window_audio_crop_drops_labels_at_utterance_boundary(conv_kaldi_dir):
    """max_seconds smaller than the window: audio is cut at an utterance
    boundary and the cut utterances' TEXT leaves the labels too (training
    never sees transcript tokens for speech the crop removed); the drop
    is reported in the truncation counters."""
    from loco_asr_tpu.data.asr_dataset import ConversationAsrDataset
    from loco_asr_tpu.data.tokenizer import CharTokenizer

    tok = CharTokenizer()
    ds = ConversationAsrDataset(conv_kaldi_dir, window_seconds=1000.0)
    # rec1-A window = four 1s utterances; cap at 2.5s -> keep exactly 2
    trunc_utts = 0
    seen = False
    for b in ds.batches(tok, batch_size=1, eos_id=1, max_seconds=2.5,
                        audio_multiple=SR):
        trunc_utts += b["truncation"]["utterances"]
        wid = b["utt_ids"][0]
        if not wid.startswith("rec1-A"):
            continue
        seen = True
        assert int(b["attention_mask"][0].sum()) == 2 * SR
        assert b["texts"][0] == "first a second a"
        valid = [int(t) for t in b["labels"][0] if t != -100]
        # two separators only (one per KEPT utterance)
        assert valid.count(1) == 2
        decoded = tok.decode([t for t in valid[:valid.index(1)]])
        assert decoded == "first a"
    assert seen
    # rec1-A drops 2 utts, rec1-B and rec2-A fit (2.0s each)
    assert trunc_utts == 2


def test_segmentless_overlong_window_counts_cropped_samples(tmp_path):
    """A segment-less (unknown-duration) window longer than max_seconds is
    cropped mid-utterance — the only legal cut — and the removed samples
    are counted."""
    import wave as wave_mod

    root = tmp_path / "k"
    root.mkdir()
    rng = np.random.default_rng(2)
    pcm = (rng.standard_normal(3 * SR) * 3000).astype(np.int16)
    with wave_mod.open(str(root / "solo.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(pcm.tobytes())
    (root / "text").write_text("solo hello there\n")
    (root / "wav.scp").write_text(f"solo {root}/solo.wav\n")
    from loco_asr_tpu.data.asr_dataset import ConversationAsrDataset
    from loco_asr_tpu.data.tokenizer import CharTokenizer

    ds = ConversationAsrDataset(str(root), window_seconds=1000.0)
    b = next(ds.batches(CharTokenizer(), batch_size=1, eos_id=1,
                        max_seconds=1.0, audio_multiple=SR))
    assert int(b["attention_mask"][0].sum()) == SR
    assert b["truncation"]["samples"] == 2 * SR
    assert b["truncation"]["utterances"] == 0
