"""First-party SentencePiece unigram tokenizer: protobuf parsing + Viterbi
segmentation, tested against a hand-encoded .model file."""

import struct

import pytest

from loco_asr_tpu.data.tokenizer import (SentencePieceUnigramTokenizer,
                                         parse_sentencepiece_model,
                                         load_tokenizer)


def _encode_piece(piece: str, score: float, typ: int = 1) -> bytes:
    pb = piece.encode("utf-8")
    body = (bytes([0x0A, len(pb)]) + pb            # field 1: piece
            + bytes([0x15]) + struct.pack("<f", score)  # field 2: score
            + bytes([0x18, typ]))                  # field 3: type
    return bytes([0x0A, len(body)]) + body          # ModelProto field 1


def _toy_model() -> bytes:
    pieces = [
        ("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3), ("<pad>", 0.0, 3),
        ("▁", -3.0, 1),
        ("▁the", -1.0, 1), ("▁cat", -1.5, 1), ("▁ca", -4.0, 1),
        ("t", -2.0, 1), ("c", -3.0, 1), ("a", -3.0, 1),
        ("▁lo", -2.0, 1), ("w", -2.0, 1), ("▁low", -2.5, 1),
    ]
    return b"".join(_encode_piece(p, s, t) for p, s, t in pieces)


def test_parse_model_proto():
    pieces = parse_sentencepiece_model(_toy_model())
    assert pieces[0] == ("<unk>", 0.0, 2)
    assert pieces[5][0] == "▁the" and pieces[5][1] == pytest.approx(-1.0)


def test_viterbi_picks_best_segmentation():
    tok = SentencePieceUnigramTokenizer(parse_sentencepiece_model(_toy_model()))
    # "the cat": '▁the' (-1) + '▁cat' (-1.5) = -2.5 beats '▁ca'+'t' (-6)
    ids = tok.encode("the cat")
    assert [tok.pieces[i][0] for i in ids] == ["▁the", "▁cat"]
    # "low": '▁low' (-2.5) beats '▁lo'+'w' (-4)
    ids = tok.encode("low")
    assert [tok.pieces[i][0] for i in ids] == ["▁low"]
    assert tok.decode(tok.encode("the cat")) == "the cat"


def test_unknown_characters_fall_back_to_unk():
    tok = SentencePieceUnigramTokenizer(parse_sentencepiece_model(_toy_model()))
    ids = tok.encode("the Zat")   # 'Z' not in vocab
    assert tok.unk_id in ids
    # decode skips non-normal pieces (unk dropped)
    assert "the" in tok.decode(ids)


def test_special_token_ids():
    tok = SentencePieceUnigramTokenizer(parse_sentencepiece_model(_toy_model()))
    assert tok.bos_token_id == 1 and tok.eos_token_id == 2
    assert tok.vocab_size == 14


def test_load_tokenizer_dispatch(tmp_path):
    p = tmp_path / "toy.model"
    p.write_bytes(_toy_model())
    tok = load_tokenizer(str(p))
    assert isinstance(tok, SentencePieceUnigramTokenizer)
    assert tok("the cat")["input_ids"]
