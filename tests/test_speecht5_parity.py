"""Numerical parity of our SpeechT5 against the HF torch implementation.

Strategy (SURVEY.md §4): instantiate small random HF SpeechT5 models on CPU
(no network), import their state dicts through import_torch, and compare
forwards to <1e-4 — well inside the <1e-3 embedding MAE budget from
BASELINE.md at full scale.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from transformers import SpeechT5Config as HFConfig
from transformers.models.speecht5.modeling_speecht5 import (
    SpeechT5EncoderWithSpeechPrenet,
    SpeechT5EncoderWithTextPrenet,
    SpeechT5ForSpeechToText,
)

import jax.numpy as jnp

from loco_asr_tpu.models.speecht5 import model as m
from loco_asr_tpu.models.speecht5.config import SpeechT5Config, tiny_config
from loco_asr_tpu.models.speecht5.import_torch import load_hf_state_dict


def hf_tiny_config(**over):
    base = dict(
        vocab_size=37,
        hidden_size=24,
        encoder_layers=2,
        encoder_attention_heads=2,
        encoder_ffn_dim=48,
        decoder_layers=2,
        decoder_attention_heads=2,
        decoder_ffn_dim=48,
        conv_dim=[16, 16],
        conv_stride=[5, 2],
        conv_kernel=[10, 3],
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        max_speech_positions=256,
        max_text_positions=64,
        encoder_max_relative_position=20,
        speech_decoder_prenet_units=16,
        speech_decoder_postnet_units=16,
        num_mel_bins=8,
        speaker_embedding_dim=12,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        positional_dropout=0.0,
        feat_proj_dropout=0.0,
        encoder_layerdrop=0.0,
        decoder_layerdrop=0.0,
        apply_spec_augment=False,
    )
    base.update(over)
    return HFConfig(**base)


def our_tiny_config(**over):
    return tiny_config(apply_spec_augment=False, mask_time_prob=0.0, **over)


@pytest.fixture(scope="module")
def speech_encoder_pair():
    torch.manual_seed(0)
    hf = SpeechT5EncoderWithSpeechPrenet(hf_tiny_config()).eval()
    params = load_hf_state_dict({f"encoder.{k}": v for k, v in hf.state_dict().items()})
    return hf, params, our_tiny_config()


def test_speech_encoder_parity_unmasked(speech_encoder_pair):
    hf, params, cfg = speech_encoder_pair
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 400), np.float32) * 0.1
    with torch.no_grad():
        ref = hf(torch.from_numpy(wav)).last_hidden_state.numpy()
    got, mask = m.encode_speech(params, cfg, jnp.asarray(wav))
    assert mask is None
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4, rtol=1e-4)


def test_speech_encoder_parity_padded(speech_encoder_pair):
    hf, params, cfg = speech_encoder_pair
    rng = np.random.default_rng(1)
    wav = rng.standard_normal((2, 500), np.float32) * 0.1
    attn = np.ones((2, 500), np.int64)
    attn[1, 320:] = 0
    wav[1, 320:] = 0.0
    with torch.no_grad():
        ref = hf(torch.from_numpy(wav), attention_mask=torch.from_numpy(attn)).last_hidden_state.numpy()
    got, mask = m.encode_speech(params, cfg, jnp.asarray(wav), jnp.asarray(attn))
    got, mask = np.asarray(got), np.asarray(mask)
    # Compare only valid frames: padded frames differ (HF runs them through
    # attention with mask, values at pad positions are unspecified).
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], atol=1e-4, rtol=1e-4)


def test_text_encoder_parity():
    torch.manual_seed(1)
    hf = SpeechT5EncoderWithTextPrenet(hf_tiny_config()).eval()
    params = load_hf_state_dict({f"encoder.{k}": v for k, v in hf.state_dict().items()})
    cfg = our_tiny_config()
    ids = np.array([[4, 7, 9, 12, 2], [5, 6, 2, 1, 1]], np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
    got = np.asarray(m.encode_text(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


@pytest.fixture(scope="module")
def asr_pair():
    torch.manual_seed(2)
    hf = SpeechT5ForSpeechToText(hf_tiny_config()).eval()
    params = load_hf_state_dict(hf.state_dict())
    return hf, params, our_tiny_config()


@pytest.mark.slow
def test_asr_seq2seq_parity(asr_pair):
    hf, params, cfg = asr_pair
    rng = np.random.default_rng(2)
    wav = rng.standard_normal((2, 480), np.float32) * 0.1
    dec_ids = np.array([[2, 5, 9, 11], [2, 8, 3, 6]], np.int64)
    with torch.no_grad():
        ref = hf(input_values=torch.from_numpy(wav),
                 decoder_input_ids=torch.from_numpy(dec_ids)).logits.numpy()
    got = np.asarray(m.asr_forward(params, cfg, jnp.asarray(wav), jnp.asarray(dec_ids)))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_asr_incremental_decode_matches_full(asr_pair):
    """KV-cached step decoding must reproduce the teacher-forced logits."""
    from loco_asr_tpu.models.speecht5 import decoder as dec

    hf, params, cfg = asr_pair
    rng = np.random.default_rng(3)
    wav = rng.standard_normal((1, 480), np.float32) * 0.1
    dec_ids = np.array([[2, 5, 9, 11, 7]], np.int64)

    full = np.asarray(m.asr_forward(params, cfg, jnp.asarray(wav), jnp.asarray(dec_ids)))

    enc_hidden, enc_mask = m.encode_speech(params, cfg, jnp.asarray(wav))
    caches = dec.init_decode_cache(cfg, 1, dec_ids.shape[1])
    step_logits = []
    for t in range(dec_ids.shape[1]):
        logits, caches = m.asr_decode_step(
            params, cfg, jnp.asarray(dec_ids[:, t:t + 1]), jnp.int32(t),
            enc_hidden, enc_mask, caches)
        step_logits.append(np.asarray(logits))
    got = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(got, full, atol=1e-4, rtol=1e-4)
