"""Audio front-end numerics: mel filterbank/log-mel vs the HF feature
extractor (the reference's processor), SPHERE/WAV decoding, resampling."""

import struct
import wave

import numpy as np
import pytest

import jax.numpy as jnp

from loco_asr_tpu.ops import audio


# ---------------------------------------------------------------------------
# log-mel parity vs transformers (the reference's SpeechT5Processor backend)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def hf_extractor():
    pytest.importorskip("transformers")
    from transformers.models.speecht5.feature_extraction_speecht5 import (
        SpeechT5FeatureExtractor)
    return SpeechT5FeatureExtractor()


def test_mel_filter_bank_matches_hf(hf_extractor):
    ours = audio.mel_filter_bank(513, 80, 80.0, 7600.0, 16000)
    np.testing.assert_allclose(ours, hf_extractor.mel_filters, atol=1e-5)


def test_log_mel_matches_hf(hf_extractor):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    ref = hf_extractor._extract_mel_features(wav)
    got = np.asarray(audio.log_mel_spectrogram(jnp.asarray(wav)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_zero_mean_unit_var_matches_hf(hf_extractor):
    rng = np.random.default_rng(1)
    wavs = [rng.standard_normal(300).astype(np.float32) * 0.3 + 0.1,
            rng.standard_normal(300).astype(np.float32)]
    wavs[1][200:] = 0.0
    mask = np.ones((2, 300), np.int32)
    mask[1, 200:] = 0
    ref = hf_extractor.zero_mean_unit_var_norm(list(np.stack(wavs)), list(mask))
    got = audio.zero_mean_unit_var(jnp.stack(wavs), jnp.asarray([300, 200]))
    np.testing.assert_allclose(np.asarray(got), np.stack(ref), atol=1e-5)


# ---------------------------------------------------------------------------
# decoding
# ---------------------------------------------------------------------------

def _write_wav(path, pcm16, rate=16000, channels=1):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm16.tobytes())


def _write_sphere(path, pcm16, rate=8000, channels=1, encoding="pcm"):
    if encoding == "ulaw":
        data = _linear_to_ulaw(pcm16).tobytes()
        n_bytes = 1
    else:
        data = pcm16.tobytes()
        n_bytes = 2
    header = (
        "NIST_1A\n   1024\n"
        f"sample_rate -i {rate}\n"
        f"channel_count -i {channels}\n"
        f"sample_n_bytes -i {n_bytes}\n"
        f"sample_coding -s{len(encoding if encoding != 'pcm' else 'pcm')} "
        f"{'ulaw' if encoding == 'ulaw' else 'pcm'}\n"
        "sample_byte_format -s2 01\n"
        "end_head\n")
    with open(path, "wb") as f:
        f.write(header.encode().ljust(1024, b" "))
        f.write(data)


def _linear_to_ulaw(pcm: np.ndarray) -> np.ndarray:
    """Encoder for test round-trips (G.711 mu-law)."""
    BIAS, CLIP = 0x84, 32635
    x = pcm.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    x = np.clip(np.abs(x), 0, CLIP) + BIAS
    exponent = np.floor(np.log2(x / 128.0)).astype(np.int32)
    exponent = np.clip(exponent, 0, 7)
    mantissa = (x >> (exponent + 3)) & 0x0F
    return (~(sign | (exponent << 4) | mantissa)).astype(np.uint8)


def test_read_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(1000) * 8000).astype(np.int16)
    p = tmp_path / "a.wav"
    _write_wav(p, pcm)
    wav, sr = audio.read_wav(str(p))
    assert sr == 16000
    np.testing.assert_allclose(wav, pcm.astype(np.float32) / 32768.0, atol=1e-6)


def test_read_sphere_pcm_two_channel(tmp_path):
    t = np.arange(800)
    ch_a = (np.sin(2 * np.pi * t / 80) * 10000).astype(np.int16)
    ch_b = (np.cos(2 * np.pi * t / 40) * 5000).astype(np.int16)
    inter = np.empty(1600, np.int16)
    inter[0::2], inter[1::2] = ch_a, ch_b
    p = tmp_path / "a.sph"
    _write_sphere(p, inter, channels=2)
    wav_a, sr = audio.read_sphere(str(p), channel=0)
    wav_b, _ = audio.read_sphere(str(p), channel=1)
    assert sr == 8000
    np.testing.assert_allclose(wav_a, ch_a / 32768.0, atol=1e-6)
    np.testing.assert_allclose(wav_b, ch_b / 32768.0, atol=1e-6)


def test_read_sphere_ulaw_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pcm = (rng.standard_normal(500) * 6000).astype(np.int16)
    p = tmp_path / "u.sph"
    _write_sphere(p, pcm, encoding="ulaw")
    wav, sr = audio.read_sphere(str(p))
    # mu-law is lossy: ~2% relative error at 8-bit companding
    err = np.abs(wav * 32768.0 - pcm)
    assert np.median(err / (np.abs(pcm) + 64)) < 0.05


def test_load_audio_resamples(tmp_path):
    # 1 kHz tone at 8 kHz -> 16 kHz: spectrum peak must stay at 1 kHz
    t = np.arange(8000) / 8000.0
    tone = (np.sin(2 * np.pi * 1000 * t) * 16000).astype(np.int16)
    p = tmp_path / "t.wav"
    _write_wav(p, tone, rate=8000)
    wav, sr = audio.load_audio(str(p), target_sr=16000)
    assert sr == 16000 and abs(len(wav) - 16000) <= 2
    spec = np.abs(np.fft.rfft(wav[1000:9000] * np.hanning(8000)))
    freqs = np.fft.rfftfreq(8000, 1 / 16000)
    assert abs(freqs[np.argmax(spec)] - 1000.0) < 10.0


def test_resample_identity():
    x = np.random.default_rng(2).standard_normal(1000).astype(np.float32)
    assert audio.resample(x, 16000, 16000) is x


# ---------------------------------------------------------------------------
# SpecAugment mask sampling
# ---------------------------------------------------------------------------

def test_compute_mask_indices_properties():
    import jax

    rng = jax.random.PRNGKey(0)
    lengths = jnp.asarray([50, 20])
    mask = audio.compute_mask_indices(rng, (2, 50), mask_prob=0.5,
                                      mask_length=10, lengths=lengths,
                                      min_masks=2)
    mask = np.asarray(mask)
    assert mask.shape == (2, 50)
    assert not mask[1, 20:].any()          # nothing beyond valid length
    assert mask[0].sum() >= 10             # at least min_masks spans
    # spans have the configured length contiguity: runs of >= min(mask_length, valid)
    assert mask.sum() > 0
