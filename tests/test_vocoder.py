"""HiFi-GAN vocoder parity vs HF torch (tiny random config) and the
speech-to-speech wrapper."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from transformers import SpeechT5HifiGanConfig
from transformers.models.speecht5.modeling_speecht5 import (
    SpeechT5ForSpeechToSpeech, SpeechT5HifiGan)

import jax
import jax.numpy as jnp

from loco_asr_tpu.models.speecht5 import vocoder
from loco_asr_tpu.models.speecht5 import model as m
from loco_asr_tpu.models.speecht5.config import tiny_config
from loco_asr_tpu.models.speecht5.import_torch import load_hf_state_dict
from tests.test_speecht5_parity import hf_tiny_config


def test_hifigan_parity():
    torch.manual_seed(0)
    hf_cfg = SpeechT5HifiGanConfig(
        model_in_dim=8, upsample_initial_channel=16,
        upsample_rates=[4, 4], upsample_kernel_sizes=[8, 8],
        resblock_kernel_sizes=[3, 7],
        resblock_dilation_sizes=[[1, 3], [1, 3]])
    hf = SpeechT5HifiGan(hf_cfg).eval()
    params = vocoder.load_hf_hifigan(hf.state_dict())
    cfg = vocoder.tiny_hifigan_config()

    mel = np.random.default_rng(0).standard_normal((2, 12, 8)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(mel)).numpy()
    got = np.asarray(vocoder.hifigan(params, cfg, jnp.asarray(mel)))
    assert got.shape == want.shape  # (2, 12*16)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_hifigan_unbatched():
    cfg = vocoder.tiny_hifigan_config()
    params = vocoder.hifigan_init(jax.random.PRNGKey(0), cfg)
    mel = jnp.zeros((5, 8))
    wav = vocoder.hifigan(params, cfg, mel)
    assert wav.shape == (5 * 16,)


def test_s2s_forward_parity():
    torch.manual_seed(1)
    hf = SpeechT5ForSpeechToSpeech(
        hf_tiny_config(speech_decoder_prenet_dropout=0.0)).eval()
    hf.speecht5.decoder.prenet._consistent_dropout = lambda x, p: x
    params = load_hf_state_dict(hf.state_dict())
    cfg = tiny_config(apply_spec_augment=False, mask_time_prob=0.0,
                      speech_decoder_prenet_dropout=0.0)
    rng = np.random.default_rng(2)
    wav = rng.standard_normal((1, 480)).astype(np.float32) * 0.1
    mel_in = rng.standard_normal((1, 5, cfg.num_mel_bins)).astype(np.float32)
    spk = rng.standard_normal((1, cfg.speaker_embedding_dim)).astype(np.float32)
    with torch.no_grad():
        want = hf(input_values=torch.from_numpy(wav),
                  decoder_input_values=torch.from_numpy(mel_in),
                  speaker_embeddings=torch.from_numpy(spk)).spectrogram.numpy()
    _, after, _ = m.s2s_forward(params, cfg, jnp.asarray(wav),
                                jnp.asarray(mel_in), jnp.asarray(spk))
    np.testing.assert_allclose(np.asarray(after), want, atol=2e-4, rtol=2e-4)
