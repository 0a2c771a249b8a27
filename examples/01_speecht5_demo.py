"""SpeechT5 pipeline demo — the script equivalent of reference notebook 1
('SpeechT5 Demo': ASR, TTS, VC smoke-run).

Runs with random weights out of the box (pass --checkpoint/--tts_checkpoint
for real ones); demonstrates the full device-resident chain:
  waveform -> encoder -> beam decode        (ASR)
  text     -> encoder -> AR mel -> HiFiGAN  (TTS)
  waveform -> encoder -> AR mel             (VC)
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from loco_asr_tpu.models.speecht5 import model as st5, vocoder
from loco_asr_tpu.models.speecht5.config import SpeechT5Config, tiny_config
from loco_asr_tpu.decode.beam import decode_utterance_batch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true", help="tiny config (fast)")
    p.add_argument("--checkpoint", default=None)
    args = p.parse_args()

    cfg = tiny_config(apply_spec_augment=False) if args.tiny else SpeechT5Config()
    rng = jax.random.PRNGKey(0)

    from loco_asr_tpu.pipelines.common import load_speecht5_params
    asr = load_speecht5_params(args.checkpoint, "asr", cfg, rng)
    tts = st5.tts_init(jax.random.fold_in(rng, 1), cfg)
    voc_cfg = vocoder.tiny_hifigan_config() if args.tiny else vocoder.HifiGanConfig()
    voc = vocoder.hifigan_init(jax.random.fold_in(rng, 2), voc_cfg)

    # --- ASR ---
    wav = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 16000)).astype(np.float32) * 0.1)
    tokens, lengths = decode_utterance_batch(asr, cfg, wav, beam_size=4, max_len=20)
    print("ASR beam tokens:", np.asarray(tokens)[0][: int(lengths[0])])

    # --- TTS ---
    ids = jnp.asarray([[4, 7, 9, 12, 2]])
    spk = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, cfg.speaker_embedding_dim)).astype(np.float32))
    mel, mel_lengths = st5.tts_generate(tts, cfg, ids, spk, maxlenratio=4.0)
    print("TTS mel:", mel.shape, "frames:", int(mel_lengths[0]))
    if voc_cfg.model_in_dim == mel.shape[-1]:
        audio = vocoder.hifigan(voc, voc_cfg, mel[:, : int(mel_lengths[0])])
        print("Vocoder waveform:", audio.shape)

    # --- VC (speech -> speech) ---
    s2s = st5.s2s_init(jax.random.fold_in(rng, 3), cfg)
    mel_in = jnp.zeros((1, 4, cfg.num_mel_bins))
    _, vc_mel, _ = st5.s2s_forward(s2s, cfg, wav, mel_in, spk)
    print("VC mel:", vc_mel.shape)


if __name__ == "__main__":
    main()
