"""Shared speech/text embedding space — the script equivalent of reference
notebook 2 (cross-modal cosine similarity of SpeechT5 encoder outputs).

With random weights the similarities are near zero; load real checkpoints
(--asr_checkpoint/--tts_checkpoint) to reproduce the shared-space effect.
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from loco_asr_tpu.models.speecht5 import model as st5
from loco_asr_tpu.models.speecht5.config import SpeechT5Config, tiny_config
from loco_asr_tpu.pipelines.common import load_speecht5_params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--asr_checkpoint", default=None)
    p.add_argument("--tts_checkpoint", default=None)
    args = p.parse_args()

    cfg = tiny_config(apply_spec_augment=False) if args.tiny else SpeechT5Config()
    asr = load_speecht5_params(args.asr_checkpoint, "asr", cfg, jax.random.PRNGKey(0))
    tts = load_speecht5_params(args.tts_checkpoint, "tts", cfg, jax.random.PRNGKey(1))

    wav = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 16000)).astype(np.float32) * 0.1)
    ids = jnp.asarray([[4, 7, 9, 12, 2], [5, 6, 2, 1, 1]])

    speech_emb, _ = st5.encode_speech(asr, cfg, wav)
    text_emb = st5.encode_text(tts, cfg, ids)

    s = np.asarray(speech_emb.mean(axis=1))
    t = np.asarray(text_emb.mean(axis=1))
    s = s / np.linalg.norm(s, axis=-1, keepdims=True)
    t = t / np.linalg.norm(t, axis=-1, keepdims=True)
    print("speech x text cosine similarity matrix:\n", s @ t.T)


if __name__ == "__main__":
    main()
