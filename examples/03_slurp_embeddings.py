"""SLURP embeddings exploration — the script equivalent of reference
notebook 3 (collate + encoder over SLURP batches).

Builds a synthetic mini-SLURP when --data_path is absent so the full
extract -> inspect loop runs anywhere.
"""

import argparse
import json
import os
import tempfile
import wave

import numpy as np
import jax
import jax.numpy as jnp

from loco_asr_tpu.data.slurp import SlurpDataset, batched, onehot_intent
from loco_asr_tpu.models.speecht5 import model as st5
from loco_asr_tpu.models.speecht5.config import SpeechT5Config, tiny_config
from loco_asr_tpu.ops import audio


def make_synthetic_slurp(root: str, n: int = 8) -> str:
    os.makedirs(os.path.join(root, "dataset/slurp"), exist_ok=True)
    os.makedirs(os.path.join(root, "audio/slurp_real"), exist_ok=True)
    rng = np.random.default_rng(0)
    intents = ["alarm_set", "play_music", "weather_query"]
    with open(os.path.join(root, "dataset/slurp/train.jsonl"), "w") as f:
        for i in range(n):
            fname = f"utt_{i}.wav"
            pcm = (rng.standard_normal(int(16000 * 0.4)) * 3000).astype(np.int16)
            with wave.open(os.path.join(root, "audio/slurp_real", fname), "wb") as w:
                w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
                w.writeframes(pcm.tobytes())
            f.write(json.dumps({
                "slurp_id": i, "sentence": f"synthetic sentence {i}",
                "intent": intents[i % 3],
                "recordings": [{"file": fname}]}) + "\n")
    return root


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", default=None)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    data_path = args.data_path or make_synthetic_slurp(tempfile.mkdtemp())
    cfg = tiny_config(apply_spec_augment=False) if args.tiny else SpeechT5Config()
    params = st5.asr_init(jax.random.PRNGKey(0), cfg)
    fwd = jax.jit(lambda w, m: st5.encode_speech(params, cfg, w, m))

    ds = SlurpDataset(data_path, mode="train", task="intent")
    print(f"dataset: {len(ds)} utterances, {len(ds.intents)} intents")

    for batch in batched(ds, 4):
        wavs = [audio.load_audio(e.audio_path, 16000)[0] for e in batch]
        T = max(len(w) for w in wavs)
        x = np.zeros((len(wavs), T), np.float32)
        m = np.zeros((len(wavs), T), np.int32)
        for i, w in enumerate(wavs):
            x[i, :len(w)] = w
            m[i, :len(w)] = 1
        emb, fmask = fwd(jnp.asarray(x), jnp.asarray(m))
        for e, L in zip(batch, np.asarray(fmask.sum(-1))):
            tgt = onehot_intent(e.label)
            print(f"  slurp_id={e.slurp_id} frames={int(L)} "
                  f"intent={e.label} (class {int(tgt.argmax())})")
        break


if __name__ == "__main__":
    main()
