"""Shared speech/text embedding space — the script equivalent of reference
notebook 2 ("SpeechT5 unified speech and text embeddings visualization"):
cross-modal cosine similarity, PCA projection of per-frame and mean-pooled
encoder outputs (notebook cells 39-50), and a KMeans clustering of the
pooled shared space with a modality-purity readout.

With random weights the similarities are near zero and the clusters split
by modality; load real checkpoints (--asr_checkpoint/--tts_checkpoint) to
reproduce the shared-space effect.

PCA and KMeans are implemented first-party (SVD / Lloyd's iterations) so
the example runs without sklearn; plots are written only when matplotlib
is importable and --plot_dir is given.
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from loco_asr_tpu.models.speecht5 import model as st5
from loco_asr_tpu.models.speecht5.config import SpeechT5Config, tiny_config
from loco_asr_tpu.pipelines.common import load_speecht5_params


def pca(x: np.ndarray, n_components: int = 3) -> np.ndarray:
    """Project rows of x onto the top principal components (via SVD)."""
    centered = x - x.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    return centered @ vt[:n_components].T


def kmeans(x: np.ndarray, k: int = 2, iters: int = 50, seed: int = 0):
    """Lloyd's algorithm; returns (assignments, centroids)."""
    rng = np.random.default_rng(seed)
    centroids = x[rng.choice(len(x), size=k, replace=False)]
    assign = np.zeros(len(x), dtype=np.int64)
    for _ in range(iters):
        d = ((x[:, None, :] - centroids[None]) ** 2).sum(-1)
        new_assign = d.argmin(axis=1)
        if (new_assign == assign).all():
            break
        assign = new_assign
        for j in range(k):
            if (assign == j).any():
                centroids[j] = x[assign == j].mean(axis=0)
    return assign, centroids


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--asr_checkpoint", default=None)
    p.add_argument("--tts_checkpoint", default=None)
    p.add_argument("--plot_dir", default=None,
                   help="write pca_frames.png / pca_pooled.png here")
    args = p.parse_args()

    cfg = tiny_config(apply_spec_augment=False) if args.tiny else SpeechT5Config()
    asr = load_speecht5_params(args.asr_checkpoint, "asr", cfg, jax.random.PRNGKey(0))
    tts = load_speecht5_params(args.tts_checkpoint, "tts", cfg, jax.random.PRNGKey(1))

    wav = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 16000)).astype(np.float32) * 0.1)
    ids = jnp.asarray([[4, 7, 9, 12, 2], [5, 6, 2, 1, 1],
                       [3, 8, 10, 2, 1], [11, 4, 6, 9, 2]])

    speech_emb, _ = st5.encode_speech(asr, cfg, wav)
    text_emb = st5.encode_text(tts, cfg, ids)

    # --- cosine similarity of mean-pooled embeddings (cross-modal) ---
    s = np.asarray(speech_emb.mean(axis=1))
    t = np.asarray(text_emb.mean(axis=1))
    s_n = s / np.linalg.norm(s, axis=-1, keepdims=True)
    t_n = t / np.linalg.norm(t, axis=-1, keepdims=True)
    print("speech x text cosine similarity matrix:\n", s_n @ t_n.T)

    # --- PCA of per-frame embeddings, each modality separately (cells 39-42) ---
    dim = np.asarray(speech_emb).shape[-1]
    frames_speech = np.asarray(speech_emb).reshape(-1, dim)
    frames_text = np.asarray(text_emb).reshape(-1, dim)
    pca_speech = pca(frames_speech)
    pca_text = pca(frames_text)
    print(f"per-frame PCA: speech {pca_speech.shape}, text {pca_text.shape}; "
          f"speech PC1 var {pca_speech[:, 0].var():.4f}, "
          f"text PC1 var {pca_text[:, 0].var():.4f}")

    # --- PCA of mean-pooled embeddings, both modalities together (cells 46-50) ---
    pooled = np.concatenate([s, t], axis=0)
    pca_pooled = pca(pooled)
    print("pooled PCA coordinates (first 4 rows = speech, last 4 = text):")
    print(np.round(pca_pooled, 4))

    # --- KMeans over the pooled shared space: does k=2 split by modality? ---
    assign, _ = kmeans(pooled, k=2)
    modality = np.array([0] * len(s) + [1] * len(t))
    agree = max((assign == modality).mean(), (assign != modality).mean())
    print(f"kmeans(k=2) over pooled space: assignments {assign.tolist()}, "
          f"modality purity {agree:.2f} "
          f"(1.0 = clusters are the modalities, i.e. NOT a shared space)")

    if args.plot_dir:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            print("matplotlib unavailable; skipping plots")
            return
        import os
        os.makedirs(args.plot_dir, exist_ok=True)
        for name, (a, b) in {"pca_frames": (pca_speech, pca_text),
                             "pca_pooled": (pca_pooled[:len(s)], pca_pooled[len(s):])}.items():
            fig = plt.figure(figsize=(10, 7))
            ax = fig.add_subplot(projection="3d")
            ax.scatter3D(a[:, 0], a[:, 1], a[:, 2], s=10, c="b", label="speech")
            ax.scatter3D(b[:, 0], b[:, 1], b[:, 2], s=10, c="r", label="text")
            ax.set_xlabel("PC1"), ax.set_ylabel("PC2"), ax.set_zlabel("PC3")
            ax.legend()
            out = os.path.join(args.plot_dir, f"{name}.png")
            fig.savefig(out)
            plt.close(fig)
            print("wrote", out)


if __name__ == "__main__":
    main()
