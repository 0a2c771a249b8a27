"""SLURP intent classifier: pooling head + linear layer over frozen
SpeechT5 embeddings.

Exact math of the reference IntentClassifier (speech_text/intent_classifier.py):
  * average: mean over time (":24-26")
  * max: elementwise max over time (":28-30")
  * attention: single learned query q [1, D] init randn*0.001 (":17");
    alpha = softmax(x q^T, axis=time); out = alpha^T x (":32-36")
  * classifier: Linear(D, num_classes) (":20-22")

Extended beyond the reference with masked pooling (the reference pools over
zero-padded frames, silently including padding in mean/max -- we reproduce
that when ``lengths`` is None for parity, and do the right thing when
lengths are provided).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import layers

POOLINGS = ("average", "max", "attention")


def intent_classifier_init(rng, *, embedding_size: int = 768,
                           num_classes: int = 101, dtype=jnp.float32,
                           hidden_dims: tuple = ()) -> Dict:
    """``hidden_dims`` empty reproduces the reference's single Linear head;
    non-empty builds the MLP variant (BASELINE config 2): Linear+GELU
    blocks before the final projection."""
    kq, kc = jax.random.split(rng)
    p = {"q": jax.random.normal(kq, (1, embedding_size), dtype) * 0.001}
    dims = [embedding_size, *hidden_dims, num_classes]
    mlp = {}
    for i in range(len(dims) - 1):
        kc, sub = jax.random.split(kc)
        mlp[str(i)] = layers.dense_init(sub, dims[i], dims[i + 1], dtype=dtype)
    p["classifier"] = mlp if hidden_dims else mlp["0"]
    return p


def _classifier_head(params: Dict, pooled: jnp.ndarray) -> jnp.ndarray:
    cls = params["classifier"]
    if "kernel" in cls:  # single linear (reference head)
        return layers.dense(cls, pooled)
    n = len(cls)
    x = pooled
    for i in range(n):
        x = layers.dense(cls[str(i)], x)
        if i < n - 1:
            x = layers.gelu(x)
    return x


def pool(params: Dict, x: jnp.ndarray, method: str,
         lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[B, T, D] -> [B, D] by the configured strategy."""
    if lengths is not None:
        t = x.shape[1]
        mask = (jnp.arange(t)[None, :] < lengths[:, None])
    else:
        mask = None

    if method == "average":
        if mask is None:
            return jnp.mean(x, axis=1)
        m = mask[..., None].astype(x.dtype)
        return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    if method == "max":
        if mask is None:
            return jnp.max(x, axis=1)
        neg = jnp.finfo(x.dtype).min
        return jnp.max(jnp.where(mask[..., None], x, neg), axis=1)
    if method == "attention":
        z = jnp.einsum("btd,qd->btq", x, params["q"])  # [B, T, 1]
        if mask is not None:
            z = jnp.where(mask[..., None], z, -1e9)
        alpha = jax.nn.softmax(z, axis=1)
        return jnp.einsum("bt,btd->bd", alpha[..., 0], x)
    raise ValueError(f"unknown pooling {method}")


def intent_forward(params: Dict, x: jnp.ndarray, *, method: str = "average",
                   lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[B, T, D] embeddings -> [B, num_classes] logits."""
    pooled = pool(params, x, method, lengths)
    return _classifier_head(params, pooled)


def intent_loss_and_acc(params: Dict, x: jnp.ndarray, onehot: jnp.ndarray, *,
                        method: str, lengths: Optional[jnp.ndarray] = None):
    """Softmax CE against (possibly soft) one-hot targets + argmax accuracy —
    the reference's criterion(pred, target.float()) and argmax-match metric
    (train_classifier.py:111,119)."""
    logits = intent_forward(params, x, method=method, lengths=lengths)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    loss = -jnp.mean(jnp.sum(onehot.astype(jnp.float32) * logp, axis=-1))
    correct = (jnp.argmax(logits, -1) == jnp.argmax(onehot, -1)).astype(jnp.float32)
    return loss, jnp.sum(correct)
