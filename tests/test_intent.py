"""Intent classifier parity with the reference math (torch re-derivation)
and training-step sanity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

import jax
import jax.numpy as jnp

from loco_asr_tpu.models import intent


class TorchRefClassifier(nn.Module):
    """The reference IntentClassifier's math (intent_classifier.py:4-50),
    re-stated here as a parity oracle for our JAX port."""

    def __init__(self, method, d, n):
        super().__init__()
        self.method = method
        self.q = nn.Parameter(torch.randn(1, d) * 0.001)
        self.classifier = nn.Linear(d, n)

    def forward(self, x):
        if self.method == "average":
            x = torch.mean(x, dim=1, keepdim=True)
        elif self.method == "max":
            x = torch.max(x, dim=1, keepdim=True).values
        else:
            z = torch.matmul(x, self.q.T)
            alpha = torch.softmax(z, dim=1)
            x = torch.matmul(alpha.permute(0, 2, 1), x)
        return self.classifier(x).squeeze(1)


@pytest.mark.parametrize("method", intent.POOLINGS)
def test_pooling_parity(method):
    torch.manual_seed(0)
    ref = TorchRefClassifier(method, 8, 5).eval()
    params = {
        "q": jnp.asarray(ref.q.detach().numpy()),
        "classifier": {
            "kernel": jnp.asarray(ref.classifier.weight.detach().numpy().T),
            "bias": jnp.asarray(ref.classifier.bias.detach().numpy()),
        },
    }
    x = np.random.default_rng(0).standard_normal((3, 7, 8)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(intent.intent_forward(params, jnp.asarray(x), method=method))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_masked_pooling_ignores_padding():
    rng = jax.random.PRNGKey(0)
    params = intent.intent_classifier_init(rng, embedding_size=8, num_classes=5)
    x = np.random.default_rng(1).standard_normal((2, 6, 8)).astype(np.float32)
    lengths = np.array([6, 3])
    x_masked = x.copy()
    x_masked[1, 3:] = 99.0  # garbage in padding must not change output
    for method in intent.POOLINGS:
        a = intent.intent_forward(params, jnp.asarray(x), method=method,
                                  lengths=jnp.asarray(lengths))
        b = intent.intent_forward(params, jnp.asarray(x_masked), method=method,
                                  lengths=jnp.asarray(lengths))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_mlp_head_variant():
    rng = jax.random.PRNGKey(0)
    params = intent.intent_classifier_init(rng, embedding_size=8, num_classes=5,
                                           hidden_dims=(16, 12))
    x = np.random.default_rng(0).standard_normal((3, 7, 8)).astype(np.float32)
    out = intent.intent_forward(params, jnp.asarray(x), method="attention")
    assert out.shape == (3, 5)
    assert np.isfinite(np.asarray(out)).all()
    # linear variant keeps the reference param layout
    lin = intent.intent_classifier_init(rng, embedding_size=8, num_classes=5)
    assert "kernel" in lin["classifier"]


def test_training_step_reduces_loss():
    import optax

    rng = jax.random.PRNGKey(0)
    params = intent.intent_classifier_init(rng, embedding_size=16, num_classes=4)
    # Reference optimizer: Adam lr=1e-3 + L2 weight decay 1e-4
    # (train_classifier.py:68); torch Adam's weight_decay adds wd*param to
    # the gradient before the moment updates.
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.scale_by_adam(), optax.scale(-1e-3))
    opt_state = tx.init(params)

    gen = np.random.default_rng(2)
    x = gen.standard_normal((32, 5, 16)).astype(np.float32)
    labels = (x.mean(axis=(1, 2)) > 0).astype(int) + 2 * (x[:, 0, 0] > 0)
    onehot = np.eye(4, dtype=np.float32)[labels]

    @jax.jit
    def step(params, opt_state):
        (loss, _), grads = jax.value_and_grad(
            lambda p: intent.intent_loss_and_acc(
                p, jnp.asarray(x), jnp.asarray(onehot), method="attention"),
            has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(150):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.3, losses[:3] + losses[-3:]
