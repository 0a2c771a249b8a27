"""Unit tests for ops/layers primitives against torch/HF oracles."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from loco_asr_tpu.ops import layers


def test_layer_norm_matches_torch():
    torch.manual_seed(0)
    ln = torch.nn.LayerNorm(16)
    with torch.no_grad():
        ln.weight.mul_(1.3).add_(0.1)
        ln.bias.add_(0.05)
    x = np.random.default_rng(0).standard_normal((4, 7, 16)).astype(np.float32)
    want = ln(torch.from_numpy(x)).detach().numpy()
    p = {"scale": jnp.asarray(ln.weight.detach().numpy()),
         "bias": jnp.asarray(ln.bias.detach().numpy())}
    got = np.asarray(layers.layer_norm(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_group_norm_matches_torch():
    torch.manual_seed(1)
    gn = torch.nn.GroupNorm(num_groups=4, num_channels=16)
    with torch.no_grad():
        gn.weight.mul_(0.7).add_(0.2)
    x = np.random.default_rng(1).standard_normal((2, 16, 33)).astype(np.float32)
    want = gn(torch.from_numpy(x)).detach().numpy()
    p = {"scale": jnp.asarray(gn.weight.detach().numpy()),
         "bias": jnp.asarray(gn.bias.detach().numpy())}
    got = np.asarray(layers.group_norm(p, jnp.asarray(x), num_groups=4))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_conv1d_matches_torch():
    torch.manual_seed(2)
    conv = torch.nn.Conv1d(6, 10, kernel_size=5, stride=2, padding=3, groups=2)
    x = np.random.default_rng(2).standard_normal((2, 6, 40)).astype(np.float32)
    want = conv(torch.from_numpy(x)).detach().numpy()
    p = {"weight": jnp.asarray(conv.weight.detach().numpy()),
         "bias": jnp.asarray(conv.bias.detach().numpy())}
    got = np.asarray(layers.conv1d(p, jnp.asarray(x), stride=2, padding=3,
                                   groups=2))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_weight_norm_conv_matches_torch():
    torch.manual_seed(3)
    conv = torch.nn.Conv1d(8, 8, kernel_size=4, groups=2)
    wn = torch.nn.utils.parametrizations.weight_norm(conv, name="weight", dim=2)
    g = wn.parametrizations.weight.original0.detach().numpy()
    v = wn.parametrizations.weight.original1.detach().numpy()
    p = {"weight_g": jnp.asarray(g), "weight_v": jnp.asarray(v),
         "bias": jnp.asarray(conv.bias.detach().numpy())}
    w = np.asarray(layers.weight_norm_conv1d_weight(p))
    np.testing.assert_allclose(w, wn.weight.detach().numpy(), atol=1e-6)


def test_gelu_variants_match_torch():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(layers.gelu(jnp.asarray(x))),
        torch.nn.functional.gelu(torch.from_numpy(x)).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(layers.gelu_new(jnp.asarray(x))),
        torch.nn.functional.gelu(torch.from_numpy(x), approximate="tanh").numpy(),
        atol=1e-6)


def test_sinusoidal_table_matches_hf():
    from transformers.models.speecht5.modeling_speecht5 import (
        SpeechT5SinusoidalPositionalEmbedding)

    emb = SpeechT5SinusoidalPositionalEmbedding(20, 16, padding_idx=1)
    want = emb.weights.detach().numpy()
    got = layers.sinusoidal_table(want.shape[0], 16, padding_idx=1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_positions_from_padding_matches_hf():
    from transformers.models.speecht5.modeling_speecht5 import (
        SpeechT5SinusoidalPositionalEmbedding)

    emb = SpeechT5SinusoidalPositionalEmbedding(30, 8, padding_idx=1)
    ids = torch.tensor([[5, 6, 7, 1, 1], [8, 1, 9, 10, 1]])
    want = emb.create_position_ids_from_input_ids(ids, 1, 3).numpy()
    got = np.asarray(layers.positions_from_padding(
        jnp.asarray(ids.numpy() != 1), padding_idx=1, past_length=3))
    np.testing.assert_array_equal(got, want)


def test_interleaved_sinusoidal_matches_hf():
    from transformers.models.speecht5.modeling_speecht5 import (
        SpeechT5ScaledPositionalEncoding)

    mod = SpeechT5ScaledPositionalEncoding(0.0, 12, max_len=50)
    want = mod.pe[0].numpy()
    got = layers.interleaved_sinusoidal_table(50, 12)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dropout_semantics():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1000,))
    out = layers.dropout(rng, x, 0.25, deterministic=False)
    kept = float(jnp.mean(out != 0))
    assert 0.7 < kept < 0.8                       # keep prob = 1 - rate
    nz = np.asarray(out)[np.asarray(out) != 0]
    np.testing.assert_allclose(nz, 1 / 0.75, rtol=1e-5)  # inverted scaling
    np.testing.assert_array_equal(
        np.asarray(layers.dropout(rng, x, 0.25, deterministic=True)),
        np.asarray(x))
