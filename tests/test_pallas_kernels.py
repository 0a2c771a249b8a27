"""Pallas kernel parity tests (interpret mode on CPU; the same kernels
compile to Mosaic on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loco_asr_tpu.ops.pallas import flash_attention, fused_log_mel
from loco_asr_tpu.ops import audio


def _dense_attention(q, k, v, causal=True, scale=None):
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if causal:
        tq, tk = q.shape[2], k.shape[2]
        mask = jnp.arange(tk)[None, :] <= jnp.arange(tq)[:, None]
        s = jnp.where(mask[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("t,block", [(64, 16), (100, 32), (256, 128)])
def test_flash_attention_causal_matches_dense(t, block):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 3, t, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 3, t, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 3, t, 64)).astype(np.float32))
    want = _dense_attention(q, k, v, causal=True)
    got = flash_attention(q, k, v, causal=True, block_q=block, block_k=block,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_attention_noncausal_matches_dense():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 2, 64, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 128, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 128, 32)).astype(np.float32))
    want = _dense_attention(q, k, v, causal=False)
    got = flash_attention(q, k, v, causal=False, block_q=32, block_k=128,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_attention_noncausal_default_blocks_tk_384():
    """Regression: with the plain-kernel default block_k at 256, a
    non-causal Tk=384 call (a multiple of 128, not of 256) must auto-halve
    block_k rather than raise the Tk %% block_k ValueError."""
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((1, 2, 64, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 384, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 384, 32)).astype(np.float32))
    want = _dense_attention(q, k, v, causal=False)
    got = flash_attention(q, k, v, causal=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_attention_padded_tail_is_exact_for_valid_rows():
    """T not a multiple of the block: padded key rows must not leak into
    valid queries (causal guarantees it)."""
    rng = np.random.default_rng(2)
    t = 70
    q = jnp.asarray(rng.standard_normal((1, 1, t, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, t, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 1, t, 32)).astype(np.float32))
    want = _dense_attention(q, k, v, causal=True)
    got = flash_attention(q, k, v, causal=True, block_q=32, block_k=32,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("t,block", [(64, 16), (100, 32)])
def test_flash_attention_nhd_matches_dense(t, block):
    """The [B, T, H, D] in-place layout path (no relayout around the
    pallas_call) must produce the flat-BH kernel's exact numbers."""
    from loco_asr_tpu.ops.pallas import flash_attention_nhd

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((2, 3, t, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 3, t, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 3, t, 64)).astype(np.float32))
    want = _dense_attention(q, k, v, causal=True)
    tr = lambda x: x.transpose(0, 2, 1, 3)        # -> [B, T, H, D]
    got = flash_attention_nhd(tr(q), tr(k), tr(v), causal=True,
                              block_q=block, block_k=block, interpret=True)
    np.testing.assert_allclose(np.asarray(tr(got)), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("d", [32, 64])
def test_flash_attention_nhd_gradients_match_dense(d):
    """d=64 exercises the head-pair kernel's custom VJP; d=32 the
    transparent flat-BH fallback."""
    from loco_asr_tpu.ops.pallas import flash_attention_nhd

    rng = np.random.default_rng(8)
    tr = lambda x: x.transpose(0, 2, 1, 3)
    q = jnp.asarray(rng.standard_normal((1, 2, 96, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 96, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 96, d)).astype(np.float32))

    def loss_nhd(q, k, v):
        out = flash_attention_nhd(tr(q), tr(k), tr(v), causal=True,
                                  block_q=32, block_k=32, interpret=True)
        return jnp.sum(jnp.sin(tr(out)))

    def loss_dense(q, k, v):
        return jnp.sum(jnp.sin(_dense_attention(q, k, v, causal=True)))

    gf = jax.grad(loss_nhd, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("causal,t", [(True, 96), (False, 64)])
def test_flash_attention_gradients_match_dense(causal, t):
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((1, 2, t, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 64, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 64, 32)).astype(np.float32))

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, causal=causal, block_q=32, block_k=32,
                              interpret=True)
        return jnp.sum(jnp.sin(out))

    def loss_dense(q, k, v):
        return jnp.sum(jnp.sin(_dense_attention(q, k, v, causal=causal)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5)


def test_fused_log_mel_matches_reference_path():
    rng = np.random.default_rng(3)
    wav = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32) * 0.1)
    want = audio.log_mel_spectrogram(wav)
    got = fused_log_mel(wav, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_fused_log_mel_matches_hf():
    pytest.importorskip("transformers")
    from transformers.models.speecht5.feature_extraction_speecht5 import (
        SpeechT5FeatureExtractor)
    fe = SpeechT5FeatureExtractor()
    rng = np.random.default_rng(4)
    wav = (rng.standard_normal(6400) * 0.1).astype(np.float32)
    want = fe._extract_mel_features(wav)
    got = np.asarray(fused_log_mel(jnp.asarray(wav), interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)


# ---------------------------------------------------------------------------
# Relative-position + key-padding flash kernel (SpeechT5 encoder long-context)
# ---------------------------------------------------------------------------

def _dense_rel(q, k, v, pe, vl, scale, causal=False):
    """Oracle: HF SpeechT5 rel-attention math (ops/attention.py:93-135)."""
    tq, tk = q.shape[2], k.shape[2]
    L = pe.shape[0] // 2
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    i = jnp.arange(tq)[:, None]
    j = jnp.arange(tk)[None, :]
    idx = jnp.clip(i - j, -L, L - 1) + L
    s = s + jnp.einsum("bhqd,qkd->bhqk", q, pe[idx]) * scale
    if causal:
        s = jnp.where((i >= j)[None, None], s, -1e30)
    s = jnp.where((j < vl[:, None, None, None]), s, -1e30)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)


@pytest.mark.parametrize("tq,L,causal", [(256, 160, False), (200, 160, False),
                                         (300, 20, False), (256, 160, True)])
def test_flash_rel_matches_dense(tq, L, causal):
    rng = np.random.RandomState(0)
    b, h, d = 2, 3, 64
    q = jnp.asarray(rng.randn(b, h, tq, d).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(b, h, tq, d).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(b, h, tq, d).astype(np.float32) * 0.3)
    pe = jnp.asarray(rng.randn(2 * L, d).astype(np.float32) * 0.3)
    vl = jnp.asarray(np.array([tq, max(1, tq - 37)], np.int32))
    scale = d ** -0.5
    out = flash_attention(q, k, v, causal=causal, scale=scale, rel_pe=pe,
                          kv_valid_len=vl, interpret=True)
    want = _dense_rel(q, k, v, pe, vl, scale, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_flash_mask_only_matches_dense():
    """kv_valid_len without rel_pe: non-causal variable-length batches."""
    rng = np.random.RandomState(1)
    b, h, t, d = 2, 2, 200, 64
    q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32) * 0.3)
    vl = jnp.asarray(np.array([t, 153], np.int32))
    scale = d ** -0.5
    out = flash_attention(q, k, v, causal=False, scale=scale,
                          kv_valid_len=vl, interpret=True)
    pe0 = jnp.zeros((2, d), jnp.float32)
    want = _dense_rel(q, k, v, pe0, vl, scale, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_rel_gradients_match_dense(causal):
    rng = np.random.RandomState(2)
    b, h, t, d, L = 2, 2, 200, 64, 40
    q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32) * 0.3)
    pe = jnp.asarray(rng.randn(2 * L, d).astype(np.float32) * 0.3)
    vl = jnp.asarray(np.array([t, t - 31], np.int32))
    g = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
    scale = d ** -0.5

    f1 = lambda q, k, v, pe: jnp.vdot(flash_attention(
        q, k, v, causal=causal, scale=scale, rel_pe=pe, kv_valid_len=vl,
        interpret=True), g)
    f2 = lambda q, k, v, pe: jnp.vdot(_dense_rel(q, k, v, pe, vl, scale,
                                                 causal), g)
    g1 = jax.grad(f1, argnums=(0, 1, 2, 3))(q, k, v, pe)
    g2 = jax.grad(f2, argnums=(0, 1, 2, 3))(q, k, v, pe)
    for name, a, b_ in zip("q k v pe".split(), g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, rtol=1e-4, err_msg=f"d{name}")


@pytest.mark.parametrize("tq,tk,L,causal,bq", [
    (700, 700, 192, False, 256),   # real encoder band (2L=384 -> Wp=512), 2 k-blocks
    (300, 520, 64, False, 128),    # tq != tk, ragged tails on both sides
    (260, 260, 40, True, 128),     # causal with block skipping
    (90, 90, 8, False, 256),       # single partial block (block_q clamps)
])
def test_flash_rel_pallas_backward_matches_xla_oracle(tq, tk, L, causal, bq):
    """The Pallas backward (no gathers; raw-ds accumulation + final shear)
    against the plain-XLA blockwise backward it replaced (kept as the
    oracle).  Exercises multi-k-block accumulation — the correctness of
    the block_k == Wp coordinate trick — plus clip columns, key-padding,
    causal skipping, and non-divisible shapes."""
    from loco_asr_tpu.ops.pallas.flash_attention import (
        _flash_rel_backward_pallas, _flash_rel_backward_xla,
        _flash_rel_forward)

    rng = np.random.RandomState(7)
    b, h, d = 2, 3, 64
    q = jnp.asarray(rng.randn(b, h, tq, d).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(b, h, tk, d).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(b, h, tk, d).astype(np.float32) * 0.3)
    pe = jnp.asarray(rng.randn(2 * L, d).astype(np.float32) * 0.3)
    vl = jnp.asarray(np.array([tk, max(1, tk - 37)], np.int32))
    g = jnp.asarray(rng.randn(b, h, tq, d).astype(np.float32))
    scale = d ** -0.5

    out, lse = _flash_rel_forward(q, k, v, pe, vl, causal=causal,
                                  scale=scale, block_q=128, block_k=1024,
                                  interpret=True)
    got = _flash_rel_backward_pallas(q, k, v, pe, vl, out, lse, g,
                                     causal=causal, scale=scale,
                                     block_q=bq, interpret=True)
    want = _flash_rel_backward_xla(q, k, v, pe, vl, out, lse, g,
                                   causal=causal, scale=scale, block_k=256)
    for name, a, w in zip("q k v pe".split(), got[:4], want[:4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                   atol=3e-5, rtol=1e-4,
                                   err_msg=f"d{name} tq={tq} L={L}")
