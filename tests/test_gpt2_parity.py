"""GPT-2 numerics parity vs HF torch (random tiny config, no network)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from transformers import GPT2Config as HFGPT2Config, GPT2LMHeadModel

import jax
import jax.numpy as jnp

from loco_asr_tpu.models.gpt2 import import_torch, model as g


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    hf_cfg = HFGPT2Config(vocab_size=61, n_positions=32, n_embd=16, n_layer=2,
                          n_head=2, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    hf = GPT2LMHeadModel(hf_cfg).eval()
    params = import_torch.load_hf_gpt2(hf.state_dict())
    cfg = g.tiny_gpt2_config()
    return hf, params, cfg


def test_logits_parity(pair):
    hf, params, cfg = pair
    ids = np.array([[5, 9, 2, 44, 17, 3], [7, 7, 1, 0, 60, 12]], np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = g.gpt2_logits(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_token_nll_matches_torch_ce(pair):
    hf, params, cfg = pair
    ids = np.array([[5, 9, 2, 44, 17, 3]], np.int64)
    with torch.no_grad():
        logits = hf(torch.from_numpy(ids)).logits
        shifted = logits[..., :-1, :].transpose(1, 2)
        ref = torch.nn.CrossEntropyLoss(reduction="none")(
            shifted, torch.from_numpy(ids[..., 1:])).numpy()
    our_logits, _ = g.gpt2_logits(params, cfg, jnp.asarray(ids))
    got = np.asarray(g.token_nll(our_logits, jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_kv_cache_scoring_matches_full(pair):
    """Incremental scoring with a KV cache reproduces full-context logits —
    the numerics-equivalence proof backing the eval_ppl max_len fast path."""
    _, params, cfg = pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 61, (2, 12))

    full, _ = g.gpt2_logits(params, cfg, jnp.asarray(ids))

    caches = g.init_kv_cache(cfg, 2, 12)
    # prefill 8 tokens, then step one-by-one
    logits_p, caches = g.gpt2_logits(params, cfg, jnp.asarray(ids[:, :8]),
                                     kv_caches=caches, cache_index=0)
    outs = [np.asarray(logits_p)]
    for t in range(8, 12):
        step_logits, caches = g.gpt2_logits(
            params, cfg, jnp.asarray(ids[:, t:t + 1]),
            kv_caches=caches, cache_index=t)
        outs.append(np.asarray(step_logits))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(full), atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_flash_attention_impl_matches_dense(pair):
    _, params, cfg = pair
    ids = np.random.default_rng(1).integers(0, 61, (2, 24))
    dense, _ = g.gpt2_logits(params, cfg, jnp.asarray(ids))
    flash, _ = g.gpt2_logits(params, cfg, jnp.asarray(ids), attn_impl="flash")
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                               atol=2e-4, rtol=2e-4)


def test_presets_shapes():
    assert g.PRESETS["gpt2"].n_layer == 12
    assert g.PRESETS["gpt2-xl"].n_embd == 1600


@pytest.mark.slow
def test_score_tokens_matches_dense_lm_head(pair):
    """score_tokens (chunked lm head, no [B,T,V] materialization) must
    equal token_nll over dense logits — including when T-1 is not a
    multiple of the chunk and when chunk > T."""
    _, params, cfg = pair
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (3, 29)).astype(np.int32))
    dense = np.asarray(g.token_nll(g.gpt2_logits(params, cfg, ids)[0], ids))
    for chunk in (1, 4, 7, 28, 256):
        got = np.asarray(g.score_tokens(params, cfg, ids, chunk=chunk))
        np.testing.assert_allclose(got, dense, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_flash_and_ulysses_respect_padding_mask(pair):
    """attn_impl kernels must honor a right-padded attention_mask via
    kv_valid_len instead of silently dropping it (valid-prefix NLLs must
    match the dense masked path)."""
    from jax.sharding import Mesh

    _, params, cfg = pair
    rng = np.random.default_rng(5)
    lens = [14, 9]
    ids = rng.integers(1, cfg.vocab_size, (2, 16)).astype(np.int32)
    mask = np.zeros((2, 16), np.int32)
    for r, L in enumerate(lens):
        mask[r, :L] = 1
    ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)

    dense = np.asarray(g.token_nll(
        g.gpt2_logits(params, cfg, ids_j, attention_mask=mask_j)[0], ids_j))
    flash = np.asarray(g.token_nll(
        g.gpt2_logits(params, cfg, ids_j, attention_mask=mask_j,
                      attn_impl="flash")[0], ids_j))
    mesh2 = Mesh(np.array(jax.devices()[:2]), ("sp",))
    uly = np.asarray(g.token_nll(
        g.gpt2_logits(params, cfg, ids_j, attention_mask=mask_j,
                      attn_impl="ulysses", ring=(mesh2, "sp"))[0], ids_j))
    for r, L in enumerate(lens):
        np.testing.assert_allclose(flash[r, : L - 1], dense[r, : L - 1],
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(uly[r, : L - 1], dense[r, : L - 1],
                                   atol=1e-4, rtol=1e-4)
