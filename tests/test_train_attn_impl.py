"""Long-context training wiring: `attn_impl` must route through the full
train steps (parallel/train.py) with gradients matching the dense path.

The flash kernel (ops/pallas/flash_attention.py) has a custom blockwise
VJP and ring/ulysses SP attention is exact — so training through any of
them must produce the same loss AND the same parameter update as dense
attention (up to fp accumulation-order noise).  This is what makes
conversation-scale fine-tuning (dense OOMs at >=8k encoder frames,
docs/BENCH.md) a trained capability rather than an inference-only one.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from loco_asr_tpu.models.speecht5 import model as st5
from loco_asr_tpu.models.speecht5.config import tiny_config
from loco_asr_tpu.parallel import mesh as meshlib, train


def _no_dropout(cfg):
    return dataclasses.replace(
        cfg, positional_dropout=0.0, hidden_dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, apply_spec_augment=False)


@pytest.fixture(scope="module")
def asr_setup():
    cfg = _no_dropout(tiny_config())
    params = st5.asr_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {
        "input_values": jnp.asarray(
            rng.standard_normal((2, 1600)).astype(np.float32) * 0.1),
        "attention_mask": jnp.ones((2, 1600), jnp.int32),
        "labels": jnp.asarray(rng.integers(3, cfg.vocab_size, (2, 7))),
    }
    return cfg, params, batch


def test_asr_train_step_flash_matches_dense(asr_setup):
    """One full train step (loss+grad+adamw update) through flash ==
    through dense: same loss, same updated params."""
    cfg, params, batch = asr_setup
    mesh = meshlib.make_mesh(data=1)
    tx = optax.adamw(1e-3)

    outs = {}
    for impl in ("dense", "flash"):
        step = train.make_asr_train_step(cfg, mesh, tx, donate=False,
                                         attn_impl=impl)
        opt = tx.init(params)
        p2, _, m = step(params, opt, batch, jax.random.PRNGKey(1))
        outs[impl] = (jax.device_get(p2), float(m["loss"]),
                      float(m["grad_norm"]))

    assert np.isfinite(outs["flash"][1])
    np.testing.assert_allclose(outs["flash"][1], outs["dense"][1],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs["flash"][2], outs["dense"][2],
                               rtol=1e-3, atol=1e-4)
    flat_d = jax.tree_util.tree_leaves(outs["dense"][0])
    flat_f = jax.tree_util.tree_leaves(outs["flash"][0])
    for a, b in zip(flat_d, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)


def test_asr_flash_grads_match_dense_with_remat(asr_setup):
    """remat + flash composes: gradients of the loss match dense."""
    cfg, params, batch = asr_setup

    def loss(impl, remat):
        def f(p):
            return st5.asr_loss(p, cfg, batch["input_values"],
                                batch["attention_mask"], batch["labels"],
                                deterministic=True, remat=remat,
                                attn_impl=impl)[0]
        return jax.value_and_grad(f)(params)

    l_d, g_d = loss("dense", False)
    l_f, g_f = loss("flash", True)
    np.testing.assert_allclose(float(l_f), float(l_d), rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_d),
                    jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)


def test_asr_train_step_rejects_dropout_silently_lost():
    """A training cfg WITH attention dropout must not silently fall back to
    dense under attn_impl='flash' — make_asr_train_step zeroes the
    attention-prob dropout explicitly (documented policy) so the kernel
    actually runs."""
    cfg = tiny_config()  # attention_dropout=0.1 default
    assert cfg.attention_dropout > 0
    mesh = meshlib.make_mesh(data=1)
    tx = optax.adamw(1e-3)
    with pytest.warns(UserWarning, match="attention_dropout.*zeroed"):
        step = train.make_asr_train_step(cfg, mesh, tx, donate=False,
                                         attn_impl="flash")
    params = st5.asr_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {
        "input_values": jnp.asarray(
            rng.standard_normal((2, 1600)).astype(np.float32) * 0.1),
        "attention_mask": jnp.ones((2, 1600), jnp.int32),
        "labels": jnp.asarray(rng.integers(3, cfg.vocab_size, (2, 7))),
    }
    opt = tx.init(params)
    _, _, m = step(params, opt, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_asr_flash_decoder_ragged_labels_matches_dense(asr_setup):
    """Decoder flash routing (causal-in-kernel self-attn + length-masked
    cross-attn) with RAGGED label padding: loss and grads must match the
    dense decoder — right-padded label rows are inert under causality and
    masked by the loss."""
    cfg, params, _ = asr_setup
    rng = np.random.default_rng(3)
    labels = np.asarray(rng.integers(3, cfg.vocab_size, (2, 9)), np.int64)
    labels[0, 5:] = -100            # ragged: row 0 has 5 valid labels
    batch = {
        "input_values": jnp.asarray(
            rng.standard_normal((2, 1600)).astype(np.float32) * 0.1),
        "attention_mask": jnp.asarray(
            np.concatenate([np.ones((2, 1200), np.int32),
                            np.asarray([[1] * 400, [0] * 400], np.int32)],
                           axis=1)),
        "labels": jnp.asarray(labels),
    }

    def loss(impl):
        def f(p):
            return st5.asr_loss(p, cfg, batch["input_values"],
                                batch["attention_mask"], batch["labels"],
                                deterministic=True, attn_impl=impl)[0]
        return jax.value_and_grad(f)(params)

    l_d, g_d = loss("dense")
    l_f, g_f = loss("flash")
    np.testing.assert_allclose(float(l_f), float(l_d), rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_d),
                    jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)


def test_decoder_refuses_flash_with_attention_dropout(asr_setup):
    """decoder attn_impl='flash' + live attention-prob dropout must raise
    (a silent dense fallback would drop causality)."""
    from loco_asr_tpu.models.speecht5 import decoder as dec_mod

    cfg, params, _ = asr_setup
    cfg2 = dataclasses.replace(cfg, attention_dropout=0.1)
    hidden = jnp.zeros((1, 4, cfg.hidden_size))
    enc_h = jnp.zeros((1, 6, cfg.hidden_size))
    with pytest.raises(ValueError, match="attention-prob dropout"):
        dec_mod.decoder(params["decoder"]["wrapped_decoder"], cfg2, hidden,
                        enc_h, deterministic=False,
                        dropout_rng=jax.random.PRNGKey(0),
                        attn_impl="flash")


def test_lm_train_step_warns_on_zeroed_attn_dropout():
    """make_lm_train_step under attn_impl != dense with attn_pdrop > 0
    must WARN that attention-prob dropout is zeroed (the CLI user would
    otherwise get silently different training semantics)."""
    import warnings

    from loco_asr_tpu.models.gpt2 import model as g

    cfg = g.tiny_gpt2_config(vocab_size=64, n_positions=32, n_embd=32,
                             n_head=4)
    assert cfg.attn_pdrop > 0
    mesh = meshlib.make_mesh(data=1)
    tx = optax.adamw(1e-3)
    with pytest.warns(UserWarning, match="attn_pdrop.*zeroed"):
        train.make_lm_train_step(cfg, mesh, tx, donate=False,
                                 attn_impl="flash")
    # dense keeps dropout: no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        train.make_lm_train_step(cfg, mesh, tx, donate=False,
                                 attn_impl="dense")


@pytest.mark.slow
def test_lm_train_step_ring_matches_dense_on_mesh():
    """GPT-2 train step with ring SP over a 2-device virtual sequence mesh:
    loss + grads match the single-device dense step."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from loco_asr_tpu.models.gpt2 import model as g

    cfg = g.tiny_gpt2_config(n_positions=32, n_embd=16, n_head=2,
                             embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0)
    params = g.gpt2_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {"ids": jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32))),
             "lengths": jnp.asarray([32, 20], jnp.int32)}
    tx = optax.adamw(1e-3)
    mesh1 = meshlib.make_mesh(data=1)

    dense = train.make_lm_train_step(cfg, mesh1, tx, donate=False)
    p_d, _, m_d = dense(params, tx.init(params), batch, jax.random.PRNGKey(1))

    sp_mesh = Mesh(np.asarray(jax.devices()[:2]), ("sequence",))
    ring_step = train.make_lm_train_step(
        cfg, sp_mesh, tx, donate=False, attn_impl="ring",
        ring=(sp_mesh, "sequence"))
    sharded = {"ids": jax.device_put(batch["ids"],
                                     NamedSharding(sp_mesh, P(None, "sequence"))),
               "lengths": jax.device_put(batch["lengths"],
                                         NamedSharding(sp_mesh, P()))}
    p_params = jax.device_put(params, NamedSharding(sp_mesh, P()))
    p_r, _, m_r = ring_step(p_params, tx.init(p_params), sharded,
                            jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m_r["loss"]), float(m_d["loss"]),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(p_d)),
                    jax.tree_util.tree_leaves(jax.device_get(p_r))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_lm_train_step_ulysses_matches_dense_on_mesh():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from loco_asr_tpu.models.gpt2 import model as g

    cfg = g.tiny_gpt2_config(n_positions=32, n_embd=16, n_head=2,
                             embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0)
    params = g.gpt2_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {"ids": jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32))),
             "lengths": jnp.asarray([32, 26], jnp.int32)}
    tx = optax.adamw(1e-3)

    dense = train.make_lm_train_step(cfg, meshlib.make_mesh(data=1), tx,
                                     donate=False)
    p_d, _, m_d = dense(params, tx.init(params), batch, jax.random.PRNGKey(1))

    sp_mesh = Mesh(np.asarray(jax.devices()[:2]), ("sequence",))
    u_step = train.make_lm_train_step(
        cfg, sp_mesh, tx, donate=False, attn_impl="ulysses",
        ring=(sp_mesh, "sequence"))
    sharded = {"ids": jax.device_put(batch["ids"],
                                     NamedSharding(sp_mesh, P(None, "sequence"))),
               "lengths": jax.device_put(batch["lengths"],
                                         NamedSharding(sp_mesh, P()))}
    p_params = jax.device_put(params, NamedSharding(sp_mesh, P()))
    p_u, _, m_u = u_step(p_params, tx.init(p_params), sharded,
                         jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_u["loss"]), float(m_d["loss"]),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(p_d)),
                    jax.tree_util.tree_leaves(jax.device_get(p_u))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("impl", ["ring", "ulysses"])
def test_asr_train_step_sp_matches_dense_on_mesh(asr_setup, impl):
    """ASR train step with ring/ulysses sequence parallelism over a
    2-device virtual mesh: loss + updated params match the single-device
    dense step.  This is the multi-chip conversation-TRAINING path (SP
    over encoder frames) that train_asr --attn_impl ring/ulysses runs."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg, params, _ = asr_setup
    tx = optax.adamw(1e-3)

    # SP shards ENCODER FRAMES: pick an audio length whose frame count
    # divides the 2-device sequence mesh (1600 samples -> 159 frames
    # would be rejected by sp.sp_shard_map)
    t = 1600
    while cfg.feat_extract_output_length(t) % 2:
        t += 16
    rng = np.random.default_rng(0)
    batch = {
        "input_values": jnp.asarray(
            rng.standard_normal((2, t)).astype(np.float32) * 0.1),
        "attention_mask": jnp.ones((2, t), jnp.int32),
        "labels": jnp.asarray(rng.integers(3, cfg.vocab_size, (2, 7))),
    }

    dense = train.make_asr_train_step(cfg, meshlib.make_mesh(data=1), tx,
                                      donate=False)
    p_d, _, m_d = dense(params, tx.init(params), batch,
                        jax.random.PRNGKey(1))

    sp_mesh = Mesh(np.asarray(jax.devices()[:2]), ("sequence",))
    sp_step = train.make_asr_train_step(
        cfg, sp_mesh, tx, donate=False, attn_impl=impl,
        ring=(sp_mesh, "sequence"))
    seq_sh = NamedSharding(sp_mesh, P(None, "sequence"))
    sharded = {"input_values": jax.device_put(batch["input_values"], seq_sh),
               "attention_mask": jax.device_put(batch["attention_mask"],
                                                seq_sh),
               "labels": jax.device_put(batch["labels"],
                                        NamedSharding(sp_mesh, P()))}
    p_params = jax.device_put(params, NamedSharding(sp_mesh, P()))
    p_s, _, m_s = sp_step(p_params, tx.init(p_params), sharded,
                          jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m_s["loss"]), float(m_d["loss"]),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(p_d)),
                    jax.tree_util.tree_leaves(jax.device_get(p_s))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)


def test_lm_train_step_flash_matches_dense():
    from loco_asr_tpu.models.gpt2 import model as g

    cfg = g.tiny_gpt2_config(n_positions=32, n_embd=16, n_head=2,
                             embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0)
    params = g.gpt2_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {"ids": jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32))),
             "lengths": jnp.asarray([32, 20], jnp.int32)}
    tx = optax.adamw(1e-3)
    mesh = meshlib.make_mesh(data=1)

    outs = {}
    for impl in ("dense", "flash"):
        step = train.make_lm_train_step(cfg, mesh, tx, donate=False,
                                        attn_impl=impl)
        p2, _, m = step(params, tx.init(params), batch, jax.random.PRNGKey(1))
        outs[impl] = (jax.device_get(p2), float(m["loss"]))
    np.testing.assert_allclose(outs["flash"][1], outs["dense"][1],
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(outs["dense"][0]),
                    jax.tree_util.tree_leaves(outs["flash"][0])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)


def test_asr_train_step_grad_accum_matches_full(asr_setup):
    """grad_accum=2 must reproduce the monolithic step exactly (sum-form
    accumulation + one token-mean division; dropout off so the rng split
    is inert)."""
    cfg, params, batch = asr_setup
    mesh = meshlib.make_mesh(data=1)
    tx = optax.sgd(1e-2)

    outs = {}
    for accum in (1, 2):
        step = train.make_asr_train_step(cfg, mesh, tx, donate=False,
                                         grad_accum=accum)
        p2, _, m = step(params, tx.init(params), batch, jax.random.PRNGKey(1))
        outs[accum] = (jax.device_get(p2), float(m["loss"]))
    np.testing.assert_allclose(outs[2][1], outs[1][1], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(outs[1][0]),
                    jax.tree_util.tree_leaves(outs[2][0])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-7)


def test_lm_train_step_grad_accum_matches_full():
    """LM grad accumulation with RAGGED microbatches (31 vs 19 valid
    tokens) — the sum-form weighting is what makes this exact; a mean-of-
    microbatch-means would be off by ~24%."""
    from loco_asr_tpu.models.gpt2 import model as g

    cfg = g.tiny_gpt2_config(n_positions=32, n_embd=16, n_head=2,
                             embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0)
    params = g.gpt2_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {"ids": jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32))),
             "lengths": jnp.asarray([32, 20], jnp.int32)}
    tx = optax.sgd(1e-2)
    mesh = meshlib.make_mesh(data=1)

    outs = {}
    for accum in (1, 2):
        step = train.make_lm_train_step(cfg, mesh, tx, donate=False,
                                        grad_accum=accum)
        p2, _, m = step(params, tx.init(params), batch, jax.random.PRNGKey(1))
        outs[accum] = (jax.device_get(p2), float(m["loss"]))
    np.testing.assert_allclose(outs[2][1], outs[1][1], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(outs[1][0]),
                    jax.tree_util.tree_leaves(outs[2][0])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-7)
    # indivisible batch must be rejected at trace time
    bad = train.make_lm_train_step(cfg, mesh, tx, donate=False, grad_accum=3)
    with pytest.raises(ValueError, match="not divisible"):
        bad(params, tx.init(params), batch, jax.random.PRNGKey(1))


def test_adamw_clip_norm_plumbs():
    """clip_norm caps the gradient fed to Adam: with a tiny threshold the
    first-step update must shrink versus unclipped (bias-corrected Adam
    normalizes magnitude away otherwise, so compare against clip=0)."""
    params = {"w": jnp.ones((4,)) * 2.0}
    grads = {"w": jnp.full((4,), 100.0)}
    for clip, expect_move in ((None, True), (1e-30, False)):
        tx = train.adamw(1e-1, 0.0, clip_norm=clip)
        upd, _ = tx.update(grads, tx.init(params), params)
        moved = float(jnp.abs(upd["w"]).max()) > 1e-6
        assert moved == expect_move, (clip, jax.device_get(upd))


def test_lm_train_step_chunked_loss_matches_dense():
    """loss_impl='chunked' (checkpointed chunked lm head — no [B,L,V]
    logits in fwd or bwd) must produce the same loss and updated params
    as the dense form, with dropout active (same rng feeds both)."""
    from loco_asr_tpu.models.gpt2 import model as g

    cfg = g.tiny_gpt2_config(n_positions=32, n_embd=16, n_head=2,
                             embd_pdrop=0.1, attn_pdrop=0.0,
                             resid_pdrop=0.1)
    params = g.gpt2_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {"ids": jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32))),
             "lengths": jnp.asarray([32, 20], jnp.int32)}
    # SGD, not Adam: post-Adam params are ill-conditioned in the grads
    # (m/sqrt(v) flips direction on ~0 grads), while SGD deltas compare
    # grads directly.  Grad agreement itself is <1e-6 (measured).
    tx = optax.sgd(1e-2)
    mesh = meshlib.make_mesh(data=1)

    outs = {}
    for impl in ("dense", "chunked"):
        step = train.make_lm_train_step(cfg, mesh, tx, donate=False,
                                        loss_impl=impl)
        p2, _, m = step(params, tx.init(params), batch, jax.random.PRNGKey(1))
        outs[impl] = (jax.device_get(p2), float(m["loss"]),
                      float(m["grad_norm"]))
    np.testing.assert_allclose(outs["chunked"][1], outs["dense"][1],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs["chunked"][2], outs["dense"][2],
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(outs["dense"][0]),
                    jax.tree_util.tree_leaves(outs["chunked"][0])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


def test_token_nll_from_hidden_checkpoint_grads():
    """checkpoint_chunks changes residuals, not math: grads w.r.t. both
    the lm-head table and the hidden states must match the dense
    logits->log_softmax path, across a multi-chunk + ragged-pad split."""
    from loco_asr_tpu.models.gpt2 import model as g

    rng = np.random.default_rng(1)
    b, t, h, v = 2, 14, 8, 11      # n=13 -> chunks of 8: pad 3, 2 chunks
    hidden = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
    wte = jnp.asarray(rng.standard_normal((v, h)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, v, (b, t)))

    def dense(w, hid):
        logits = jnp.dot(hid, w.T)
        return jnp.sum(g.token_nll(logits, ids))

    def chunked(w, hid):
        return jnp.sum(g.token_nll_from_hidden(w, hid, ids, chunk=8,
                                               checkpoint_chunks=True))

    ld, (gwd, ghd) = jax.value_and_grad(dense, argnums=(0, 1))(wte, hidden)
    lc, (gwc, ghc) = jax.value_and_grad(chunked, argnums=(0, 1))(wte, hidden)
    np.testing.assert_allclose(float(lc), float(ld), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gwc), np.asarray(gwd),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ghc), np.asarray(ghd),
                               rtol=1e-5, atol=1e-6)


def test_asr_train_step_mixed_precision(asr_setup):
    """compute_dtype=bf16: master params + optimizer state stay f32, the
    loss tracks the f32 step within bf16 rounding, and params move."""
    cfg, params, batch = asr_setup
    mesh = meshlib.make_mesh(data=1)
    tx = optax.adamw(1e-3)

    step32 = train.make_asr_train_step(cfg, mesh, tx, donate=False)
    step16 = train.make_asr_train_step(cfg, mesh, tx, donate=False,
                                       compute_dtype=jnp.bfloat16)
    p32, _, m32 = step32(params, tx.init(params), batch,
                         jax.random.PRNGKey(1))
    p16, o16, m16 = step16(params, tx.init(params), batch,
                           jax.random.PRNGKey(1))

    # master precision preserved end-to-end
    for leaf in jax.tree_util.tree_leaves((p16, o16)):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    assert np.isfinite(float(m16["loss"]))
    np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]),
                               rtol=5e-2)
    assert abs(float(m16["grad_norm"]) - float(m32["grad_norm"])) \
        <= 0.15 * float(m32["grad_norm"]) + 1e-3
    # params actually update
    moved = [not np.allclose(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(params)),
        jax.tree_util.tree_leaves(jax.device_get(p16)))]
    assert any(moved)


def test_lm_train_step_mixed_precision():
    from loco_asr_tpu.models.gpt2 import model as g

    cfg = g.tiny_gpt2_config(n_positions=32, n_embd=16, n_head=2,
                             embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0)
    params = g.gpt2_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {"ids": jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32))),
             "lengths": jnp.asarray([32, 20], jnp.int32)}
    tx = optax.adamw(1e-3)
    mesh = meshlib.make_mesh(data=1)

    step32 = train.make_lm_train_step(cfg, mesh, tx, donate=False)
    step16 = train.make_lm_train_step(cfg, mesh, tx, donate=False,
                                      compute_dtype=jnp.bfloat16)
    _, _, m32 = step32(params, tx.init(params), batch, jax.random.PRNGKey(1))
    p16, o16, m16 = step16(params, tx.init(params), batch,
                           jax.random.PRNGKey(1))
    for leaf in jax.tree_util.tree_leaves((p16, o16)):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]),
                               rtol=5e-2)


def test_asr_train_step_freeze_feature_encoder(asr_setup):
    """freeze_feature_encoder: conv feature-extractor params must be
    bit-identical after a step (incl. no weight decay), every other
    group must move, and the loss must equal the unfrozen step's loss
    (freezing changes gradients, not the forward)."""
    cfg, params, batch = asr_setup
    mesh = meshlib.make_mesh(data=1)
    tx = optax.adamw(1e-3, weight_decay=0.01)

    step_f = train.make_asr_train_step(cfg, mesh, tx, donate=False,
                                       freeze_feature_encoder=True)
    step_u = train.make_asr_train_step(cfg, mesh, tx, donate=False)
    p_f, _, m_f = step_f(params, tx.init(params), batch,
                         jax.random.PRNGKey(1))
    p_u, _, m_u = step_u(params, tx.init(params), batch,
                         jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m_f["loss"]), float(m_u["loss"]),
                               rtol=1e-6, atol=1e-6)
    # grad_norm shrinks: the conv grads are exactly zero under freeze
    assert float(m_f["grad_norm"]) < float(m_u["grad_norm"])

    fe0 = params["encoder"]["prenet"]["feature_encoder"]
    fe_f = jax.device_get(p_f)["encoder"]["prenet"]["feature_encoder"]
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(fe0)),
                    jax.tree_util.tree_leaves(fe_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # everything OUTSIDE the frozen subtree still updates
    enc_f = jax.device_get(p_f)["encoder"]
    enc_0 = jax.device_get(params)["encoder"]
    moved = [
        not np.allclose(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(enc_0["wrapped_encoder"]),
            jax.tree_util.tree_leaves(enc_f["wrapped_encoder"]))
    ]
    assert all(moved)


def test_adamw_mu_dtype_bf16():
    """mu_dtype=bfloat16 stores Adam's FIRST moment in bf16 (halving its
    HBM footprint — what lets gpt2-large train on one 16 GB chip, see
    docs/BENCH.md) while the second moment stays f32; the loss
    trajectory must track the f32-mu run closely."""
    from loco_asr_tpu.models.gpt2 import model as g

    cfg = g.tiny_gpt2_config(n_positions=32, n_embd=16, n_head=2,
                             embd_pdrop=0.0, attn_pdrop=0.0,
                             resid_pdrop=0.0)
    params = g.gpt2_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {"ids": jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32))),
             "lengths": jnp.asarray([32, 32], jnp.int32)}
    mesh = meshlib.make_mesh(data=1)
    n_param_leaves = len(jax.tree_util.tree_leaves(params))

    trajs = {}
    for name, mu_dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        tx = train.adamw(1e-3, 0.01, mu_dtype=mu_dtype)
        step = train.make_lm_train_step(cfg, mesh, tx, donate=False)
        p, opt = params, tx.init(params)
        if mu_dtype is not None:
            dtypes = [x.dtype for x in jax.tree_util.tree_leaves(opt)
                      if hasattr(x, "dtype")
                      and jnp.issubdtype(x.dtype, jnp.floating)]
            # exactly the mu tree is bf16; nu (same leaf count) stays f32
            assert dtypes.count(jnp.bfloat16) == n_param_leaves, dtypes
            assert dtypes.count(jnp.float32) >= n_param_leaves, dtypes
        traj = []
        for i in range(5):
            p, opt, m = step(p, opt, batch, jax.random.PRNGKey(i))
            traj.append(float(m["loss"]))
        trajs[name] = traj
        if mu_dtype is not None:
            # dtype must survive the update (no silent f32 promotion)
            dtypes = [x.dtype for x in jax.tree_util.tree_leaves(opt)
                      if hasattr(x, "dtype")
                      and jnp.issubdtype(x.dtype, jnp.floating)]
            assert dtypes.count(jnp.bfloat16) == n_param_leaves, dtypes

    assert trajs["f32"][-1] < trajs["f32"][0]  # it actually trains
    np.testing.assert_allclose(trajs["bf16"], trajs["f32"], rtol=1e-2)


def test_grad_accum_ragged_batch_pads_and_matches():
    """An epoch-final ragged batch (3 rows, grad_accum=2) must train
    instead of crashing: shard_batch pads to a dp*accum multiple, padded
    rows carry zero valid tokens, and the sum-form token-mean loss and
    updates equal the unpadded monolithic step exactly."""
    from loco_asr_tpu.models.gpt2 import model as g

    cfg = g.tiny_gpt2_config(n_positions=32, n_embd=16, n_head=2,
                             embd_pdrop=0.0, attn_pdrop=0.0,
                             resid_pdrop=0.0)
    params = g.gpt2_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch3 = {"ids": jnp.asarray(rng.integers(0, cfg.vocab_size, (3, 32))),
              "lengths": jnp.asarray([32, 20, 16], jnp.int32)}
    tx = optax.sgd(1e-2)
    mesh = meshlib.make_mesh(data=1)

    step1 = train.make_lm_train_step(cfg, mesh, tx, donate=False)
    p1, _, m1 = step1(params, tx.init(params), batch3, jax.random.PRNGKey(1))

    padded = train.shard_batch(batch3, mesh, grad_accum=2)
    assert padded["ids"].shape[0] == 4  # next multiple of dp(1)*accum(2)
    step2 = train.make_lm_train_step(cfg, mesh, tx, donate=False,
                                     grad_accum=2)
    p2, _, m2 = step2(params, tx.init(params), padded, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m2["ntokens"]), float(m1["ntokens"]))
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(p1)),
                    jax.tree_util.tree_leaves(jax.device_get(p2))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-7)
