"""Multi-device sharding tests on the virtual 8-CPU mesh: partition rules,
sharded forward equivalence, and a full sharded train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from loco_asr_tpu.models.gpt2 import model as g
from loco_asr_tpu.models.speecht5 import model as st5
from loco_asr_tpu.models.speecht5.config import tiny_config
from loco_asr_tpu.parallel import mesh as meshlib, partition, train

pytestmark = pytest.mark.slow  # heavy tier: full pipeline drives / virtual-mesh collectives


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return meshlib.make_mesh(data=2, fsdp=2, tensor=2)


def _no_dropout_cfg():
    import dataclasses

    cfg = tiny_config(hidden_size=32, encoder_attention_heads=4,
                      decoder_attention_heads=4, encoder_ffn_dim=64,
                      decoder_ffn_dim=64)
    return dataclasses.replace(
        cfg, positional_dropout=0.0, hidden_dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, apply_spec_augment=False)


def test_make_mesh_infer_axis():
    m = meshlib.make_mesh(data=-1, fsdp=1, tensor=2)
    assert m.shape["data"] * m.shape["tensor"] == jax.device_count()


def test_partition_specs_cover_attention():
    cfg = tiny_config()
    params = st5.asr_init(jax.random.PRNGKey(0), cfg)
    specs = partition.partition_specs(params)
    enc0 = specs["encoder"]["wrapped_encoder"]["layers"]["0"]
    assert enc0["attention"]["q_proj"]["kernel"] == P("fsdp", "tensor")
    assert enc0["attention"]["out_proj"]["kernel"] == P("tensor", "fsdp")
    assert enc0["feed_forward"]["intermediate_dense"]["kernel"] == P("fsdp", "tensor")
    assert specs["text_decoder_postnet"]["lm_head"]["kernel"] == P("fsdp", "tensor")


def test_sharded_gpt2_forward_matches_single(mesh8):
    """TP+FSDP-sharded forward must equal the replicated forward bitwise-ish."""
    cfg = g.tiny_gpt2_config(n_embd=32, n_head=4)
    params = g.gpt2_init(jax.random.PRNGKey(0), cfg)
    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (8, 16))

    want, _ = g.gpt2_logits(params, cfg, jnp.asarray(ids))

    sharded = partition.shard_params(params, mesh8)
    ids_sh = jax.device_put(jnp.asarray(ids), meshlib.data_sharding(mesh8))
    got, _ = jax.jit(lambda p, i: g.gpt2_logits(p, cfg, i))(sharded, ids_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_sharded_asr_train_step(mesh8):
    """Full DP+FSDP+TP train step compiles and runs on the 8-device mesh."""
    cfg = tiny_config(hidden_size=32, encoder_attention_heads=4,
                      decoder_attention_heads=4, encoder_ffn_dim=64,
                      decoder_ffn_dim=64)
    with jax.default_device(jax.devices("cpu")[0]):
        params = st5.asr_init(jax.random.PRNGKey(0), cfg)
    params = partition.shard_params(params, mesh8)
    tx = train.adamw(1e-4)
    opt_state = tx.init(params)
    step = train.make_asr_train_step(cfg, mesh8, tx, donate=False)

    rng = np.random.default_rng(1)
    batch = {
        "input_values": jnp.asarray(rng.standard_normal((8, 320)).astype(np.float32)),
        "attention_mask": jnp.ones((8, 320), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, cfg.vocab_size, (8, 6))),
    }
    batch = train.shard_batch(batch, mesh8)
    p1, o1, metrics = step(params, opt_state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    # params actually changed
    before = jax.tree_util.tree_leaves(params)[0]
    after = jax.tree_util.tree_leaves(p1)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))

    # Output shardings must be a FIXED POINT of the input shardings:
    # without the out_shardings pin GSPMD returned some params with a
    # different PartitionSpec (e.g. a replicated bias came back sharded on
    # 'tensor'), so feeding step outputs into the next step recompiled the
    # whole program (a full extra relay compile per trainer process) and
    # the layout drifted off partition.TRANSFORMER_RULES.
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p1)):
        assert a.sharding == b.sharding, (a.sharding, b.sharding)
    p2, o2, _ = step(p1, o1, batch, jax.random.PRNGKey(3))
    for a, b in zip(jax.tree_util.tree_leaves((p1, o1)),
                    jax.tree_util.tree_leaves((p2, o2))):
        assert a.sharding == b.sharding, (a.sharding, b.sharding)


def _tiny_asr_batch(cfg, b=8):
    rng = np.random.default_rng(1)
    return {
        "input_values": jnp.asarray(
            rng.standard_normal((b, 320)).astype(np.float32)),
        "attention_mask": jnp.ones((b, 320), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, cfg.vocab_size, (b, 6))),
    }


def test_sharded_train_step_grad_accum(mesh8):
    """grad_accum under the DP+FSDP+TP mesh: the scanned microbatch step
    must compile, run, and match the monolithic sharded step up to f32
    reduction-order roundoff (dropout-free tiny config).

    SGD keeps the param comparison well-conditioned: Adam's first-step
    update is ~sign(g)*lr, infinitely sensitive to roundoff where g~0."""
    cfg = _no_dropout_cfg()
    with jax.default_device(jax.devices("cpu")[0]):
        params = st5.asr_init(jax.random.PRNGKey(0), cfg)
    params = partition.shard_params(params, mesh8)
    import optax
    tx = optax.sgd(1e-2)

    batch = train.shard_batch(_tiny_asr_batch(cfg), mesh8)
    outs = {}
    for accum in (1, 2):
        step = train.make_asr_train_step(cfg, mesh8, tx, donate=False,
                                         grad_accum=accum)
        p1, _, m = step(params, tx.init(params), batch,
                        jax.random.PRNGKey(2))
        outs[accum] = (jax.device_get(p1), float(m["loss"]),
                       float(m["grad_norm"]))
    np.testing.assert_allclose(outs[2][1], outs[1][1], rtol=1e-6)
    np.testing.assert_allclose(outs[2][2], outs[1][2], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(outs[1][0]),
                    jax.tree_util.tree_leaves(outs[2][0])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_sharded_forward_parity_3axis(mesh8):
    """Regression pin for the 3-axis-mesh composed-forward miscompile
    (XLA:CPU SPMD, jax 0.9.0): without the boundary activation-sharding
    constraints (ops/act_sharding.py) the encoder->decoder program on a
    (2,2,2) mesh returned self-attention outputs off by O(1) while every
    stage matched in isolation.  The sharded train-step loss must match
    the single-device loss to f32 roundoff."""
    cfg = _no_dropout_cfg()
    with jax.default_device(jax.devices("cpu")[0]):
        params = st5.asr_init(jax.random.PRNGKey(0), cfg)
    batch = _tiny_asr_batch(cfg)

    loss1, aux1 = jax.jit(
        lambda p, b, r: st5.asr_loss(
            p, cfg, b["input_values"], b["attention_mask"], b["labels"],
            deterministic=False, rng=r)
    )(params, batch, jax.random.PRNGKey(2))

    import optax
    step = train.make_asr_train_step(cfg, mesh8, optax.sgd(1e-2),
                                     donate=False)
    ps = partition.shard_params(params, mesh8)
    bs = train.shard_batch(batch, mesh8)
    _, _, m = step(ps, optax.sgd(1e-2).init(ps), bs, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m["loss"]), float(loss1), rtol=2e-6)
    np.testing.assert_allclose(float(m["nll_sum"]), float(aux1["nll_sum"]),
                               rtol=2e-6)


def test_multislice_mesh_falls_back_single_slice():
    # CPU devices report no slice_index -> single slice -> plain mesh
    m = meshlib.make_multislice_mesh(data=2, fsdp=2, tensor=2)
    assert dict(m.shape) == {"data": 2, "fsdp": 2, "tensor": 2}


def test_multislice_grid_layout():
    """Simulated 2-slice grouping: slices stack along the data (DCN) axis,
    each slice's ICI-adjacent devices stay inside one data-axis block."""
    m = meshlib.make_multislice_mesh(data=4, fsdp=1, tensor=2, num_slices=2)
    assert dict(m.shape) == {"data": 4, "fsdp": 1, "tensor": 2}
    devs = jax.devices()
    grid = m.devices
    # slice 0 = devices 0..3 fills data rows 0-1; slice 1 = devices 4..7
    assert [d.id for d in grid[:2].reshape(-1)] == [d.id for d in devs[:4]]
    assert [d.id for d in grid[2:].reshape(-1)] == [d.id for d in devs[4:8]]


def test_multislice_mesh_runs_data_collective():
    """A gradient-style psum over the data axis executes on the hybrid grid."""
    m = meshlib.make_multislice_mesh(data=4, fsdp=1, tensor=2, num_slices=2)
    x = jnp.arange(8.0).reshape(8, 1)
    xs = jax.device_put(x, meshlib.data_sharding(m))
    total = jax.jit(lambda a: jnp.sum(a))(xs)
    assert float(total) == float(np.sum(np.arange(8.0)))


def test_multislice_rejects_indivisible():
    with pytest.raises(ValueError):
        meshlib.make_multislice_mesh(data=3, fsdp=1, tensor=1, num_slices=2)


def test_validate_drop_logs_warning(caplog):
    import logging
    m = meshlib.make_mesh(data=2, fsdp=2, tensor=2)
    # 5 is not divisible by tensor=2, and dim0 (size 2) can't absorb the
    # combined ("fsdp","tensor")=4 either -> true replication, warning
    with caplog.at_level(logging.WARNING, logger="loco_asr_tpu.parallel.partition"):
        spec = partition._validate(P("fsdp", "tensor"), (2, 5), m, path="toy.kernel")
    assert spec == P("fsdp", None)
    assert any("toy.kernel" in r.message and "REPLICATED" in r.message
               for r in caplog.records)


def test_validate_relocates_dropped_axis():
    """An axis whose dim is indivisible moves to another dim that can
    honor it (gpt2-xl wte vocab % fsdp != 0 -> fsdp shards the embedding
    dim instead of replicating ~920 MB/chip; see test_fsdp_memory)."""
    m = meshlib.make_mesh(data=1, fsdp=8, tensor=1)
    # vocab 50257 not divisible by 8; embedding dim 1600 is
    spec = partition._validate(P("fsdp", "tensor"), (50257, 1600), m,
                               path="wte.weight")
    assert spec == P(None, ("tensor", "fsdp"))
    # with tensor=2 the combined (tensor, fsdp)=16 still divides 1600
    m2 = meshlib.make_mesh(data=1, fsdp=4, tensor=2)
    spec2 = partition._validate(P("fsdp", "tensor"), (50257, 1600), m2,
                                path="wte.weight")
    assert spec2 == P(None, ("tensor", "fsdp"))


def test_init_sharded_places_params(mesh8):
    cfg = tiny_config(hidden_size=32, encoder_attention_heads=4,
                      encoder_ffn_dim=64)
    params = train.init_sharded(
        lambda rng, cfg: st5.asr_init(rng, cfg), jax.random.PRNGKey(0), cfg, mesh8)
    k = params["encoder"]["wrapped_encoder"]["layers"]["0"]["attention"]["q_proj"]["kernel"]
    assert k.sharding.spec == P("fsdp", "tensor")


def test_slice_groups_rejects_non_dividing_count():
    """8 devices into 3 simulated slices must raise, not silently yield 4
    groups (the old guard checked divisibility by group SIZE, not count)."""
    with pytest.raises(ValueError, match="not divisible"):
        meshlib.slice_groups(jax.devices(), 3)
    groups = meshlib.slice_groups(jax.devices(), 4)
    assert len(groups) == 4


def test_sharded_gpt2_scoring_parity_3axis(mesh8):
    """GPT-2 composed scoring (embed -> blocks -> lm head -> NLL) under
    the 3-axis mesh, with and without the activation_mesh constraints,
    must match single-device scoring to f32 roundoff (companion pin to
    test_sharded_forward_parity_3axis; train_lm's eval_nll runs this
    shape with the constraints active)."""
    from loco_asr_tpu.models.gpt2 import model as g
    from loco_asr_tpu.ops.act_sharding import activation_mesh
    from loco_asr_tpu.parallel.mesh import data_sharding

    cfg = g.tiny_gpt2_config(n_positions=32, n_embd=32, n_head=4,
                             embd_pdrop=0.0, attn_pdrop=0.0,
                             resid_pdrop=0.0)
    params = g.gpt2_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (8, 32))
                      .astype(np.int32))

    def score(p, ids):
        logits, _ = g.gpt2_logits(p, cfg, ids)
        return g.token_nll(logits, ids)

    def score_ctx(p, ids):
        with activation_mesh(mesh8):
            logits, _ = g.gpt2_logits(p, cfg, ids)
        return g.token_nll(logits, ids)

    n1 = jax.device_get(jax.jit(score)(params, ids))
    ps = partition.shard_params(params, mesh8)
    ids_s = jax.device_put(ids, data_sharding(mesh8))
    for fn in (score, score_ctx):
        n2 = jax.device_get(jax.jit(fn)(ps, ids_s))
        np.testing.assert_allclose(n2, n1, rtol=1e-4, atol=2e-6)


def test_sharded_greedy_decode_parity_3axis(mesh8):
    """Greedy decode (incremental KV steps, while_loop) with params
    sharded over the 3-axis mesh must produce token-identical hypotheses
    to the single-device decode — pins decode-under-TP/FSDP, which no
    pipeline exercises beyond DP, with the asr_decode_step boundary
    constraints active (train_asr dev-eval runs this composition)."""
    from loco_asr_tpu.decode.beam import greedy_decode
    from loco_asr_tpu.ops.act_sharding import activation_mesh
    from loco_asr_tpu.parallel.mesh import data_sharding

    cfg = _no_dropout_cfg()
    with jax.default_device(jax.devices("cpu")[0]):
        params = st5.asr_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    enc = jnp.asarray(
        rng.standard_normal((8, 7, cfg.hidden_size)).astype(np.float32))
    msk = jnp.ones((8, 7), jnp.int32)

    toks1, lens1 = jax.jit(lambda p, e, m: greedy_decode(
        p, cfg, e, m, max_len=8))(params, enc, msk)

    ps = partition.shard_params(params, mesh8)
    sh = data_sharding(mesh8)

    def dec(p, e, m):
        with activation_mesh(mesh8):
            return greedy_decode(p, cfg, e, m, max_len=8)

    toks2, lens2 = jax.jit(dec)(ps, jax.device_put(enc, sh),
                                jax.device_put(msk, sh))
    np.testing.assert_array_equal(np.asarray(jax.device_get(toks2)),
                                  np.asarray(jax.device_get(toks1)))
    np.testing.assert_array_equal(np.asarray(jax.device_get(lens2)),
                                  np.asarray(jax.device_get(lens1)))
