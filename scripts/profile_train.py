"""Train-step profiling pass: where do the honest (post-DCE-fix)
49.5 ms (B=8) / 90.7 ms (B=16) go?

The forward at B=16 is 12.7 ms, so an ideal fwd+bwd+AdamW step is ~3x
forward + ~3 ms of optimizer traffic (~41 ms) — the measured step is
~2.2x that.  This script answers "which backward is slow" with the same
chained-loop methodology as every other number in docs/BENCH.md
(utils/profiling.device_time_per_iter; naive timing lies on this relay
TPU), by differencing nested stages:

  fwd          asr_loss value only (train mode, dropout rngs live)
  fwd_bwd      value_and_grad, grads consumed via global_norm
  full_step    make_asr_train_step (grads + AdamW + every leaf consumed)
  *_freeze     same with the conv feature extractor frozen
               (stop_gradient -> XLA drops the whole conv backward)
  prenet_bwd   grads of the speech prenet alone (conv stack + proj +
               pos-conv), isolating the conv/instance-norm backward
  trunk_bwd    grads of the 12-layer transformer alone on fixed hidden

Derived rows:
  bwd total        = fwd_bwd - fwd
  conv bwd share   = fwd_bwd - fwd_bwd_freeze
  optimizer+consume= full_step - fwd_bwd

--trace DIR additionally dumps a jax.profiler trace of the full step and
prints the top ops by total device time (parsed from the perfetto
trace.json.gz), so fusion-level pathology is visible without TensorBoard.

Usage: python scripts/profile_train.py [--batch 8] [--seconds 5]
       [--label_len 128] [--iters 6] [--trace DIR] [--stages a,b,c]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate_trace(trace_dir: str, steps: int, top: int = 25) -> None:
    """Aggregate device-track op durations from the newest perfetto
    trace.json.gz under ``trace_dir`` and print the top ops per step."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        print(f"[trace] no trace.json.gz under {trace_dir}", file=sys.stderr)
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device tracks: pid names containing "TPU"/"/device:" — fall back to
    # any complete event with args.long_name (XLA ops carry HLO metadata)
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "device" in n.lower()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        args_ = e.get("args") or {}
        # HLO metadata when present: long_name carries the source op
        # (e.g. "transpose ... fusion metadata={op_name=...}") — far more
        # attributable than the bare fusion.NNNN id
        long = args_.get("long_name") or args_.get("hlo_op") or ""
        if long:
            name = f"{name} :: {long}"
        tot[name] += e.get("dur", 0.0)
        cnt[name] += 1
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:top]
    total = sum(tot.values())
    print(f"\n[trace] top {top} ops by device time "
          f"(per step, {steps} steps traced; {paths[-1]}):")
    print(f"{'us/step':>10} {'count':>6} {'pct':>6}  name")
    for name, us in rows:
        print(f"{us/steps:10.1f} {cnt[name]:6d} {100*us/total:5.1f}%  "
              f"{name[:160]}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--label_len", type=int, default=128)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--trace", default=None)
    p.add_argument("--stages", default=None,
                   help="comma list to run a subset (fwd,fwd_bwd,"
                        "fwd_bwd_freeze,full,full_freeze,prenet_bwd,"
                        "trunk_bwd); empty string = trace only")
    p.add_argument("--rng_impl", default="threefry",
                   choices=["threefry", "rbg", "unsafe_rbg"],
                   help="dropout PRNG (trainers default to rbg; threefry "
                        "keeps historical profile rows comparable)")
    p.add_argument("--attn_impl", default="dense",
                   choices=["dense", "flash"],
                   help="encoder/decoder attention (flash = the "
                        "conversation-window training configuration)")
    p.add_argument("--remat", default="none",
                   choices=["none", "full", "dots", "hybrid", "lite"])
    args = p.parse_args(argv)

    from loco_asr_tpu.pipelines.common import setup_rng_impl
    setup_rng_impl(args.rng_impl)

    import jax
    import jax.numpy as jnp
    import optax

    from loco_asr_tpu.models.speecht5 import model as st5, prenets
    from loco_asr_tpu.models.speecht5 import encoder as enc_mod
    from loco_asr_tpu.models.speecht5.config import SpeechT5Config
    from loco_asr_tpu.parallel import mesh as meshlib, partition, train
    from loco_asr_tpu.pipelines import common
    from loco_asr_tpu.utils.profiling import device_time_per_iter

    common.setup_compilation_cache()
    cfg = SpeechT5Config()
    mesh = meshlib.make_mesh(-1, 1, 1)
    params = common.load_speecht5_params(None, "asr", cfg,
                                         jax.random.PRNGKey(0))
    params = partition.shard_params(params, mesh)
    rng = np.random.default_rng(0)
    t = int(args.seconds * 16000)
    wav = jnp.asarray(
        rng.standard_normal((args.batch, t)).astype(np.float32) * 0.1)
    msk = jnp.ones((args.batch, t), jnp.int32)
    labels = jnp.asarray(rng.integers(
        1, cfg.vocab_size, (args.batch, args.label_len)).astype(np.int32))
    key = jax.random.PRNGKey(1)

    import dataclasses
    if args.attn_impl != "dense" and cfg.attention_dropout > 0.0:
        # the kernels carry no attention-prob dropout (same zeroing the
        # trainers apply, parallel/train.make_asr_train_step)
        cfg = dataclasses.replace(cfg, attention_dropout=0.0)
    remat = args.remat if args.remat != "none" else False

    def loss_fn(p, w, m, l, r, freeze=False):
        if freeze:
            p = train._with_frozen_feature_encoder(p)
        loss, _ = st5.asr_loss(p, cfg, w, m, l, deterministic=False, rng=r,
                               attn_impl=args.attn_impl, remat=remat,
                               unroll_layers=True)
        return loss

    def fwd(p, w, m, l, r):
        return loss_fn(p, w, m, l, r)

    def fwd_bwd(p, w, m, l, r):
        loss, grads = jax.value_and_grad(loss_fn)(p, w, m, l, r)
        return loss + optax.global_norm(grads)

    def fwd_bwd_freeze(p, w, m, l, r):
        loss, grads = jax.value_and_grad(
            lambda p, w, m, l, r: loss_fn(p, w, m, l, r, freeze=True))(
            p, w, m, l, r)
        return loss + optax.global_norm(grads)

    tx = train.adamw(1e-4, 0.01, 10, 1000)
    opt0 = tx.init(params)

    def full_factory(freeze):
        step_fn = train.make_asr_train_step(
            cfg, mesh, tx, donate=False, freeze_feature_encoder=freeze,
            attn_impl=args.attn_impl, remat=remat)

        def full(p, opt, b, r):
            new_p, new_opt, m = step_fn(p, opt, b, r)
            tot = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(new_p))
            return m["loss"] + m["grad_norm"] + tot * 1e-20
        return full

    batch_d = train.shard_batch({"input_values": wav,
                                 "attention_mask": msk,
                                 "labels": labels}, mesh)

    # prenet/trunk isolation
    hidden, hmask = jax.jit(lambda p, w, m: prenets.speech_prenet(
        p["encoder"]["prenet"], cfg, w, m, deterministic=True))(
        params, wav, msk)

    def prenet_bwd(pp, w, m):
        def f(pp):
            h, _ = prenets.speech_prenet(pp, cfg, w, m, deterministic=True)
            return jnp.sum(h * 1e-6)
        loss, g = jax.value_and_grad(f)(pp)
        return loss + optax.global_norm(g)

    def trunk_bwd(pt, h, hm):
        def f(pt):
            out = enc_mod.encoder(pt, cfg, h, attention_mask=hm,
                                  deterministic=True)
            return jnp.sum(out * 1e-6)
        loss, g = jax.value_and_grad(f)(pt)
        return loss + optax.global_norm(g)

    stages = {
        "fwd": lambda: device_time_per_iter(
            fwd, params, wav, msk, labels, key, iters=args.iters),
        "fwd_bwd": lambda: device_time_per_iter(
            fwd_bwd, params, wav, msk, labels, key, iters=args.iters),
        "fwd_bwd_freeze": lambda: device_time_per_iter(
            fwd_bwd_freeze, params, wav, msk, labels, key, iters=args.iters),
        "full": lambda: device_time_per_iter(
            full_factory(False), params, opt0, batch_d, key,
            iters=args.iters),
        "full_freeze": lambda: device_time_per_iter(
            full_factory(True), params, opt0, batch_d, key,
            iters=args.iters),
        "prenet_bwd": lambda: device_time_per_iter(
            prenet_bwd, params["encoder"]["prenet"], wav, msk,
            iters=args.iters),
        "trunk_bwd": lambda: device_time_per_iter(
            trunk_bwd, params["encoder"]["wrapped_encoder"], hidden, hmask,
            iters=args.iters),
    }
    wanted = ([s for s in args.stages.split(",") if s]
              if args.stages is not None else list(stages))
    res = {}
    print(f"batch={args.batch} seconds={args.seconds} "
          f"labels={args.label_len} backend={jax.default_backend()}")
    for name in wanted:
        res[name] = stages[name]()
        print(f"{name:16} {res[name]*1e3:9.2f} ms")
    if "fwd" in res and "fwd_bwd" in res:
        print(f"{'bwd total':16} {(res['fwd_bwd']-res['fwd'])*1e3:9.2f} ms")
    if "fwd_bwd" in res and "fwd_bwd_freeze" in res:
        print(f"{'conv bwd share':16} "
              f"{(res['fwd_bwd']-res['fwd_bwd_freeze'])*1e3:9.2f} ms")
    if "full" in res and "fwd_bwd" in res:
        print(f"{'opt + consume':16} "
              f"{(res['full']-res['fwd_bwd'])*1e3:9.2f} ms")

    if args.trace:
        from loco_asr_tpu.utils.profiling import trace as jtrace
        full = full_factory(False)
        jax.block_until_ready(full(params, opt0, batch_d, key))  # compile
        steps = 3
        with jtrace(args.trace):
            for i in range(steps):
                r = full(params, opt0, batch_d,
                         jax.random.fold_in(key, i))
            jax.block_until_ready(r)
        aggregate_trace(args.trace, steps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
