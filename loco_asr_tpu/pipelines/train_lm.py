"""Train a GPT-2-class LM on Fisher transcripts — BASELINE config 3
("Transformer LM training + perplexity eval"), the capability lms/ was
built for but whose training code the reference snapshot lacks
(lms/README.md:3).

Data: Kaldi 'utt_id text' files; each recording is rebuilt as one
chronological token stream (the max_len dataset's conversation semantics,
lms/src/utils.py:108-139) and split into fixed seq_len training chunks —
conversation-level context is IN the training distribution, not just eval.

TPU trainer: (data, fsdp, tensor) mesh, jit'd step, orbax resume, dev PPL.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Iterator, List

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train a GPT-2 LM on Fisher text (TPU)")
    p.add_argument("--train_file", required=True, help="Kaldi text file")
    p.add_argument("--dev_file", default=None)
    p.add_argument("--out_dir", default="exp/lm")
    p.add_argument("--model", default="gpt2",
                   choices=["tiny", "gpt2", "gpt2-medium", "gpt2-large", "gpt2-xl"])
    p.add_argument("--checkpoint", default=None, help="init weights")
    p.add_argument("--tokenizer", default="char")
    p.add_argument("--seq_len", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--warmup_steps", type=int, default=200)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--eval_every", type=int, default=1000)
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--mesh", default="-1,1,1")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--remat", nargs="?", const="full", default="none",
                   choices=["none", "full", "dots", "hybrid", "lite"],
                   help="rematerialize block intermediates on backward "
                        "(ops/remat.py; 'dots'/'hybrid' target the "
                        "HBM-bound backward, 'full' minimizes memory)")
    p.add_argument("--nan_recovery", action="store_true",
                   help="on a non-finite loss, roll back to the last "
                        "checkpoint and skip the offending batch "
                        "(same failure-detection contract as train_asr)")
    p.add_argument("--nan_inject_step", type=int, default=None,
                   help="fault injection (testing): poison the parameters "
                        "at this step ONCE with NaNs to exercise "
                        "--nan_recovery")
    p.add_argument("--attn_impl", default="dense",
                   choices=["dense", "flash", "ring", "ulysses"],
                   help="causal self-attention during training: 'flash' "
                        "(O(T)-memory Pallas kernel) for long-context "
                        "windows; 'ring'/'ulysses' sequence-parallel over "
                        "--sp_devices")
    p.add_argument("--sp_devices", type=int, default=0,
                   help="devices for the sequence axis when --attn_impl "
                        "is ring/ulysses")
    p.add_argument("--rng_impl", default="rbg",
                   choices=["threefry", "rbg", "unsafe_rbg"],
                   help="PRNG for dropout masks: 'rbg' uses the TPU "
                        "hardware RNG (docs/BENCH.md RNG section); "
                        "'threefry' for bitwise reproducibility")
    p.add_argument("--compute_dtype", choices=["same", "bfloat16"],
                   default="same",
                   help="mixed precision: run fwd/bwd in this dtype while "
                        "master params + optimizer stay f32 (grads upcast "
                        "through the cast VJP)")
    p.add_argument("--grad_clip", type=float, default=None,
                   help="global-norm gradient clipping threshold")
    p.add_argument("--optimizer", choices=["adamw", "adafactor"],
                   default="adamw",
                   help="'adafactor' stores row/column-factored second "
                        "moments (~zero optimizer HBM) — required for "
                        "gpt2-xl on one 16 GB chip (docs/BENCH.md)")
    p.add_argument("--opt_mu_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="dtype of Adam's first moment (bfloat16 halves "
                        "its HBM footprint; what lets gpt2-large train "
                        "on one 16 GB chip — second moment stays f32)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatches per optimizer step (sum-form "
                        "accumulation, exact token-mean equivalence; "
                        "batch_size must divide evenly)")
    p.add_argument("--eos_id", type=int, default=None,
                   help="override the tokenizer's eos id for the "
                        "conversation-stream separators (e.g. 2 to match "
                        "the SpeechT5 decoder's eos/start token so a "
                        "shallow-fusion LM sees the SAME boundary token "
                        "at decode time that it trained on — a separator "
                        "mismatch measurably destroys cross-utterance "
                        "induction, docs/LOCO_EXPERIMENT.md)")
    p.add_argument("--tiny_n_embd", type=int, default=32,
                   help="hidden size for --model tiny (eval_ppl re-derives "
                        "the config from the checkpoint's shapes)")
    p.add_argument("--tiny_n_layer", type=int, default=2,
                   help="layer count for --model tiny")
    p.add_argument("--tiny_n_head", type=int, default=4,
                   help="head count for --model tiny")
    p.add_argument("--loss_impl", choices=["chunked", "dense"],
                   default="chunked",
                   help="'chunked' (default) streams the lm-head loss in "
                        "time chunks so the [B,L,V] logits never hit HBM "
                        "(fwd or bwd); 'dense' materializes them")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def _stream_chunks(rec_id2tokens, seq_len: int, eos_id: int,
                   shuffle_seed=None) -> List[np.ndarray]:
    """Concatenate recording streams -> non-overlapping seq_len chunks."""
    recs = list(rec_id2tokens.values())
    if shuffle_seed is not None:
        np.random.default_rng(shuffle_seed).shuffle(recs)
    flat: List[int] = []
    for toks in recs:
        flat.extend(toks)
    chunks = []
    for i in range(0, len(flat) - 1, seq_len):
        chunk = flat[i:i + seq_len]
        if len(chunk) >= 2:
            chunks.append(np.asarray(chunk, np.int32))
    return chunks


def main(argv=None) -> int:
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .common import setup_compilation_cache, setup_rng_impl
    setup_rng_impl(args.rng_impl)  # before any jax.random key exists
    setup_compilation_cache()  # persistent XLA executable cache (docs/BENCH.md)

    from ..data import lm_datasets
    from ..data.tokenizer import load_tokenizer
    from ..models.gpt2 import model as g
    from ..parallel import mesh as meshlib, partition, train
    from ..utils.checkpoint import Checkpointer
    from ..utils.metrics import MetricsWriter
    from .eval_ppl import load_gpt2_params

    tokenizer = load_tokenizer(args.tokenizer)
    if args.model == "tiny":
        cfg = g.tiny_gpt2_config(vocab_size=256, n_positions=max(args.seq_len, 64),
                                 n_embd=args.tiny_n_embd,
                                 n_layer=args.tiny_n_layer,
                                 n_head=args.tiny_n_head)
    else:
        cfg = g.PRESETS[args.model]
        if args.tokenizer == "char":
            cfg = g.GPT2Config(**{**cfg.__dict__, "vocab_size": 256})
    if args.tokenizer == "char":
        tokenizer.vocab_size = cfg.vocab_size
    if args.eos_id is not None:
        tokenizer.eos_token_id = args.eos_id
    assert args.seq_len <= cfg.n_positions

    dims = [int(x) for x in args.mesh.split(",")]
    mesh = meshlib.make_mesh(*dims)
    params = load_gpt2_params(args.checkpoint, cfg)
    params = partition.shard_params(params, mesh)
    if args.optimizer == "adafactor":
        tx = train.adafactor(args.lr, args.weight_decay, args.warmup_steps,
                             args.steps, clip_norm=args.grad_clip)
    else:
        tx = train.adamw(args.lr, args.weight_decay, args.warmup_steps,
                         args.steps, clip_norm=args.grad_clip,
                         mu_dtype=(jnp.bfloat16
                                   if args.opt_mu_dtype == "bfloat16" else None))
    opt_state = tx.init(params)
    ring = None
    if args.attn_impl in ("ring", "ulysses"):
        from jax.sharding import Mesh as JMesh

        n_sp = args.sp_devices or len(jax.devices())
        sp_mesh = JMesh(np.asarray(jax.devices()[:n_sp]), ("sequence",))
        ring = (sp_mesh, "sequence")
    # donate=True: XLA updates params/opt-state in place (the step's
    # out_shardings are pinned to its in_shardings, so aliasing is legal)
    # — halves the train loop's peak parameter HBM, which is what lets
    # gpt2-xl fit on one chip.  The nan_recovery rollback below never
    # touches the (donated-away) pre-step buffers: its restore target is
    # the host-side init snapshot.
    step_fn = train.make_lm_train_step(
        cfg, mesh, tx, donate=True, attn_impl=args.attn_impl, ring=ring,
        remat=args.remat,
        compute_dtype=(jnp.bfloat16 if args.compute_dtype == "bfloat16"
                       else None),
        loss_impl=args.loss_impl, grad_accum=args.grad_accum)

    train_ds = lm_datasets.MaxLenTextDataset(args.train_file, tokenizer,
                                             max_len=args.seq_len)
    dev_chunks = None
    if args.dev_file:
        dev_ds = lm_datasets.MaxLenTextDataset(args.dev_file, tokenizer,
                                               max_len=args.seq_len)
        dev_chunks = _stream_chunks(dev_ds.rec_id2tokens, args.seq_len,
                                    tokenizer.eos_token_id)

    ckpt = Checkpointer(os.path.join(args.out_dir, "ckpt"))
    metrics = MetricsWriter(os.path.join(args.out_dir, "metrics.jsonl"))
    start_step = 0
    if args.resume:
        target = {"params": jax.device_get(params),
                  "opt_state": jax.device_get(opt_state),
                  "step": np.asarray(0)}
        restored = ckpt.restore(target=target)
        if restored is not None:
            params = partition.shard_params(restored["params"], mesh)
            opt_state = jax.tree_util.tree_map(jnp.asarray, restored["opt_state"])
            start_step = int(restored["step"])
            print(f"resumed at step {start_step}", file=sys.stderr)

    def batches(epoch: int) -> Iterator[dict]:
        chunks = _stream_chunks(train_ds.rec_id2tokens, args.seq_len,
                                tokenizer.eos_token_id,
                                shuffle_seed=args.seed + epoch)
        order = np.random.default_rng(args.seed + epoch).permutation(len(chunks))
        for i in range(0, len(order), args.batch_size):
            idx = order[i:i + args.batch_size]
            lens = np.asarray([len(chunks[j]) for j in idx], np.int32)
            ids = np.zeros((len(idx), args.seq_len), np.int32)
            for r, j in enumerate(idx):
                ids[r, :len(chunks[j])] = chunks[j]
            yield {"ids": ids, "lengths": lens}

    from ..ops.act_sharding import activation_mesh
    from ..parallel.mesh import AXES

    @jax.jit
    def eval_nll(params, ids, lengths):
        # pin boundary activation shardings: params are train-mesh
        # sharded and free GSPMD propagation through the composed
        # forward is exactly what act_sharding.py guards against
        with activation_mesh(mesh, batch_axes=(AXES.data, AXES.fsdp)):
            logits, _ = g.gpt2_logits(params, cfg, ids)
        nll = g.token_nll(logits, ids)
        valid = (jnp.arange(nll.shape[1])[None, :] < (lengths - 1)[:, None])
        return jnp.sum(nll * valid), jnp.sum(valid)

    def run_eval(params, step):
        if dev_chunks is None:
            return
        total, count = 0.0, 0
        for i in range(0, len(dev_chunks), args.batch_size):
            group = dev_chunks[i:i + args.batch_size]
            lens = np.asarray([len(c) for c in group], np.int32)
            ids = np.zeros((len(group), args.seq_len), np.int32)
            for r, c in enumerate(group):
                ids[r, :len(c)] = c
            s, n = eval_nll(params, jnp.asarray(ids), jnp.asarray(lens))
            total += float(s)
            count += int(n)
        ppl = float(np.exp(total / max(count, 1)))
        metrics.log(step=step, dev_ppl=ppl, dev_tokens=count)
        print(f"step {step}: dev PPL {ppl:.2f} over {count} tokens",
              file=sys.stderr)

    rng = jax.random.PRNGKey(args.seed)
    step = start_step
    epoch = 0
    stream = batches(epoch)
    t0 = time.perf_counter()
    init_snap = None
    if args.nan_recovery:
        # rollback target when no checkpoint exists yet — without it a
        # NaN before the first save left params poisoned and the loop
        # never advanced (restore returned None, step never incremented)
        init_snap = (jax.device_get(params), jax.device_get(opt_state))
    while step < args.steps:
        try:
            batch = next(stream)
        except StopIteration:
            epoch += 1
            stream = batches(epoch)
            continue
        rng, sub = jax.random.split(rng)
        if args.nan_inject_step is not None and step + 1 == args.nan_inject_step:
            # fault injection: NaN-poisoned parameters -> non-finite loss
            # and grads; --nan_recovery must restore the last checkpoint
            params = jax.tree_util.tree_map(lambda x: x * jnp.nan, params)
            args.nan_inject_step = None
        dev_batch = train.shard_batch(
            {k: jnp.asarray(v) for k, v in batch.items()}, mesh,
            grad_accum=args.grad_accum)
        new_params, new_opt, m = step_fn(params, opt_state, dev_batch, sub)
        if args.nan_recovery and not np.isfinite(float(m["loss"])):
            # failure detection (SURVEY §5): roll back and skip the batch
            print(f"step {step+1}: non-finite loss; rolling back",
                  file=sys.stderr)
            metrics.log(step=step + 1, event="nan_rollback")
            # restore target built from the HOST-side init snapshot: the
            # live params/opt_state buffers were donated to the step
            target = {"params": init_snap[0],
                      "opt_state": init_snap[1],
                      "step": np.asarray(0)}
            restored = ckpt.restore(target=target)
            if restored is not None:
                params = partition.shard_params(restored["params"], mesh)
                opt_state = jax.tree_util.tree_map(jnp.asarray,
                                                   restored["opt_state"])
            else:
                print("no checkpoint yet; restoring initial state",
                      file=sys.stderr)
                params = partition.shard_params(init_snap[0], mesh)
                opt_state = jax.tree_util.tree_map(jnp.asarray, init_snap[1])
            continue
        params, opt_state = new_params, new_opt
        step += 1
        if step % args.log_every == 0:
            dt = time.perf_counter() - t0
            t0 = time.perf_counter()
            metrics.log(step=step, loss=float(m["loss"]),
                        grad_norm=float(m["grad_norm"]),
                        steps_per_sec=args.log_every / dt)
            print(f"step {step}: loss {float(m['loss']):.4f}", file=sys.stderr)
        if step % args.eval_every == 0:
            run_eval(params, step)
        if step % args.save_every == 0 or step == args.steps:
            ckpt.save(step, {"params": jax.device_get(params),
                             "opt_state": jax.device_get(opt_state),
                             "step": np.asarray(step)})
    run_eval(params, step)
    print("Training done!", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
