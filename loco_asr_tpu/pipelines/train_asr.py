"""Fine-tune SpeechT5 ASR on a Kaldi-format corpus (Fisher) — the training
capability the reference designed its data layer for but never implemented
(SURVEY L0 row: "by design intent, future ASR training").

TPU-native trainer: (data, fsdp, tensor) mesh, sharded params + optimizer
state, one jit'd train step (XLA collectives), orbax checkpointing WITH
resume (fixing the reference's save-only gap), greedy-decode WER on the
dev set each eval, structured JSONL metrics.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train SpeechT5 ASR on Kaldi data (TPU)")
    p.add_argument("--train_dir", required=True, help="Kaldi data dir (train)")
    p.add_argument("--dev_dir", default=None, help="Kaldi data dir (dev)")
    p.add_argument("--out_dir", default="exp/asr")
    p.add_argument("--checkpoint", default=None,
                   help="init weights (HF/.npz/fairseq); random if omitted")
    p.add_argument("--tokenizer", default="char")
    p.add_argument("--vocab_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=500)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--grad_clip", type=float, default=None,
                   help="global-norm gradient clipping threshold")
    p.add_argument("--optimizer", choices=["adamw", "adafactor"],
                   default="adamw",
                   help="'adafactor' stores row/column-factored second "
                        "moments (~zero optimizer HBM; docs/BENCH.md)")
    p.add_argument("--opt_mu_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="dtype of Adam's first moment (bfloat16 halves "
                        "its HBM footprint; second moment stays f32)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatches per optimizer step (sum-form "
                        "accumulation, exact token-mean equivalence; "
                        "batch_size must divide evenly)")
    p.add_argument("--eval_every", type=int, default=1000)
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--max_seconds", type=float, default=20.0)
    p.add_argument("--max_label_len", type=int, default=None,
                   help="label token cap (default 128 per-utterance; "
                        "~16 tokens/s of window audio in conversation "
                        "mode)")
    p.add_argument("--conversation_seconds", type=float, default=0.0,
                   help="train on CONVERSATION WINDOWS of up to this many "
                        "seconds instead of single utterances: per "
                        "recording+channel, chronological utterances are "
                        "concatenated (audio via segments cropping, "
                        "transcripts with separator tokens) into "
                        "utterance-boundary-aligned windows — the ASR "
                        "twin of the LM conversation stream (reference "
                        "lms/src/utils.py:108-139).  Combine with "
                        "--attn_impl flash --remat lite at 100s+ windows "
                        "(dense attention OOMs, docs/BENCH.md)")
    p.add_argument("--mesh", default="-1,1,1",
                   help="data,fsdp,tensor mesh shape (-1 absorbs)")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32")
    p.add_argument("--compute_dtype", choices=["same", "bfloat16"],
                   default="same",
                   help="mixed precision: run fwd/bwd in this dtype while "
                        "master params + optimizer stay f32 (grads upcast "
                        "through the cast VJP); norm stats and the loss "
                        "softmax always reduce in f32")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--remat", nargs="?", const="full", default="none",
                   choices=["none", "full", "dots", "hybrid", "lite"],
                   help="rematerialize encoder intermediates on backward: "
                        "'full' = min memory (bare --remat keeps this "
                        "meaning); 'lite' = recompute only the fat "
                        "[B,H,T,T]/[B,T,ffn] tensors (HBM-bandwidth "
                        "policy); 'dots'/'hybrid' = keep dot outputs "
                        "(+ dropout masks).  See ops/remat.py")
    p.add_argument("--nan_recovery", action="store_true",
                   help="on a non-finite loss, roll back to the last "
                        "checkpoint and skip the offending batch")
    p.add_argument("--nan_inject_step", type=int, default=None,
                   help="fault injection (testing): poison the batch at "
                        "this step ONCE with NaNs to exercise "
                        "--nan_recovery")
    p.add_argument("--attn_impl", default="dense",
                   choices=["dense", "flash", "ring", "ulysses"],
                   help="encoder self-attention during training: 'flash' "
                        "(O(T)-memory Pallas kernel; combine with --remat "
                        "for conversation-scale batches where dense OOMs) "
                        "or sequence-parallel 'ring'/'ulysses' over a "
                        "--sp_devices mesh")
    p.add_argument("--sp_devices", type=int, default=0,
                   help="devices for the sequence axis when --attn_impl "
                        "is ring/ulysses (a separate ('sequence',) mesh)")
    p.add_argument("--freeze_feature_encoder", action="store_true",
                   help="freeze the conv feature extractor (the HF "
                        "fine-tuning convention for wav2vec2-family "
                        "models; also skips its backward pass entirely)")
    p.add_argument("--no_unroll_layers", action="store_true",
                   help="keep the encoder's compact layer scan instead of "
                        "unrolling it (unrolled is -11%% step time but "
                        "compiles slower; see parallel/train.py)")
    p.add_argument("--rng_impl", default="rbg",
                   choices=["threefry", "rbg", "unsafe_rbg"],
                   help="PRNG for dropout masks: 'rbg' uses the TPU "
                        "hardware RNG (step 90.7 -> ~66 ms at B=16; the "
                        "standard TPU training config); 'threefry' for "
                        "bitwise cross-backend reproducibility")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true", help="tiny config (smoke)")
    p.add_argument("--config_json", default=None,
                   help="JSON file of SpeechT5Config field overrides "
                        "applied on top of the chosen base config (lists "
                        "become tuples) — e.g. a custom conv stack; the "
                        "same file must be passed wherever the "
                        "checkpoint is loaded")
    p.add_argument("--decode_max_len", type=int, default=None,
                   help="eval greedy-decode token budget (default 100 "
                        "per-utterance, max_label_len in conversation "
                        "mode; an explicit value always wins)")
    p.add_argument("--eval_batches", type=int, default=20)
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .common import setup_compilation_cache, setup_rng_impl
    setup_rng_impl(args.rng_impl)  # before any jax.random key exists
    setup_compilation_cache()  # persistent XLA executable cache (docs/BENCH.md)
    import optax

    from ..data.asr_dataset import KaldiAsrDataset
    from ..data.tokenizer import load_tokenizer
    from ..decode.beam import greedy_decode
    from ..models.speecht5 import model as st5
    from ..models.speecht5.config import SpeechT5Config, tiny_config
    from ..parallel import mesh as meshlib, partition, train
    from ..utils.checkpoint import Checkpointer
    from ..utils.metrics import MetricsWriter
    from ..utils.wer import wer
    from . import common

    tokenizer = load_tokenizer(args.tokenizer)
    if args.tokenizer == "char":
        tokenizer.vocab_size = args.vocab_size

    if args.tiny:
        cfg = tiny_config(vocab_size=args.vocab_size, hidden_size=32,
                          encoder_attention_heads=4, decoder_attention_heads=4,
                          encoder_ffn_dim=64, decoder_ffn_dim=64)
    else:
        cfg = SpeechT5Config(vocab_size=args.vocab_size)
    if args.config_json:
        import dataclasses as _dc
        import json as _json
        with open(args.config_json) as f:
            over = _json.load(f)
        cfg = _dc.replace(cfg, **{
            k: tuple(v) if isinstance(v, list) else v
            for k, v in over.items()})

    dims = [int(x) for x in args.mesh.split(",")]
    mesh = meshlib.make_mesh(*dims)
    print(f"mesh: {dict(mesh.shape)}", file=sys.stderr)

    params = common.load_speecht5_params(args.checkpoint, "asr", cfg,
                                         jax.random.PRNGKey(args.seed))
    if args.dtype == "bfloat16":
        from ..utils.pytree import cast_floating
        params = cast_floating(params, jnp.bfloat16)
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
    # donate=True: in-place param/opt-state update (out_shardings pinned
    # = aliasing legal); nan_recovery's rollback restores from the
    # host-side init snapshot, never the donated pre-step buffers
    step_fn = train.make_asr_train_step(
        cfg, mesh, tx, donate=True, remat=args.remat,
        attn_impl=args.attn_impl, ring=ring,
        freeze_feature_encoder=args.freeze_feature_encoder,
        compute_dtype=(jnp.bfloat16 if args.compute_dtype == "bfloat16"
                       else None),
        grad_accum=args.grad_accum,
        unroll_layers=not args.no_unroll_layers)

    ckpt = Checkpointer(os.path.join(args.out_dir, "ckpt"))
    metrics = MetricsWriter(os.path.join(args.out_dir, "metrics.jsonl"))
    start_step = 0
    if args.resume:
        # pass the live state as the restore target so orbax rebuilds the
        # optax NamedTuple structure instead of plain dicts
        target = {"params": jax.device_get(params),
                  "opt_state": jax.device_get(opt_state),
                  "step": np.asarray(0)}
        restored = ckpt.restore(target=target)
        if restored is not None:
            params = partition.shard_params(restored["params"], mesh)
            opt_state = jax.tree_util.tree_map(jnp.asarray, restored["opt_state"])
            start_step = int(restored["step"])
            print(f"resumed at step {start_step}", file=sys.stderr)

    conv = args.conversation_seconds > 0
    if conv:
        from ..data.asr_dataset import ConversationAsrDataset

        # window audio replaces the per-utterance cap; labels scale with
        # the window (~16 tokens/s of speech for the char tokenizer), and
        # so does the eval decode budget (100 tokens would truncate every
        # window hypothesis and inflate deletion WER)
        args.max_seconds = args.conversation_seconds
        if args.max_label_len is None:
            args.max_label_len = max(128, int(16 * args.conversation_seconds))
        if args.decode_max_len is None:
            args.decode_max_len = args.max_label_len
        train_ds = ConversationAsrDataset(
            args.train_dir, window_seconds=args.conversation_seconds)
        dev_ds = (ConversationAsrDataset(
            args.dev_dir, window_seconds=args.conversation_seconds)
            if args.dev_dir else None)
        print(f"conversation windows: {len(train_ds)} "
              f"(<= {args.conversation_seconds:.0f}s each)", file=sys.stderr)
    else:
        if args.max_label_len is None:
            args.max_label_len = 128
        if args.decode_max_len is None:
            args.decode_max_len = 100
        train_ds = KaldiAsrDataset(args.train_dir)
        dev_ds = KaldiAsrDataset(args.dev_dir) if args.dev_dir else None
        print(f"train utts: {len(train_ds)}", file=sys.stderr)

    bos, eos = cfg.bos_token_id, cfg.eos_token_id

    def batch_stream(epoch):
        from ..utils.prefetch import prefetch

        yield from prefetch(train_ds.batches(
            tokenizer, args.batch_size, max_seconds=args.max_seconds,
            max_label_len=args.max_label_len, shuffle=True,
            seed=args.seed + epoch, eos_id=eos), depth=4)

    def run_eval(params, step):
        if dev_ds is None:
            return {}
        from ..ops.act_sharding import activation_mesh
        from ..parallel.mesh import AXES

        # boundary activation-sharding constraints: params are train-mesh
        # sharded, and jitted compositions under free GSPMD propagation
        # are what ops/act_sharding.py guards against (decode included —
        # asr_decode_step pins its own seams under the context)
        axes = (AXES.data, AXES.fsdp)
        # conversation-scale eval cannot run the dense encoder/loss
        # (dense attention OOMs past ~8k frames); any non-dense training
        # impl evals through flash (same numbers, single-chip)
        eval_impl = "dense" if args.attn_impl == "dense" else "flash"

        def _enc(p, w, m):
            with activation_mesh(mesh, batch_axes=axes):
                return st5.encode_speech(p, cfg, w, m, attn_impl=eval_impl)

        def _dec(p, e, m):
            with activation_mesh(mesh, batch_axes=axes):
                return greedy_decode(p, cfg, e, m,
                                     max_len=args.decode_max_len)

        enc_fn = jax.jit(_enc)
        dec_fn = jax.jit(_dec)
        refs, hyps, losses, ntok = [], [], 0.0, 0
        for bi, batch in enumerate(dev_ds.batches(
                tokenizer, args.batch_size, max_seconds=args.max_seconds,
                max_label_len=args.max_label_len, eos_id=eos)):
            if bi >= args.eval_batches:
                break
            loss, aux = st5.asr_loss(
                params, cfg, jnp.asarray(batch["input_values"]),
                jnp.asarray(batch["attention_mask"]),
                jnp.asarray(batch["labels"]), deterministic=True,
                attn_impl=eval_impl)
            losses += float(aux["nll_sum"])
            ntok += int(aux["ntokens"])
            enc, msk = enc_fn(params, jnp.asarray(batch["input_values"]),
                              jnp.asarray(batch["attention_mask"]))
            toks, lens = dec_fn(params, enc, msk)
            toks = np.asarray(toks)
            for text, row, L in zip(batch["texts"], toks, np.asarray(lens)):
                ids = [int(t) for t in row[:L] if int(t) != eos]
                if hasattr(tokenizer, "decode"):
                    hyp = tokenizer.decode(ids) if ids else ""
                else:
                    hyp = " ".join(map(str, ids))
                    text = " ".join(map(str, (tokenizer(text)["input_ids"])))
                refs.append(text)
                hyps.append(hyp)
        dev = {"dev_loss": losses / max(ntok, 1), "dev_wer": wer(refs, hyps)}
        metrics.log(step=step, **dev)
        print(f"step {step}: {dev}", file=sys.stderr)
        return dev

    rng = jax.random.PRNGKey(args.seed)
    step = start_step
    epoch = 0
    t0 = time.perf_counter()
    stream = batch_stream(epoch)
    # data-loss observability: the dataset reports audio samples / label
    # tokens / whole utterances cut by the max_seconds / max_label_len caps
    trunc_totals = {"samples": 0, "label_tokens": 0, "utterances": 0}
    trunc_warned = False
    init_snap = None
    if args.nan_recovery:
        # rollback target when no checkpoint exists yet (a NaN that lands
        # in params before the first save would otherwise survive the
        # rollback — restore returns None)
        init_snap = (jax.device_get(params), jax.device_get(opt_state))
    while step < args.steps:
        try:
            batch = next(stream)
        except StopIteration:
            epoch += 1
            stream = batch_stream(epoch)
            continue
        rng, sub = jax.random.split(rng)
        tr = batch.get("truncation")
        if tr:
            for k in trunc_totals:
                trunc_totals[k] += tr.get(k, 0)
            if any(tr.values()) and not trunc_warned:
                trunc_warned = True
                print(f"WARNING: batch truncated data at the caps "
                      f"(max_seconds={args.max_seconds}, "
                      f"max_label_len={args.max_label_len}): {tr} — "
                      f"running totals are logged as trunc_* in "
                      f"metrics.jsonl", file=sys.stderr)
        if args.nan_inject_step is not None and step + 1 == args.nan_inject_step:
            # fault injection: a genuinely poisoned batch (NaN waveform ->
            # NaN loss/grads) exercising the recovery path end-to-end
            batch = dict(batch)
            batch["input_values"] = np.full_like(
                np.asarray(batch["input_values"], np.float32), np.nan)
            args.nan_inject_step = None
        dev_batch = train.shard_batch(
            {k: jnp.asarray(v) for k, v in batch.items()
             if k in ("input_values", "attention_mask", "labels")}, mesh,
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
        if step % 50 == 0:
            dt = time.perf_counter() - t0
            t0 = time.perf_counter()
            metrics.log(step=step, loss=float(m["loss"]),
                        grad_norm=float(m["grad_norm"]),
                        steps_per_sec=50.0 / dt,
                        trunc_samples=trunc_totals["samples"],
                        trunc_label_tokens=trunc_totals["label_tokens"],
                        trunc_utterances=trunc_totals["utterances"])
            print(f"step {step}: loss {float(m['loss']):.4f} "
                  f"({50.0/dt:.2f} steps/s)", file=sys.stderr)
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
