"""Evaluate GPT-2 perplexity on Fisher transcripts — the reference's
lms/src/eval_ppl_with_pretrained_lm.py rebuilt TPU-native.

CLI parity (ref :168-247): --in_file/-i, --out_dir/-o, --bsize, --model
{gpt2,gpt2-medium,gpt2-large,gpt2-xl}, --context_type {indep,max_len},
--verbose/-v, --download_only; extensions: --checkpoint (local weights,
this container is egress-free), --tokenizer, --max_len, --limit_recordings.

Numerics contract:
  indep   : per-utterance token NLLs from shifted logits (ref :78-97)
  max_len : per recording, all T-1 NLLs of the first max_len window, then
            the LAST token's NLL of every stride-1 window (ref :98-144) —
            reproduced exactly, including the window set (so both reference
            quirks, see data/lm_datasets.py, carry over).

TPU redesign of the hot loops: indep mode scores padded length-buckets
with masked NLL (identical numbers, ~1 compile per bucket); max_len mode
streams ALL recordings' windows through one global fixed-shape
[bsize, max_len] batcher (short recordings right-padded — inert under the
causal mask), so the whole pass compiles a single shape and pads only the
final flush, instead of the reference's ragged python-list batches.

Artifacts: rec_id2nlls.pkl + rec_id2ppl.json + timestamped log
(ref :158-162), same aggregate log line (utils.py:230-232).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time
from pathlib import Path
from typing import List

import numpy as np


def parse_arguments(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--in_file", "-in_file", "-i", required=True,
                   help="path to input text file on which PPL shall be computed")
    p.add_argument("--out_dir", "-o", required=True,
                   help="path to out dir where results are stored")
    p.add_argument("--bsize", "--batch_size", "-bsize", "-batch_size",
                   "--sb", "-sb", type=int, default=128, help="max batch size")
    p.add_argument("--model", "-model", "-m", type=str, default="gpt2",
                   choices=["gpt2", "gpt2-medium", "gpt2-large", "gpt2-xl",
                            "tiny"])
    p.add_argument("--context_type", "-context_type", "--ct", "-ct",
                   choices=["indep", "max_len", "streaming"], default="indep",
                   help="indep/max_len = reference semantics; streaming = "
                        "half-overlap strided windows (every token scored "
                        "with >= max_len/2 context at O(T) total compute "
                        "instead of max_len's O(T*max_len))")
    p.add_argument("--checkpoint", default=None,
                   help="local GPT-2 weights (.bin/.safetensors/.npz); "
                        "random init if omitted (smoke mode)")
    p.add_argument("--tokenizer", default="char",
                   help="'char' or dir with vocab.json+merges.txt")
    p.add_argument("--max_len", type=int, default=None,
                   help="context window (default: model n_positions)")
    p.add_argument("--tiny_n_head", type=int, default=4,
                   help="head count for --model tiny (the one tiny "
                        "dimension a checkpoint's shapes can't pin down)")
    p.add_argument("--download_only", action="store_true",
                   help="kept for CLI parity; no-op in the egress-free build")
    p.add_argument("--no_cuda", action="store_true",
                   help="kept for CLI parity; device selection is via JAX")
    p.add_argument("--verbose", "-v", action="store_true")
    p.add_argument("--limit_recordings", type=int, default=None)
    p.add_argument("--data_parallel", type=int, default=1,
                   help="shard window batches over this many devices")
    p.add_argument("--sequence_parallel", type=int, default=1,
                   help="shard each scoring window's SEQUENCE axis over "
                        "this many devices via ring attention — one window "
                        "can exceed a single chip's memory (SURVEY §2.3; "
                        "parallel/ring_attention.py)")
    p.add_argument("--sp_impl", choices=["ring", "ulysses"], default="ring",
                   help="sequence-parallel scheme: 'ring' rotates K/V on "
                        "the ICI ring; 'ulysses' head-scatters via "
                        "all-to-all (needs n_head %% devices == 0)")
    p.add_argument("--compute_dtype", choices=["same", "bfloat16"],
                   default="same",
                   help="OPT-IN speed mode: cast weights/activations to "
                        "bf16 for scoring (logsumexp + NLL still "
                        "accumulate f32 in the chunked lm head). "
                        "Departs the exact reference NLL contract by "
                        "bf16 rounding (measured mean |dNLL| ~1e-3, see "
                        "docs/BENCH.md); keep 'same' for parity runs")
    p.add_argument("--attn_impl", choices=["dense", "flash"], default="dense",
                   help="single-chip attention path for scoring windows: "
                        "'flash' streams causal attention through the "
                        "Pallas kernel — no [B,H,T,T] score tensor, so "
                        "the multi-pass softmax HBM traffic that "
                        "dominates dense scoring at T=1024 disappears "
                        "(same numbers; see test_gpt2_parity)")
    return p.parse_args(argv)


def load_gpt2_params(checkpoint, cfg, rng=None):
    import jax

    from ..models.gpt2 import import_torch, model as g
    from ..utils import checkpoint as ckpt_util

    if checkpoint is None:
        return g.gpt2_init(rng if rng is not None else jax.random.PRNGKey(0), cfg)
    if os.path.isdir(checkpoint):
        if os.path.exists(os.path.join(checkpoint, "status.json")):
            # our training Checkpointer directory (pipelines/train_lm.py)
            state = ckpt_util.Checkpointer(checkpoint).restore()
            return state["params"]
        for name in ("model.safetensors", "pytorch_model.bin"):
            path = os.path.join(checkpoint, name)
            if os.path.exists(path):
                checkpoint = path
                break
    if checkpoint.endswith(".npz"):
        return ckpt_util.load_npz(checkpoint)
    if checkpoint.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return import_torch.load_hf_gpt2(load_file(checkpoint))
    import torch
    return import_torch.load_hf_gpt2(
        torch.load(checkpoint, map_location="cpu", weights_only=False))


def main(argv=None) -> int:
    args = parse_arguments(argv)
    if args.download_only:
        print("download_only is a no-op in the egress-free TPU build",
              file=sys.stderr)
        return 0

    import jax
    import jax.numpy as jnp

    from .common import setup_compilation_cache
    setup_compilation_cache()  # persistent XLA executable cache (docs/BENCH.md)

    from ..data import lm_datasets, tokenizer as tok_lib
    from ..models.gpt2 import model as g
    from ..utils.metrics import create_logger

    os.makedirs(args.out_dir, exist_ok=True)
    path_out_dir = Path(args.out_dir)
    base = os.path.basename(args.in_file).rsplit(".", 1)[0]
    pfx = f"{args.model}_{args.context_type}_{base}"
    logger = create_logger(str(path_out_dir / f"{pfx}.log"), args.verbose)

    tokenizer = tok_lib.load_tokenizer(args.tokenizer)
    if args.model == "tiny":
        vocab = max(256, getattr(tokenizer, "vocab_size", 256))
        # size positions to the requested window so long-context smoke runs
        # are real computations (feeding T > n_positions is an error)
        cfg = g.tiny_gpt2_config(vocab_size=vocab,
                                 n_positions=max(64, args.max_len or 0),
                                 n_embd=32, n_head=args.tiny_n_head)
    else:
        cfg = g.PRESETS[args.model]
    if args.tokenizer == "char" and args.model != "tiny":
        cfg = g.GPT2Config(**{**cfg.__dict__, "vocab_size": 256})
    if args.tokenizer == "char":
        tokenizer.vocab_size = cfg.vocab_size  # keep ids inside the model vocab
    params = load_gpt2_params(args.checkpoint, cfg)
    if args.model == "tiny" and args.checkpoint is not None:
        # follow the checkpoint's actual shapes so `train_lm --model tiny`
        # checkpoints score without a vocab/position mismatch (train_lm
        # pins vocab 256 for the char tokenizer; CharTokenizer's default
        # vocab is 258, and ids past the embedding rows would clamp)
        wte = params["wte"]["weight"]
        wpe = params["wpe"]["weight"]
        cfg = g.GPT2Config(**{**cfg.__dict__,
                              "vocab_size": int(wte.shape[0]),
                              "n_embd": int(wte.shape[1]),
                              "n_positions": int(wpe.shape[0]),
                              "n_layer": len(params["h"])})
        if args.tokenizer == "char":
            tokenizer.vocab_size = cfg.vocab_size
    if args.compute_dtype == "bfloat16":
        from ..utils.pytree import cast_floating
        params = cast_floating(params, jnp.bfloat16)
        logger.info("scoring in bfloat16 (f32 logsumexp/NLL accumulation);"
                    " NLLs differ from the f32 reference contract by bf16"
                    " rounding")
    max_len = args.max_len or cfg.n_positions
    if max_len > cfg.n_positions:
        # reference semantics: the window IS the model context
        # (eval_ppl_with_pretrained_lm.py:71 uses model.config.n_positions)
        logger.warning(f"--max_len {max_len} > n_positions "
                       f"{cfg.n_positions}; clamping")
        max_len = cfg.n_positions

    # score_tokens = chunked lm head: never materializes the [B, T, V]
    # logits (1.6 GB at gpt2/[128,1024]); same numbers as the dense path
    score = jax.jit(lambda p, ids: g.score_tokens(p, cfg, ids,
                                                  attn_impl=args.attn_impl))
    if args.attn_impl != "dense" and args.sequence_parallel > 1:
        raise SystemExit("--attn_impl applies to single-chip scoring; "
                         "--sequence_parallel already picks its own "
                         "kernel via --sp_impl")
    if args.attn_impl != "dense" and args.data_parallel > 1:
        # a pallas_call carries no GSPMD partitioning rule: under a
        # batch-sharded jit the kernel would be replicated (all-gathering
        # the batch onto every device), silently defeating DP
        raise SystemExit("--attn_impl flash with --data_parallel is not "
                         "supported (the Pallas kernel has no GSPMD "
                         "partition rule); use dense for DP scoring")
    if args.sequence_parallel > 1 and args.data_parallel > 1:
        raise SystemExit("--sequence_parallel and --data_parallel are "
                         "mutually exclusive (use a 2-D mesh via train_lm "
                         "for combined DP+SP training)")
    if args.sequence_parallel > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        n_sp = args.sequence_parallel
        if max_len % n_sp:
            # the SP wrapper right-pads every window to a multiple of n_sp;
            # padding past n_positions is an error, so shrink the window to
            # the largest divisible size instead (numerics caveat logged)
            new_len = (max_len // n_sp) * n_sp
            logger.warning(
                f"--max_len {max_len} not divisible by --sequence_parallel "
                f"{n_sp}; using {new_len} (reference used the full "
                f"n_positions window — PPLs differ slightly)")
            max_len = new_len
        devs = jax.devices()
        if len(devs) < n_sp:
            raise SystemExit(f"--sequence_parallel {n_sp} needs {n_sp} "
                             f"devices, have {len(devs)}")
        sp_mesh = Mesh(np.asarray(devs[:n_sp]), ("sequence",))
        seq_sh = NamedSharding(sp_mesh, P(None, "sequence"))
        params = jax.device_put(params, NamedSharding(sp_mesh, P()))
        sp_score = jax.jit(lambda p, ids: g.token_nll(
            g.gpt2_logits(p, cfg, ids, attn_impl=args.sp_impl,
                          ring=(sp_mesh, "sequence"))[0], ids))

        def score(p, ids):  # noqa: F811 — SP wrapper over the jit'd scorer
            ids = np.asarray(ids)
            b, t = ids.shape
            pad = (-t) % n_sp
            if t + pad > cfg.n_positions:
                raise SystemExit(
                    f"sequence of {t} tokens pads to {t + pad} under "
                    f"--sequence_parallel {n_sp}, past n_positions "
                    f"{cfg.n_positions}; use a max_len divisible by "
                    f"{n_sp} or fewer devices")
            if pad:  # causal => trailing pad tokens are inert for real NLLs
                ids = np.concatenate([ids, np.tile(ids[:, -1:], (1, pad))], 1)
            out = sp_score(p, jax.device_put(jnp.asarray(ids), seq_sh))
            return out[:, : t - 1]

    if args.data_parallel > 1:
        from ..parallel import mesh as meshlib, train as ptrain

        mesh = meshlib.make_mesh(data=args.data_parallel)
        batch_sh = meshlib.data_sharding(mesh)
        rep = meshlib.replicated(mesh)
        params = jax.device_put(params, rep)
        base_score = score

        def score(p, ids):  # noqa: F811 — DP wrapper over the jit'd scorer
            ids = ptrain.pad_batch({"ids": ids}, args.data_parallel)["ids"]
            out = base_score(p, jax.device_put(ids, batch_sh))
            return out

    nlls: List[List[float]] = []
    stime = time.time()

    if args.context_type == "indep":
        dataset = lm_datasets.IndepTextDataset(args.in_file, tokenizer,
                                               batch_size=args.bsize)
        if args.limit_recordings:
            # keep utterances of the first N distinct recordings in FILE
            # order (recid = uttid.split('-')[0], the reference
            # aggregation key) — dataset.utt_ids is length-sorted, so the
            # file is the order oracle, same as the other context types
            seen: List[str] = []
            for u in lm_datasets.load_key_text(args.in_file):
                r = u.split("-")[0]
                if r not in seen:
                    seen.append(r)
            allow = set(seen[: args.limit_recordings])
            keep = [i for i, u in enumerate(dataset.utt_ids)
                    if u.split("-")[0] in allow]
            dataset.text_ids = [dataset.text_ids[i] for i in keep]
            dataset.utt_ids = [dataset.utt_ids[i] for i in keep]
            dataset.lengths = dataset.lengths[keep]
            dataset.bins, dataset.counts = np.unique(dataset.lengths,
                                                     return_counts=True)
        ids_order = dataset.utt_ids
        for ids, lens, _ in dataset.padded_batches(args.bsize):
            batch_nll = np.asarray(score(params, jnp.asarray(ids)))
            for row, L in zip(batch_nll, lens):
                nlls.append(row[: L - 1].tolist())
    elif args.context_type == "max_len":
        dataset = lm_datasets.MaxLenTextDataset(args.in_file, tokenizer,
                                                max_len=max_len,
                                                batch_size=args.bsize)
        ids_order = []
        recs = list(dataset.rec_id2tokens.items())
        if args.limit_recordings:
            recs = recs[: args.limit_recordings]
        # One global fixed-shape [bsize, max_len] window stream ACROSS
        # recordings: every work item is one row (short recordings
        # right-padded — under the causal mask the kept prefix's NLLs are
        # unaffected by pad tokens to its right), so the whole pass
        # compiles ONE shape and pads only the final flush instead of
        # every recording's batch remainder.  Same windows, same numbers
        # as the reference loop (eval_ppl_with_pretrained_lm.py:98-144).
        bsize = args.bsize
        buf = np.zeros((bsize, max_len), np.int32)
        pending: List[tuple] = []   # ("full", L) keeps row[:L-1]; ("last", _) keeps row[-1]

        def flush():
            if not pending:
                return
            n = len(pending)
            if n < bsize:
                buf[n:] = buf[n - 1]     # repeat-pad the final partial flush
            out = np.asarray(score(params, jnp.asarray(buf)))
            for (kind, L), row in zip(pending, out):
                nlls.append(row[: L - 1].tolist() if kind == "full"
                            else [float(row[-1])])
            pending.clear()

        def enqueue(row: np.ndarray, kind: str, L: int, rec_id: str):
            buf[len(pending), : len(row)] = row
            buf[len(pending), len(row):] = row[-1]   # inert right-pad
            pending.append((kind, L))
            ids_order.append(rec_id)
            if len(pending) == bsize:
                flush()

        for r, (rec_id, tokens) in enumerate(recs):
            print(f"\r recording {r+1}/{len(recs)} ({len(tokens)} tokens)",
                  end=" ", file=sys.stderr)
            T = len(tokens)
            if T < max_len:
                enqueue(np.asarray(tokens, np.int32), "full", T, rec_id)
                continue
            windows = dataset.recording_windows(tokens)
            if len(windows) == 0:
                continue  # reference quirk: T == max_len yields nothing
            enqueue(windows[0], "full", max_len, rec_id)
            for w in windows[1:]:
                enqueue(w, "last", max_len, rec_id)
        flush()
        print(file=sys.stderr)
    elif args.context_type == "streaming":
        dataset = lm_datasets.MaxLenTextDataset(args.in_file, tokenizer,
                                                max_len=max_len,
                                                batch_size=args.bsize)
        ids_order = []
        if max_len < 2:
            raise ValueError("--context_type streaming needs --max_len >= 2 "
                             "(stride = max_len // 2 would be zero)")
        stride = max_len // 2
        recs = list(dataset.rec_id2tokens.items())
        if args.limit_recordings:
            recs = recs[: args.limit_recordings]
        # short recordings (T <= max_len) are right-padded to max_len and
        # scored in fixed-shape [bsize, max_len] batches: one compiled
        # program for the whole pass instead of one remote compile per
        # distinct recording length (pads sit right of every kept token,
        # inert under the causal mask — same argument as max_len mode)
        shorts: List[tuple] = []
        for r, (rec_id, tokens) in enumerate(recs):
            print(f"\r recording {r+1}/{len(recs)} ({len(tokens)} tokens)",
                  end=" ", file=sys.stderr)
            T = len(tokens)
            arr = np.asarray(tokens, np.int32)
            if T <= max_len:
                shorts.append((rec_id, arr))
                continue
            # half-overlap windows at offsets 0, stride, 2*stride, ...
            offsets = list(range(0, T - max_len, stride)) + [T - max_len]
            wins = np.stack([arr[o:o + max_len] for o in offsets])
            rec_nlls: List[float] = []
            prev_end = 0
            for i in range(0, len(wins), args.bsize):
                chunk = wins[i:i + args.bsize]
                n = len(chunk)
                if n < args.bsize:
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[-1:], args.bsize - n, 0)], 0)
                out = np.asarray(score(params, jnp.asarray(chunk)))[:n]
                for w, row in zip(range(i, i + n), out):
                    o = offsets[w]
                    # row[j] = NLL of token o+j+1; keep tokens not yet scored
                    start_tok = max(o + 1, prev_end)
                    rec_nlls.extend(row[start_tok - o - 1: max_len - 1].tolist())
                    prev_end = o + max_len
            nlls.append(rec_nlls)
            ids_order.append(rec_id)
        for i in range(0, len(shorts), args.bsize):
            group = shorts[i:i + args.bsize]
            batch = np.zeros((args.bsize, max_len), np.int32)
            for j, (_, arr) in enumerate(group):
                batch[j, : len(arr)] = arr
            out = np.asarray(score(params, jnp.asarray(batch)))
            for (rec_id, arr), row in zip(group, out):
                nlls.append(row[: len(arr) - 1].tolist())
                ids_order.append(rec_id)
        print(file=sys.stderr)
    else:
        raise ValueError(args.context_type)

    assert len(nlls) == len(ids_order), f"nlls {len(nlls)} != ids {len(ids_order)}"
    rec_id2nlls, rec_id2ppl = lm_datasets.compute_ppl_per_recording(nlls, ids_order)
    ppls = list(rec_id2ppl.values())
    logger.info(
        f"Avg. PPL of recordings: {np.mean(ppls):.2f} std.dev: {np.std(ppls):.2f} "
        f"min PPL: {np.min(ppls):.2f} max PPL: {np.max(ppls):.2f}")

    with open(path_out_dir / "rec_id2nlls.pkl", "wb") as f:
        pickle.dump(rec_id2nlls, f)
    with open(path_out_dir / "rec_id2ppl.json", "w", encoding="utf-8") as f:
        json.dump(rec_id2ppl, f, indent=2, ensure_ascii=False)
    logger.info(f"Saved in {args.out_dir} Time taken {time.time() - stime:.2f} sec")
    return 0


if __name__ == "__main__":
    sys.exit(main())
