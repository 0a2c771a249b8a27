"""Extract SpeechT5 encoder embeddings for SLURP — the reference's
extraction CLIs rebuilt TPU-native.

CLI parity (extract_speecht5_{base,finetuned}_embeddings_slurp.py:15-18):
  --modality/-m {text,audio}   --split/-s {train,devel,test,train_synthetic}
plus the knobs the reference hard-codes:
  --version {fine_tuned,base}  (base = fairseq-grafted encoder, ref C4)
  --data_path (ref constant "slurp", :26), --batch_size (ref 2, :67),
  --checkpoint/--out_dir/--format/--dtype.

Hot-loop redesign (SURVEY §3.1): audio decode on host threads feeding
length-bucketed device batches; ONE jit'd encoder program per bucket shape;
embeddings land in packed shards (data/embedding_store.py) instead of one
pickle per utterance.  ``--format pickle`` reproduces the reference layout.
"""

from __future__ import annotations

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor
from typing import List

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Extract embeddings from SLURP data with SpeechT5 (TPU)")
    p.add_argument("--modality", "-m", choices=["text", "audio"], required=True)
    p.add_argument("--split", "-s", required=True,
                   choices=["train", "devel", "test", "train_synthetic"])
    p.add_argument("--version", "-v", choices=["fine_tuned", "base"],
                   default="fine_tuned")
    p.add_argument("--data_path", default="slurp")
    p.add_argument("--out_dir", default=None,
                   help="default: extracted/speecht5[_base]/{split}/{modality}")
    p.add_argument("--checkpoint", default=None,
                   help="HF dir/.safetensors/.bin, fairseq .pt, or our .npz")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--format", choices=["npz", "pickle"], default="npz")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32")
    p.add_argument("--tokenizer", default="char",
                   help="'char' or dir with vocab.json+merges.txt (text modality)")
    p.add_argument("--limit", type=int, default=None, help="cap utterances (smoke)")
    p.add_argument("--data_parallel", type=int, default=1,
                   help="shard extraction batches over this many devices "
                        "(params replicated, batch rows data-sharded)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .common import setup_compilation_cache
    setup_compilation_cache()  # persistent XLA executable cache (docs/BENCH.md)

    from ..data import embedding_store, slurp, tokenizer as tok_lib
    from ..models.speecht5 import model as st5
    from ..models.speecht5.config import SpeechT5Config
    from ..ops import audio
    from ..utils.metrics import Stopwatch
    from . import common

    folder = "extracted/speecht5" if args.version == "fine_tuned" else "extracted/speecht5_base"
    out_dir = args.out_dir or os.path.join(folder, args.split, args.modality)

    ds = slurp.SlurpDataset(args.data_path, mode=args.split, task="intent")
    examples = ds.examples[: args.limit] if args.limit else ds.examples
    print(f"{args.split} set size: {len(examples)}", file=sys.stderr)

    cfg = SpeechT5Config()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    variant = "asr" if args.modality == "audio" else "tts"
    params = common.load_speecht5_params(args.checkpoint, variant, cfg)
    if dtype != jnp.float32:
        from ..utils.pytree import cast_floating
        params = cast_floating(params, dtype)

    if args.modality == "audio":
        fwd = jax.jit(lambda p, w, m: st5.encode_speech(p, cfg, w, m))
    else:
        tok = tok_lib.load_tokenizer(args.tokenizer)
        fwd = jax.jit(lambda p, ids, m: (
            st5.encode_text(p, cfg, ids, m), None))

    place = lambda x, m: (jnp.asarray(x), jnp.asarray(m))
    if args.data_parallel > 1:
        from ..parallel import mesh as meshlib

        dp_mesh = meshlib.make_mesh(data=args.data_parallel)
        batch_sh = meshlib.data_sharding(dp_mesh)
        params = jax.device_put(params, meshlib.replicated(dp_mesh))

        def place(x, m):  # noqa: F811 — pad rows + shard over the mesh;
            # pad rows fall off at the zip over the (unpadded) batch list
            pad = (-x.shape[0]) % args.data_parallel
            if pad:
                x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
                m = np.concatenate([m, np.zeros((pad,) + m.shape[1:], m.dtype)])
            return (jax.device_put(jnp.asarray(x), batch_sh),
                    jax.device_put(jnp.asarray(m), batch_sh))

    writer = embedding_store.EmbeddingShardWriter(out_dir) if args.format == "npz" else None
    pickle_records: List = []

    watch = Stopwatch()
    audio_seconds = 0.0
    pool = ThreadPoolExecutor(max_workers=8)

    def load_batch(batch):
        return list(pool.map(lambda e: audio.load_audio(e.audio_path, 16000)[0], batch))

    n_done = 0
    for batch in slurp.batched(examples, args.batch_size):
        targets = [slurp.onehot_intent(e.label) for e in batch]
        if args.modality == "audio":
            wavs = load_batch(batch)
            audio_seconds += sum(len(w) for w in wavs) / 16000.0
            max_len = common.round_up(max(len(w) for w in wavs), 16000)
            x = np.zeros((len(wavs), max_len), np.float32)
            mask = np.zeros((len(wavs), max_len), np.int32)
            for i, w in enumerate(wavs):
                x[i, :len(w)] = w
                mask[i, :len(w)] = 1
            hidden, fmask = fwd(params, *place(x, mask))
            hidden = np.asarray(hidden, np.float32)
            flens = np.asarray(fmask.sum(-1)) if fmask is not None else \
                np.full(len(wavs), hidden.shape[1])
        else:
            ids_list = [[cfg.bos_token_id] + tok(e.sentence)["input_ids"] + [cfg.eos_token_id]
                        for e in batch]
            if args.tokenizer == "char":
                # the byte fallback can exceed the SpeechT5 text vocab (81);
                # fold into range (smoke mode only — real runs pass a
                # vocab-matched tokenizer)
                ids_list = [[i % cfg.vocab_size for i in ids] for ids in ids_list]
            max_len = common.round_up(max(len(i) for i in ids_list), 8)
            x = np.full((len(ids_list), max_len), cfg.pad_token_id, np.int32)
            mask = np.zeros((len(ids_list), max_len), np.int32)
            for i, ids in enumerate(ids_list):
                x[i, :len(ids)] = ids
                mask[i, :len(ids)] = 1
            hidden, _ = fwd(params, *place(x, mask))
            hidden = np.asarray(hidden, np.float32)
            flens = mask.sum(-1)

        for e, t, L, emb in zip(batch, targets, flens, hidden):
            rec = emb[: int(L)]
            if writer is not None:
                writer.add(e.slurp_id, rec, t)
            else:
                pickle_records.append((e.slurp_id, rec, t))
        n_done += len(batch)
        print(f"\r {n_done}/{len(examples)}", end=" ", file=sys.stderr)
    print(file=sys.stderr)

    if writer is not None:
        writer.close()
    else:
        embedding_store.write_reference_pickles(out_dir, pickle_records)

    from ..utils.metrics import MetricsWriter
    rec = MetricsWriter(os.path.join(out_dir, "metrics.jsonl")).log(
        split=args.split, modality=args.modality, records=n_done,
        wall_seconds=watch.elapsed(),
        audio_seconds=audio_seconds or None,
        rtfx=watch.rtfx(audio_seconds) if audio_seconds else None)
    if args.modality == "audio" and audio_seconds:
        print(f"RTFx: {rec['rtfx']:.1f}", file=sys.stderr)
    print(f"Done! Wrote {n_done} records to {out_dir}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
