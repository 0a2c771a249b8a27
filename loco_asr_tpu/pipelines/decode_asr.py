"""Decode a Kaldi-format test set with beam search + optional LM shallow
fusion, and score WER — the evaluation surface for BASELINE config 4
("SpeechT5 seq2seq ASR with shallow-fusion beam decoding on Fisher").

Artifacts: {out_dir}/hyp.text (Kaldi 'utt_id hypothesis' lines),
{out_dir}/wer.json (corpus WER + sub/ins/del breakdown), metrics.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Beam-decode a Kaldi set + WER (TPU)")
    p.add_argument("--data_dir", required=True, help="Kaldi dir (text+wav.scp)")
    p.add_argument("--out_dir", default="exp/decode")
    p.add_argument("--checkpoint", default=None, help="ASR weights")
    p.add_argument("--tokenizer", default="char")
    p.add_argument("--vocab_size", type=int, default=256)
    p.add_argument("--beam_size", type=int, default=5)
    p.add_argument("--length_penalty", type=float, default=1.0)
    p.add_argument("--max_decode_len", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_seconds", type=float, default=20.0)
    p.add_argument("--lm_checkpoint", default=None, help="fusion LM weights (.npz)")
    p.add_argument("--lm_model", default="tiny",
                   choices=["tiny", "gpt2", "gpt2-medium", "gpt2-large", "gpt2-xl"])
    p.add_argument("--lm_weight", type=float, default=0.3)
    p.add_argument("--tiny", action="store_true", help="tiny ASR config (smoke)")
    p.add_argument("--limit_batches", type=int, default=None)
    p.add_argument("--continuous", action="store_true",
                   help="continuous batching: per-slot admission refills a "
                        "decode slot the moment its stream finishes "
                        "(decode/batcher.py; full greedy/beam x fusion "
                        "matrix; incompatible with --data_parallel)")
    p.add_argument("--conversation", action="store_true",
                   help="with --continuous: slot = conversation stream "
                        "(recording id = uttid.split('-')[0], the "
                        "reference convention); the fusion LM's KV cache "
                        "carries each recording's context across its "
                        "utterances in start-time order (requires an LM; "
                        "BASELINE config 5).  Combines with --beam_size "
                        "> 1: K beams per conversation, the best "
                        "hypothesis' LM state carries forward (BASELINE "
                        "configs 4+5)")
    p.add_argument("--data_parallel", type=int, default=1,
                   help="shard the decode batch over this many devices "
                        "(params replicated; encoder + the whole beam/"
                        "greedy loop run sharded — SURVEY §2.3 DP)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .common import setup_compilation_cache
    setup_compilation_cache()  # persistent XLA executable cache (docs/BENCH.md)

    from ..data.asr_dataset import KaldiAsrDataset
    from ..data.tokenizer import load_tokenizer
    from ..decode.beam import beam_search, greedy_decode
    from ..decode.fusion import FusionLM
    from ..models.gpt2 import model as g
    from ..models.speecht5 import model as st5
    from ..models.speecht5.config import SpeechT5Config, tiny_config
    from ..utils.metrics import MetricsWriter, Stopwatch
    from ..utils.wer import wer_details
    from . import common
    from .eval_ppl import load_gpt2_params

    if args.continuous and args.data_parallel > 1:
        raise SystemExit("--continuous and --data_parallel are mutually "
                         "exclusive (the batcher owns its own device "
                         "scheduling; DP decode uses static batches)")
    if args.conversation and not args.continuous:
        raise SystemExit("--conversation requires --continuous")

    os.makedirs(args.out_dir, exist_ok=True)
    tokenizer = load_tokenizer(args.tokenizer)
    if args.tokenizer == "char":
        tokenizer.vocab_size = args.vocab_size

    if args.tiny:
        cfg = tiny_config(vocab_size=args.vocab_size, apply_spec_augment=False)
    else:
        cfg = SpeechT5Config(vocab_size=args.vocab_size)
    params = common.load_speecht5_params(args.checkpoint, "asr", cfg)

    fusion = None
    if args.lm_checkpoint is not None or args.lm_model != "tiny":
        if args.lm_model == "tiny":
            # mirrors train_lm's tiny config so trained checkpoints load;
            # conversation carry-over needs headroom beyond one utterance
            # (history window = n_positions - decode_reserve)
            n_pos = max(args.max_decode_len + 8, 64)
            if args.conversation:
                n_pos = max(4 * (args.max_decode_len + 8), 128)
            lm_cfg = g.tiny_gpt2_config(
                vocab_size=256, n_embd=32, n_head=4, n_positions=n_pos)
        else:
            lm_cfg = g.PRESETS[args.lm_model]
        lm_params = load_gpt2_params(args.lm_checkpoint, lm_cfg)
        fusion = FusionLM(lm_params, lm_cfg, weight=args.lm_weight)

    ds = KaldiAsrDataset(args.data_dir)
    metrics = MetricsWriter(os.path.join(args.out_dir, "metrics.jsonl"))
    watch = Stopwatch()

    enc_fn = jax.jit(lambda p, w, m: st5.encode_speech(p, cfg, w, m))

    shard_batch = lambda w, m: (w, m)
    if args.data_parallel > 1:
        from ..parallel import mesh as meshlib, train as ptrain

        dp_mesh = meshlib.make_mesh(data=args.data_parallel)
        batch_sh = meshlib.data_sharding(dp_mesh)
        params = jax.device_put(params, meshlib.replicated(dp_mesh))
        if fusion is not None:
            fusion = FusionLM(jax.device_put(fusion.params,
                                             meshlib.replicated(dp_mesh)),
                              fusion.cfg, weight=args.lm_weight)

        def shard_batch(w, m):  # noqa: F811 — pad rows + place on the mesh
            b = ptrain.pad_batch({"w": w, "m": m}, args.data_parallel)
            return (jax.device_put(b["w"], batch_sh),
                    jax.device_put(b["m"], batch_sh))

    def decode_fn(p, enc, mask, lm_params):
        lm = None if fusion is None else FusionLM(lm_params, fusion.cfg,
                                                  weight=args.lm_weight)
        if args.beam_size == 1:
            return greedy_decode(p, cfg, enc, mask,
                                 max_len=args.max_decode_len, fusion=lm)
        hyp = beam_search(p, cfg, enc, mask, beam_size=args.beam_size,
                          max_len=args.max_decode_len,
                          length_penalty=args.length_penalty, fusion=lm)
        return hyp.tokens[:, 0], hyp.lengths[:, 0]

    decode_jit = jax.jit(decode_fn)

    refs: List[str] = []
    hyps: List[str] = []
    hyp_lines: List[str] = []
    audio_seconds = 0.0

    if args.continuous:
        from ..decode.batcher import decode_continuous, decode_continuous_beam

        utts, text_by_id = [], {}
        for bi, batch in enumerate(ds.batches(
                tokenizer, args.batch_size, max_seconds=args.max_seconds,
                eos_id=cfg.eos_token_id)):
            if args.limit_batches is not None and bi >= args.limit_batches:
                break
            for utt_id, text, wav, m in zip(
                    batch["utt_ids"], batch["texts"],
                    batch["input_values"], batch["attention_mask"]):
                n = int(np.asarray(m).sum())
                utts.append((utt_id, np.asarray(wav)[:n]))
                text_by_id[utt_id] = text
        audio_seconds = sum(len(w) for _, w in utts) / 16000.0
        if args.conversation:
            from ..decode.batcher import decode_conversations

            if fusion is None:
                raise SystemExit("--conversation needs a fusion LM "
                                 "(--lm_checkpoint/--lm_model): the "
                                 "carried state IS the LM context")
            # conversation = recording id (uttid.split('-')[0]); utterances
            # in the reference's chronological key order, the full utt id
            # string recid-channel-start-end (lms/src/utils.py:110-112)
            by_rec = {}
            for uid, wav in sorted(utts, key=lambda x: x[0]):
                by_rec.setdefault(uid.split("-")[0], []).append((uid, wav))
            convs = [(rec, [w for _, w in items])
                     for rec, items in by_rec.items()]
            conv_out = decode_conversations(
                params, cfg, convs, fusion=fusion, slots=args.batch_size,
                max_len=args.max_decode_len,
                beam_size=args.beam_size,
                length_penalty=args.length_penalty,
                audio_samples=int(args.max_seconds * 16000),
                encode_fn=enc_fn,
                decode_reserve=args.max_decode_len + 8)
            results = {}
            for rec, items in by_rec.items():
                for (uid, _), res in zip(items, conv_out[rec]):
                    results[uid] = res
        elif args.beam_size > 1:
            results = decode_continuous_beam(
                params, cfg, utts, slots=args.batch_size,
                beam_size=args.beam_size, max_len=args.max_decode_len,
                length_penalty=args.length_penalty,
                audio_samples=int(args.max_seconds * 16000),
                encode_fn=enc_fn, fusion=fusion)
        else:
            results = decode_continuous(
                params, cfg, utts, slots=args.batch_size,
                max_len=args.max_decode_len,
                audio_samples=int(args.max_seconds * 16000),
                encode_fn=enc_fn, fusion=fusion)
        for utt_id, _ in utts:
            toks, L = results[utt_id]
            ids = [int(t) for t in toks[:L] if int(t) != cfg.eos_token_id]
            hyp = (tokenizer.decode(ids)
                   if hasattr(tokenizer, "decode") and ids else "")
            # hyp.text is LINE-based Kaldi format: a raw byte-level decode
            # can contain newlines/control whitespace — normalize (WER is
            # whitespace-tokenized, so scoring is unchanged)
            hyp = " ".join(hyp.split())
            refs.append(text_by_id[utt_id])
            hyps.append(hyp)
            hyp_lines.append(f"{utt_id} {hyp}")
    else:
        for bi, batch in enumerate(ds.batches(tokenizer, args.batch_size,
                                              max_seconds=args.max_seconds,
                                              eos_id=cfg.eos_token_id)):
            if args.limit_batches is not None and bi >= args.limit_batches:
                break
            audio_seconds += float(batch["attention_mask"].sum()) / 16000.0
            wav, msk = shard_batch(jnp.asarray(batch["input_values"]),
                                   jnp.asarray(batch["attention_mask"]))
            enc, mask = enc_fn(params, wav, msk)
            toks, lens = decode_jit(params, enc, mask,
                                    fusion.params if fusion else None)
            # DP pad rows (if any) fall off: zip stops at len(utt_ids)
            toks = np.asarray(toks)
            for utt_id, text, row, L in zip(batch["utt_ids"], batch["texts"],
                                            toks, np.asarray(lens)):
                ids = [int(t) for t in row[:L] if int(t) != cfg.eos_token_id]
                hyp = (tokenizer.decode(ids)
                       if hasattr(tokenizer, "decode") and ids else "")
                hyp = " ".join(hyp.split())   # line-based format, see above
                refs.append(text)
                hyps.append(hyp)
                hyp_lines.append(f"{utt_id} {hyp}")
            print(f"\r decoded {len(refs)} utts", end=" ", file=sys.stderr)
    print(file=sys.stderr)

    details = wer_details(refs, hyps)
    details["rtfx"] = watch.rtfx(audio_seconds)
    with open(os.path.join(args.out_dir, "hyp.text"), "w") as f:
        f.write("\n".join(hyp_lines) + "\n")
    with open(os.path.join(args.out_dir, "wer.json"), "w") as f:
        json.dump(details, f, indent=2)
    metrics.log(**details)
    print(f"WER {details['wer']*100:.2f}% "
          f"(sub {details['sub_rate']*100:.1f} ins {details['ins_rate']*100:.1f} "
          f"del {details['del_rate']*100:.1f}) RTFx {details['rtfx']:.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
