"""Transcribe long-form episodes (podcast manifests) with conversation
carry-over — the CLI surface for BASELINE config 5.

Input: an episode manifest (data/podcasts.py jsonl).  Per episode, audio
is decoded, segmented (manifest timestamps or the energy endpointer), and
transcribed utterance-by-utterance with greedy decoding; with an LM
(--lm_checkpoint) the fusion scorer's KV cache carries the conversation
context across utterances.

Output: {out_dir}/{episode_id}.jsonl with one segment per line
({start, end, text, token_ids}) and metrics.jsonl with RTFx per episode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Transcribe long audio episodes (TPU)")
    p.add_argument("--manifest", required=True)
    p.add_argument("--out_dir", default="exp/episodes")
    p.add_argument("--checkpoint", default=None, help="ASR weights")
    p.add_argument("--tokenizer", default="char")
    p.add_argument("--vocab_size", type=int, default=256)
    p.add_argument("--lm_checkpoint", default=None)
    p.add_argument("--lm_model", default="tiny",
                   choices=["tiny", "gpt2", "gpt2-medium", "gpt2-large", "gpt2-xl"])
    p.add_argument("--lm_weight", type=float, default=0.3)
    p.add_argument("--max_decode_len", type=int, default=200)
    p.add_argument("--beam_size", type=int, default=1,
                   help="beams per stream in --continuous mode (with an "
                        "LM: beam + conversation carry-over per episode, "
                        "BASELINE configs 4+5)")
    p.add_argument("--length_penalty", type=float, default=1.0)
    p.add_argument("--batch_seconds", type=float, default=20.0)
    p.add_argument("--attn_impl", choices=["dense", "flash"], default="dense",
                   help="'flash' = banded rel-pos Pallas kernel; lets "
                        "--batch_seconds reach the minutes range (dense "
                        "OOMs past ~2.7 min of frames)")
    p.add_argument("--tiny", action="store_true", help="tiny ASR config (smoke)")
    p.add_argument("--limit_episodes", type=int, default=None)
    p.add_argument("--continuous", action="store_true",
                   help="decode ALL episodes concurrently with the "
                        "continuous batcher: slot = episode stream; with "
                        "an LM, per-slot conversation carry-over "
                        "(decode/batcher.decode_conversations)")
    p.add_argument("--slots", type=int, default=4,
                   help="concurrent episode slots for --continuous")
    p.add_argument("--chunk_steps", type=int, default=16,
                   help="decode steps per host round-trip (--continuous)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    from .common import setup_compilation_cache
    setup_compilation_cache()  # persistent XLA executable cache (docs/BENCH.md)

    from ..data import podcasts
    from ..data.tokenizer import load_tokenizer
    from ..decode.fusion import FusionLM
    from ..decode.long_audio import transcribe_long_audio
    from ..models.gpt2 import model as g
    from ..models.speecht5.config import SpeechT5Config, tiny_config
    from ..ops.audio import load_audio
    from ..utils.metrics import MetricsWriter, Stopwatch
    from . import common
    from .eval_ppl import load_gpt2_params

    os.makedirs(args.out_dir, exist_ok=True)
    tokenizer = load_tokenizer(args.tokenizer)
    if args.tokenizer == "char":
        tokenizer.vocab_size = args.vocab_size

    cfg = (tiny_config(vocab_size=args.vocab_size, apply_spec_augment=False)
           if args.tiny else SpeechT5Config(vocab_size=args.vocab_size))
    params = common.load_speecht5_params(args.checkpoint, "asr", cfg)

    fusion = None
    if args.lm_checkpoint is not None or args.lm_model != "tiny":
        if args.lm_model == "tiny":
            lm_cfg = g.tiny_gpt2_config(vocab_size=256, n_embd=32, n_head=4,
                                        n_positions=512)
        else:
            lm_cfg = g.PRESETS[args.lm_model]
        fusion = FusionLM(load_gpt2_params(args.lm_checkpoint, lm_cfg),
                          lm_cfg, weight=args.lm_weight)

    episodes = podcasts.load_manifest(args.manifest)
    if args.limit_episodes:
        episodes = episodes[: args.limit_episodes]
    metrics = MetricsWriter(os.path.join(args.out_dir, "metrics.jsonl"))

    if args.continuous:
        return _run_continuous(args, cfg, params, fusion, tokenizer,
                               episodes, metrics)

    for ep in episodes:
        watch = Stopwatch()
        wav, sr = load_audio(ep.audio_path, 16000)
        segments = ([(s.start, s.end) for s in ep.segments]
                    if ep.segments else None)
        out = transcribe_long_audio(
            params, cfg, wav, sr, segments=segments, fusion=fusion,
            max_decode_len=args.max_decode_len,
            batch_seconds=args.batch_seconds, tokenizer=tokenizer,
            attn_impl=args.attn_impl)
        path = os.path.join(args.out_dir, f"{ep.episode_id}.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            for seg in out:
                f.write(json.dumps({"start": seg.start, "end": seg.end,
                                    "text": seg.text,
                                    "token_ids": seg.token_ids}) + "\n")
        rtfx = watch.rtfx(len(wav) / sr)
        metrics.log(episode=ep.episode_id, segments=len(out), rtfx=rtfx)
        print(f"{ep.episode_id}: {len(out)} segments, RTFx {rtfx:.1f}",
              file=sys.stderr)
    return 0


def _run_continuous(args, cfg, params, fusion, tokenizer, episodes,
                    metrics) -> int:
    """Batched multi-episode decoding: every episode is a conversation
    stream in the continuous batcher; interleaved across slots, so slots
    freed by short episodes immediately serve the next one.  With an LM,
    each slot's fusion KV carries that episode's context across segments
    (decode_conversations); without one, segments decode independently
    (decode_continuous).  Per-episode WER is scored against manifest
    segment texts when present."""
    import numpy as np

    from ..data.podcasts import segment_by_energy
    from ..decode.batcher import (decode_continuous, decode_continuous_beam,
                                  decode_conversations)
    from ..ops.audio import load_audio
    from ..utils.metrics import Stopwatch
    from ..utils.wer import wer

    sr = 16000
    bucket = int(args.batch_seconds * sr)
    convs, spans, refs, audio_seconds = [], {}, {}, 0.0
    for ep in episodes:
        wav, wsr = load_audio(ep.audio_path, sr)
        audio_seconds += len(wav) / sr
        if ep.segments:
            segs = [(s.start, s.end, s.text) for s in ep.segments]
        else:
            segs = [(a, b, None) for a, b in
                    segment_by_energy(wav, sr,
                                      max_segment_s=args.batch_seconds)]
        chunks = []
        kept = []
        texts = []
        # filter refs together with the chunks: a dropped empty segment
        # must also drop its reference text, or every later hypothesis is
        # scored against the wrong line and the WER silently inflates
        for start, end, text in segs:
            chunk = wav[int(start * sr): int(end * sr)][:bucket]
            if len(chunk) == 0:
                continue
            chunks.append(chunk.astype(np.float32))
            kept.append((start, end))
            texts.append(text)
        convs.append((ep.episode_id, chunks))
        spans[ep.episode_id] = kept
        refs[ep.episode_id] = (texts if ep.segments
                               and any(t for t in texts) else None)

    watch = Stopwatch()
    if fusion is not None:
        results = decode_conversations(
            params, cfg, convs, fusion=fusion, slots=args.slots,
            chunk_steps=args.chunk_steps, max_len=args.max_decode_len,
            beam_size=args.beam_size, length_penalty=args.length_penalty,
            audio_samples=bucket,
            decode_reserve=args.max_decode_len + 8)  # = transcribe_long_audio
    else:
        utts = [(f"{cid}::{i}", w) for cid, chunks in convs
                for i, w in enumerate(chunks)]
        if args.beam_size > 1:
            flat = decode_continuous_beam(
                params, cfg, utts, slots=args.slots,
                beam_size=args.beam_size,
                length_penalty=args.length_penalty,
                chunk_steps=args.chunk_steps, max_len=args.max_decode_len,
                audio_samples=bucket)
        else:
            flat = decode_continuous(
                params, cfg, utts, slots=args.slots,
                chunk_steps=args.chunk_steps, max_len=args.max_decode_len,
                audio_samples=bucket)
        results = {}
        for cid, chunks in convs:
            results[cid] = [flat[f"{cid}::{i}"] for i in range(len(chunks))]

    corpus_rtfx = watch.rtfx(audio_seconds)
    for cid, _ in convs:
        hyps = []
        path = os.path.join(args.out_dir, f"{cid}.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            for (toks, length), (start, end) in zip(results[cid],
                                                    spans[cid]):
                ids = [int(t) for t in toks[:length]
                       if int(t) != cfg.eos_token_id]
                text = (tokenizer.decode(ids)
                        if tokenizer is not None and ids else "")
                hyps.append(text)
                f.write(json.dumps({"start": start, "end": end,
                                    "text": text,
                                    "token_ids": ids}) + "\n")
        row = {"episode": cid, "segments": len(hyps),
               "corpus_rtfx": corpus_rtfx}
        if refs[cid] is not None:
            row["wer"] = wer(refs[cid][:len(hyps)], hyps)
        metrics.log(**row)
        print(f"{cid}: {len(hyps)} segments"
              + (f", WER {row['wer']*100:.2f}%" if "wer" in row else "")
              + f" (corpus RTFx {corpus_rtfx:.1f})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
