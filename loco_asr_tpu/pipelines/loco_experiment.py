"""Run the LoCo context-gain experiment end-to-end — executable proof of
the hypothesis the framework exists for.

The reference's core experiment is the indep-vs-max_len PPL comparison
(eval_ppl_with_pretrained_lm.py:67-73; the max_len machinery at :98-144
has no other purpose): conversation-level context should make language
modeling — and, by extension, ASR — better.  The real Fisher corpus
cannot ship in this egress-free container, so this pipeline builds a
synthetic conversation corpus where cross-utterance dependence is true by
construction (data/synthetic_conversations.py: a per-conversation NAME,
unpredictable within an utterance, a pure copy given history; dev names
disjoint from train) and runs the experiment with the REAL pipelines:

LM half:   make_lm_corpus -> train_lm (tiny GPT-2 on conversation
           streams) -> eval_ppl --context_type {indep,max_len,streaming}
           on held-out conversations -> PPL(max_len) < PPL(indep).
ASR half:  make_asr_corpus (clean first mention, acoustically-degraded
           repeats) -> train_asr --tiny -> train_lm on the transcripts ->
           decode the dev conversations twice with the SAME fusion LM:
           decode_conversations (carry-over) vs decode_continuous
           (context reset per utterance) -> WER(carry) < WER(no-carry),
           concentrated on the degraded utterances.

Results land in {out_dir}/results.json; docs/LOCO_EXPERIMENT.md records a
measured run.  tests/test_loco_experiment.py pins a tiny-scale version.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
from typing import Dict, List, Tuple

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="LoCo context-gain experiment (synthetic conversations)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--stage", choices=["all", "lm", "asr"], default="all")
    p.add_argument("--seed", type=int, default=0)
    # LM half
    p.add_argument("--lm_convs", type=int, default=600)
    p.add_argument("--lm_dev_convs", type=int, default=40)
    p.add_argument("--lm_utts", type=int, default=16)
    p.add_argument("--lm_steps", type=int, default=4000)
    p.add_argument("--lm_batch", type=int, default=16)
    p.add_argument("--lm_n_embd", type=int, default=128,
                   help="tiny-LM hidden size (train_lm --tiny_n_embd): "
                        "32-dim barely learns the induction copy the "
                        "corpus is built around (0.047 nats gain), "
                        "64-dim gets the LM-stage gain to 0.371, and the "
                        "fusion LM needs 128-dim for a ~sharp copy "
                        "(name-char accuracy 42% -> 100% teacher-forced)")
    p.add_argument("--lm_n_layer", type=int, default=4)
    p.add_argument("--seq_len", type=int, default=256,
                   help="LM train seq len = eval context window")
    # ASR half
    p.add_argument("--asr_convs", type=int, default=200,
                   help="training conversations; the fusion LM's "
                        "induction strength tracks corpus size (48 "
                        "convs measured a 1.14x context ratio, too weak "
                        "to tip decoding)")
    p.add_argument("--asr_dev_convs", type=int, default=12)
    p.add_argument("--asr_utts", type=int, default=10)
    p.add_argument("--asr_lm_convs", type=int, default=2000,
                   help="TEXT-ONLY conversations for the fusion LM "
                        "(text is free; 200 audio conversations measured "
                        "too few for the LM to form the induction copy — "
                        "name-char accuracy 44%%)")
    p.add_argument("--asr_steps", type=int, default=4000)
    p.add_argument("--asr_batch", type=int, default=8)
    p.add_argument("--asr_lr", type=float, default=1e-3,
                   help="tiny-ASR learning rate (3e-4 stalls at ~1.7 "
                        "nats on the tone task; 1e-3 reaches the "
                        "degraded-name entropy floor ~0.3)")
    p.add_argument("--asr_lm_steps", type=int, default=8000)
    p.add_argument("--asr_lm_seq_len", type=int, default=256)
    p.add_argument("--fusion_weight", type=float, default=0.4)
    p.add_argument("--fusion_weights", default=None,
                   help="comma list: decode the dev set at EACH weight "
                        "and report all (one training, many decodes)")
    p.add_argument("--skip_training", action="store_true",
                   help="reuse existing asr/asr_lm checkpoints under "
                        "out_dir (decode-only reruns, e.g. a fusion-"
                        "weight sweep)")
    p.add_argument("--decode_max_len", type=int, default=40)
    p.add_argument("--rng_impl", default=None,
                   choices=[None, "threefry", "rbg", "unsafe_rbg"],
                   help="forwarded to the trainers (default: their own)")
    return p.parse_args(argv)


def _mean_nll(out_dir: str) -> Tuple[float, float]:
    """(overall token-mean NLL, avg per-recording PPL) from eval_ppl
    artifacts."""
    with open(os.path.join(out_dir, "rec_id2nlls.pkl"), "rb") as f:
        rec_id2nlls = pickle.load(f)
    flat = [x for nlls in rec_id2nlls.values() for utt in nlls for x in
            (utt if isinstance(utt, list) else [utt])]
    with open(os.path.join(out_dir, "rec_id2ppl.json")) as f:
        rec_id2ppl = json.load(f)
    return float(np.mean(flat)), float(np.mean(list(rec_id2ppl.values())))


def run_lm_stage(args) -> Dict:
    from ..data.synthetic_conversations import make_lm_corpus
    from . import eval_ppl, train_lm

    corpus = os.path.join(args.out_dir, "lm_corpus")
    train_txt, dev_txt = make_lm_corpus(
        corpus, n_train=args.lm_convs, n_dev=args.lm_dev_convs,
        n_utts=args.lm_utts, seed=args.seed)
    lm_dir = os.path.join(args.out_dir, "lm")
    train_argv = [
        "--train_file", train_txt, "--dev_file", dev_txt,
        "--model", "tiny", "--tokenizer", "char",
        "--seq_len", str(args.seq_len), "--batch_size", str(args.lm_batch),
        "--steps", str(args.lm_steps), "--out_dir", lm_dir,
        "--eval_every", str(max(args.lm_steps // 2, 1)),
        "--save_every", str(args.lm_steps),
        "--tiny_n_embd", str(args.lm_n_embd),
        "--tiny_n_layer", str(args.lm_n_layer),
        "--log_every", "100", "--seed", str(args.seed)]
    if args.rng_impl:
        train_argv += ["--rng_impl", args.rng_impl]
    rc = train_lm.main(train_argv)
    assert rc == 0, "train_lm failed"

    results: Dict = {}
    for ctx in ("indep", "max_len", "streaming"):
        out = os.path.join(args.out_dir, f"ppl_{ctx}")
        rc = eval_ppl.main([
            "--in_file", dev_txt, "--out_dir", out,
            "--model", "tiny", "--tokenizer", "char",
            "--checkpoint", os.path.join(lm_dir, "ckpt"),
            "--context_type", ctx, "--max_len", str(args.seq_len),
            "--bsize", "32"])
        assert rc == 0, f"eval_ppl {ctx} failed"
        nll, rec_ppl = _mean_nll(out)
        results[f"nll_{ctx}"] = nll
        results[f"ppl_{ctx}"] = float(np.exp(nll))
        results[f"avg_rec_ppl_{ctx}"] = rec_ppl
    results["context_gain_nats"] = results["nll_indep"] - results["nll_max_len"]
    results["ppl_ratio_indep_over_max_len"] = (
        results["ppl_indep"] / results["ppl_max_len"])
    print(f"LM: PPL indep {results['ppl_indep']:.2f} vs max_len "
          f"{results['ppl_max_len']:.2f} vs streaming "
          f"{results['ppl_streaming']:.2f} "
          f"(context gain {results['context_gain_nats']:.3f} nats/token)",
          file=sys.stderr)
    return results


def _hyp_text(tokenizer, row: np.ndarray, length: int, eos: int) -> str:
    ids = [int(t) for t in np.asarray(row)[:int(length)] if int(t) != eos]
    return " ".join(tokenizer.decode(ids).split())


def _conv_name(texts: List[str]) -> str:
    """The conversation's name = the word over ASR_NAME_CHARS (present in
    every utterance by construction)."""
    from ..data.synthetic_conversations import ASR_NAME_CHARS

    for text in texts:
        for w in text.split():
            if all(c in ASR_NAME_CHARS for c in w):
                return w
    return ""


def run_asr_stage(args) -> Dict:
    import jax

    from ..data.asr_dataset import KaldiAsrDataset, _utt_time_key
    from ..data.synthetic_conversations import make_asr_corpus
    from ..data.tokenizer import load_tokenizer
    from ..decode.batcher import decode_continuous, decode_conversations
    from ..decode.fusion import FusionLM
    from ..models.gpt2 import model as g
    from ..models.speecht5.config import tiny_config
    from ..utils.checkpoint import Checkpointer
    from ..utils.wer import wer
    from . import train_asr, train_lm

    corpus = os.path.join(args.out_dir, "asr_corpus")
    tr_dir, dev_dir = make_asr_corpus(
        corpus, n_train=args.asr_convs, n_dev=args.asr_dev_convs,
        n_utts=args.asr_utts, seed=args.seed)

    # the bare tiny conv stack (2 layers, 16 ch, ~20-sample receptive
    # field) cannot separate the chord tones — frames carry too little
    # spectral resolution and the model falls back on the decoder's
    # filler lexicon (measured: clean names undecodable).  This override
    # deepens the front-end (3 layers, 64 ch, 105-sample receptive field
    # = ~150 Hz resolution at a 400 Hz frame rate) while the transformer
    # stays tiny; train_asr --config_json applies it, and the decode
    # side below reconstructs the identical config.
    conv_over = {"conv_dim": [64, 64, 64], "conv_stride": [5, 4, 2],
                 "conv_kernel": [10, 8, 4], "max_speech_positions": 2048}
    cfg_path = os.path.join(args.out_dir, "asr_config.json")
    with open(cfg_path, "w") as f:
        json.dump(conv_over, f)

    asr_dir = os.path.join(args.out_dir, "asr")
    asr_argv = [
        "--config_json", cfg_path,
        "--train_dir", tr_dir, "--tiny", "--tokenizer", "char",
        "--batch_size", str(args.asr_batch), "--steps", str(args.asr_steps),
        "--out_dir", asr_dir, "--max_seconds", "4.0",
        "--eval_every", str(10 * args.asr_steps),
        "--save_every", str(args.asr_steps), "--lr", str(args.asr_lr),
        "--seed", str(args.seed)]
    if args.rng_impl:
        asr_argv += ["--rng_impl", args.rng_impl]
    if args.skip_training and os.path.exists(os.path.join(asr_dir, "ckpt")):
        print("skip_training: reusing", asr_dir, file=sys.stderr)
    else:
        rc = train_asr.main(asr_argv)
        assert rc == 0, "train_asr failed"

    # fusion LM trains on a LARGE text-only corpus from the same
    # distribution (see make_asr_lm_text) — dev names excluded so the
    # carry-over gain can only be in-context copying
    from ..data.synthetic_conversations import (ASR_NAME_CHARS,
                                                make_asr_lm_text)
    dev_names = set()
    with open(os.path.join(dev_dir, "text")) as f:
        for line in f:
            for w in line.split()[1:]:
                if all(c in ASR_NAME_CHARS for c in w):
                    dev_names.add(w)
    lm_text = make_asr_lm_text(
        os.path.join(corpus, "lm_text.txt"), n_convs=args.asr_lm_convs,
        n_utts=args.asr_utts, seed=args.seed, exclude=sorted(dev_names))

    lm_dir = os.path.join(args.out_dir, "asr_lm")
    lm_argv = [
        "--train_file", lm_text,
        "--model", "tiny", "--tokenizer", "char",
        "--seq_len", str(args.asr_lm_seq_len),
        "--batch_size", "16", "--steps", str(args.asr_lm_steps),
        "--out_dir", lm_dir, "--eval_every", str(10 * args.asr_lm_steps),
        "--save_every", str(args.asr_lm_steps), "--log_every", "100",
        "--tiny_n_embd", str(args.lm_n_embd),
        "--tiny_n_layer", str(args.lm_n_layer),
        # the fusion LM's stream separator MUST be the ASR decoder's
        # eos/start token (2): at decode time the LM sees utterances
        # delimited by exactly that id; training it on the char
        # tokenizer's default eos (1) measurably destroyed the
        # cross-utterance copy (name-char accuracy 42% despite perfect
        # teacher-forced induction with matched separators)
        "--eos_id", str(2),
        "--seed", str(args.seed)]
    if args.rng_impl:
        lm_argv += ["--rng_impl", args.rng_impl]
    if args.skip_training and os.path.exists(os.path.join(lm_dir, "ckpt")):
        print("skip_training: reusing", lm_dir, file=sys.stderr)
    else:
        rc = train_lm.main(lm_argv)
        assert rc == 0, "train_lm (fusion LM) failed"

    # trained weights + the EXACT training-time configs (train_asr --tiny
    # + --config_json / train_lm --model tiny shapes)
    import dataclasses
    cfg = tiny_config(vocab_size=256, hidden_size=32,
                      encoder_attention_heads=4, decoder_attention_heads=4,
                      encoder_ffn_dim=64, decoder_ffn_dim=64)
    cfg = dataclasses.replace(cfg, **{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in conv_over.items()})
    asr_params = Checkpointer(os.path.join(asr_dir, "ckpt")).restore()["params"]
    lm_cfg = g.tiny_gpt2_config(vocab_size=256,
                                n_positions=max(args.asr_lm_seq_len, 64),
                                n_embd=args.lm_n_embd,
                                n_layer=args.lm_n_layer, n_head=4)
    lm_params = Checkpointer(os.path.join(lm_dir, "ckpt")).restore()["params"]

    tokenizer = load_tokenizer("char")
    tokenizer.vocab_size = 256
    eos = cfg.eos_token_id

    # dev conversations in chronological utterance order
    dev = KaldiAsrDataset(dev_dir)
    groups: Dict[str, List] = {}
    for ex in dev.examples:
        groups.setdefault(ex.reco_id, []).append(ex)
    convs, refs_by_utt = [], {}
    for reco in groups:
        exs = sorted(groups[reco],
                     key=lambda e: _utt_time_key(e.utt_id, e.start, e.end))
        convs.append((reco, [dev.load_waveform(e) for e in exs]))
        for u, e in enumerate(exs):
            refs_by_utt[e.utt_id] = (reco, u, e.text)
    bucket = max(len(w) for _, wavs in convs for w in wavs)
    flat_utts = []
    utt_order: Dict[str, List[str]] = {}
    for reco in groups:
        exs = sorted(groups[reco],
                     key=lambda e: _utt_time_key(e.utt_id, e.start, e.end))
        utt_order[reco] = [e.utt_id for e in exs]
        for e in exs:
            flat_utts.append((e.utt_id, dev.load_waveform(e)))

    def decode_at(weight):
        fusion = FusionLM(lm_params, lm_cfg, weight=weight)
        carry = decode_conversations(
            asr_params, cfg, convs, fusion=fusion, slots=4,
            chunk_steps=16, max_len=args.decode_max_len,
            audio_samples=bucket, max_positions=lm_cfg.n_positions,
            decode_reserve=args.decode_max_len + 8)
        nocarry = decode_continuous(
            asr_params, cfg, flat_utts, slots=4, chunk_steps=16,
            max_len=args.decode_max_len, audio_samples=bucket,
            fusion=fusion)
        return carry, nocarry

    def decode_oracle(weight):
        """Carry-over with TRUE-transcript history (teacher-forced
        context): the upper bound of the carry mechanism, isolating it
        from error compounding in the decoded history."""
        import jax
        import jax.numpy as jnp

        from ..decode.beam import greedy_decode
        from ..models.speecht5 import model as st5

        fusion = FusionLM(lm_params, lm_cfg, weight=weight)
        sep = cfg.eos_token_id
        # FIXED priming shape: LEFT-aligned history in a [1, P] buffer
        # (absolute positions 0..L-1 match the live carry layout; the
        # tail pads' garbage KV sits at positions >= the variable start
        # offset, where causality hides everything the decode hasn't
        # overwritten) — the whole oracle pass compiles two programs,
        # not one per history length
        P = lm_cfg.n_positions - args.decode_max_len - 8
        enc_fn = jax.jit(lambda p, w, m: st5.encode_speech(p, cfg, w, m))
        prime_fn = jax.jit(lambda lp, ids, c: FusionLM(
            lp, lm_cfg, weight=weight).prime(
            ids, c, jnp.zeros((1,), jnp.int32))[0])
        dec_fn = jax.jit(lambda p, lp, e, m, c, s: greedy_decode(
            p, cfg, e, m, max_len=args.decode_max_len,
            fusion=FusionLM(lp, lm_cfg, weight=weight),
            lm_cache=c, lm_start=s))
        out = {}
        for reco, wavs in convs:
            hist: List[int] = []
            for uid, wav in zip(utt_order[reco], wavs):
                cache = fusion.init_cache(1, lm_cfg.n_positions)
                L = len(hist)
                ids = np.zeros((1, P), np.int32)
                if L:
                    ids[0, :L] = hist
                cache = prime_fn(fusion.params, jnp.asarray(ids), cache)
                start = np.asarray([L], np.int32)
                w = np.zeros((1, bucket), np.float32)
                m = np.zeros((1, bucket), np.int32)
                w[0, :len(wav)] = wav
                m[0, :len(wav)] = 1
                enc, msk = enc_fn(asr_params, jnp.asarray(w),
                                  jnp.asarray(m))
                toks, lens = dec_fn(asr_params, fusion.params, enc, msk,
                                    cache, jnp.asarray(start))
                out[uid] = (np.asarray(toks)[0], int(np.asarray(lens)[0]))
                # true-history growth (tokens + separator)
                ref = refs_by_utt[uid][2]
                hist.extend(tokenizer(ref)["input_ids"])
                hist.append(sep)
                hist = hist[-P:] if len(hist) > P else hist
        return out

    nofusion = decode_continuous(
        asr_params, cfg, flat_utts, slots=4, chunk_steps=16,
        max_len=args.decode_max_len, audio_samples=bucket, fusion=None)

    # ground-truth degradation labels (make_asr_corpus degraded.txt —
    # only SOME later occurrences are degraded, see the generator note)
    with open(os.path.join(dev_dir, "degraded.txt")) as f:
        degraded_ids = {line.strip() for line in f if line.strip()}

    def collect(hyp_by_utt: Dict[str, str]) -> Dict:
        buckets = {"all": ([], []), "clean": ([], []), "degraded": ([], [])}
        name_hits = name_total = 0
        for uid, (reco, u, ref) in refs_by_utt.items():
            hyp = hyp_by_utt.get(uid, "")
            deg = uid in degraded_ids
            for key in ("all", "degraded" if deg else "clean"):
                buckets[key][0].append(ref)
                buckets[key][1].append(hyp)
            if deg:
                name = _conv_name([ref])
                name_total += 1
                if name and name in hyp.split():
                    name_hits += 1
        out = {f"wer_{k}": wer(r, h) for k, (r, h) in buckets.items()}
        out["name_recovery"] = name_hits / max(name_total, 1)
        return out

    def from_continuous(res) -> Dict[str, str]:
        return {uid: _hyp_text(tokenizer, row, L, eos)
                for uid, (row, L) in res.items()}

    def from_conversations(res) -> Dict[str, str]:
        out = {}
        for reco, per_utt in res.items():
            for uid, (row, L) in zip(utt_order[reco], per_utt):
                out[uid] = _hyp_text(tokenizer, row, L, eos)
        return out

    weights = ([float(w) for w in args.fusion_weights.split(",")]
               if args.fusion_weights else [args.fusion_weight])
    results: Dict = {"nofusion": collect(from_continuous(nofusion))}
    dump: Dict = {}
    for uid, hyp in from_continuous(nofusion).items():
        dump.setdefault(uid, {"ref": refs_by_utt[uid][2]})["nofusion"] = hyp
    for wi, w in enumerate(weights):
        carry, nocarry = decode_at(w)
        c_hyps = from_conversations(carry)
        n_hyps = from_continuous(nocarry)
        o_hyps = {uid: _hyp_text(tokenizer, row, L, eos)
                  for uid, (row, L) in decode_oracle(w).items()}
        key = "" if wi == 0 else f"_w{w:g}"
        results[f"carry{key}"] = collect(c_hyps)
        results[f"nocarry{key}"] = collect(n_hyps)
        results[f"oracle{key}"] = collect(o_hyps)
        for label, hyps in ((f"carry{key}", c_hyps),
                            (f"nocarry{key}", n_hyps),
                            (f"oracle{key}", o_hyps)):
            for uid, hyp in hyps.items():
                dump[uid][label] = hyp
        print(f"ASR w={w:g}: WER degraded carry "
              f"{results[f'carry{key}']['wer_degraded']:.3f} vs no-carry "
              f"{results[f'nocarry{key}']['wer_degraded']:.3f} "
              f"(oracle-history "
              f"{results[f'oracle{key}']['wer_degraded']:.3f}, "
              f"no-fusion {results['nofusion']['wer_degraded']:.3f}); "
              f"name recovery "
              f"{results[f'carry{key}']['name_recovery']:.2f} / "
              f"{results[f'nocarry{key}']['name_recovery']:.2f} / "
              f"oracle {results[f'oracle{key}']['name_recovery']:.2f}",
              file=sys.stderr)
    with open(os.path.join(args.out_dir, "asr_hyps.json"), "w") as f:
        json.dump(dump, f, indent=1)
    results["wer_gain_degraded"] = (results["nocarry"]["wer_degraded"]
                                    - results["carry"]["wer_degraded"])
    return results


def main(argv=None) -> int:
    args = parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    from .common import setup_compilation_cache
    setup_compilation_cache()

    results: Dict = {}
    if args.stage in ("all", "lm"):
        results["lm"] = run_lm_stage(args)
    if args.stage in ("all", "asr"):
        results["asr"] = run_asr_stage(args)
    path = os.path.join(args.out_dir, "results.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"results written to {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
