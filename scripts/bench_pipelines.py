"""Pipeline-level benchmarks (VERDICT #6): the numbers the framework
exists for, not just the encoder kernel.

Measures, on the available accelerator, with chained-loop differencing
(the only honest method on this relay-attached TPU — see
utils/profiling.device_time_per_iter):

  1. eval_ppl GPT-2 scoring throughput at [bsize, 1024] windows, and the
     derived useful-tokens/s of the three context modes (indep scores
     every token of a window; max_len keeps ONE NLL per window after the
     first; streaming keeps max_len/2 per window).
  2. train_asr full-size SpeechT5 train step (fwd+bwd+AdamW) time and
     MFU against the v5e bf16 peak.
  3. long-audio decode RTFx: 60 s utterance -> encoder + greedy decode
     of 200 tokens, audio-seconds per wall-second.

Each section prints one line; --json writes all rows to a file.
Run sections selectively with --only {ppl,train,decode} (TPU jobs on this
box should be short; see CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e: 197 TFLOP/s bf16 (394 TOPS int8); default matmul precision runs
# bf16 passes, so this is the honest MFU denominator.
PEAK_FLOPS = 197e12

WWW = {}


def bench_ppl(bsize: int, max_len: int, model: str, attn_impl: str = "dense",
              bf16: bool = False):
    import jax
    import jax.numpy as jnp

    from loco_asr_tpu.models.gpt2 import model as g
    from loco_asr_tpu.utils.profiling import device_time_per_iter

    cfg = g.PRESETS[model]
    params = g.gpt2_init(jax.random.PRNGKey(0), cfg)
    if bf16:  # eval_ppl --compute_dtype bfloat16
        from loco_asr_tpu.utils.pytree import cast_floating
        params = cast_floating(params, jnp.bfloat16)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size,
                                   (bsize, max_len)).astype(np.int32))

    def score(p, ids):
        # chunked lm head (eval_ppl path); attn_impl mirrors --attn_impl
        nll = g.score_tokens(p, cfg, ids, attn_impl=attn_impl)
        return jnp.mean(nll)  # consume every element (no DCE of the batch)

    per = device_time_per_iter(score, params, ids, iters=10)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    flops = 2 * n_params * bsize * max_len  # fwd ~= 2*P per token
    rows = {
        "ppl_window_step_ms": per * 1e3,
        "ppl_indep_tokens_per_s": bsize * (max_len - 1) / per,
        "ppl_max_len_useful_tokens_per_s": bsize / per,
        "ppl_streaming_useful_tokens_per_s": bsize * (max_len // 2) / per,
        "ppl_fwd_mfu_pct": 100 * flops / per / PEAK_FLOPS,
    }
    print(f"eval_ppl [{model} {attn_impl}{' bf16' if bf16 else ''}, "
          f"{bsize}x{max_len}]: "
          f"{per*1e3:.2f} ms/window-batch"
          f" -> indep {rows['ppl_indep_tokens_per_s']:,.0f} tok/s,"
          f" max_len {rows['ppl_max_len_useful_tokens_per_s']:,.0f} useful tok/s,"
          f" streaming {rows['ppl_streaming_useful_tokens_per_s']:,.0f} tok/s"
          f" ({rows['ppl_fwd_mfu_pct']:.0f}% MFU)")
    WWW.update(rows)


def bench_train(batch: int, seconds: float, label_len: int,
                remat="none", bf16: bool = False, mp: bool = False,
                freeze: bool = False, rng_impl: str = "threefry",
                attn_impl: str = "dense"):
    import jax
    import jax.numpy as jnp

    from loco_asr_tpu.models.speecht5.config import SpeechT5Config
    from loco_asr_tpu.parallel import mesh as meshlib, partition, train
    from loco_asr_tpu.pipelines import common
    from loco_asr_tpu.utils.profiling import device_time_per_iter

    cfg = SpeechT5Config()
    mesh = meshlib.make_mesh(-1, 1, 1)
    params = common.load_speecht5_params(None, "asr", cfg, jax.random.PRNGKey(0))
    if bf16:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    params = partition.shard_params(params, mesh)
    tx = train.adamw(1e-4, 0.01, 10, 1000)
    opt_state = tx.init(params)
    step_fn = train.make_asr_train_step(
        cfg, mesh, tx, donate=False, remat=remat,
        freeze_feature_encoder=freeze, attn_impl=attn_impl,
        compute_dtype=jnp.bfloat16 if mp else None)

    rng = np.random.default_rng(0)
    t = int(seconds * 16000)
    batch_d = train.shard_batch({
        "input_values": jnp.asarray(
            rng.standard_normal((batch, t)).astype(np.float32) * 0.1),
        "attention_mask": jnp.ones((batch, t), jnp.int32),
        "labels": jnp.asarray(rng.integers(
            1, cfg.vocab_size, (batch, label_len)).astype(np.int32)),
    }, mesh)

    def step(p, opt, b, r):
        new_p, new_opt, m = step_fn(p, opt, b, r)
        # consume EVERY updated leaf: Adam is elementwise, so any leaf
        # left unread lets XLA DCE that parameter's dW matmul and update.
        # The previous form read only 4 leaves and understated step time
        # (see docs/BENCH.md round-3 correction)
        tot = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(new_p))
        return m["loss"] + m["grad_norm"] + tot * 1e-20

    key = jax.random.PRNGKey(0)
    per = device_time_per_iter(step, params, opt_state, batch_d, key, iters=8)

    # analytic FLOPs: 3x forward (fwd + 2x bwd).  Forward: conv stack
    # ~400 GFLOP at 80 audio-s (measured round 1, scales linearly) +
    # 12-layer encoder + 6-layer decoder matmuls.
    frames = int(seconds * 50)
    h = cfg.hidden_size
    enc = 12 * (12 * h * h + 4 * h * h) * frames * 2  # qkvo + ffn per frame
    dec = 6 * (16 * h * h + 4 * h * h) * label_len * 2
    conv = 400e9 * (batch * seconds) / 80.0
    fwd = batch * (enc + dec) + conv
    mfu = 100 * 3 * fwd / per / PEAK_FLOPS
    rows = {
        "train_asr_step_ms": per * 1e3,
        "train_asr_steps_per_s": 1.0 / per,
        "train_asr_audio_s_per_s": batch * seconds / per,
        "train_asr_mfu_pct": mfu,
    }
    tag = "".join(
        [f" remat={remat}" if remat not in (False, None, "none") else "",
         " bf16" if bf16 else "", " mp" if mp else "",
         " freeze" if freeze else "",
         f" rng={rng_impl}" if rng_impl != "threefry" else "",
         f" attn={attn_impl}" if attn_impl != "dense" else ""])
    print(f"train_asr [B{batch}x{seconds:.0f}s, labels {label_len}{tag}]: "
          f"{per*1e3:.1f} ms/step ({1.0/per:.1f} steps/s, "
          f"{batch*seconds/per:,.0f} audio-s/s, ~{mfu:.0f}% MFU)")
    WWW.update(rows)


def bench_longctx_train(seconds: float, batch: int, label_len: int,
                        attn_impl: str = "flash", remat="full",
                        mp: bool = False):
    """Conversation-scale ASR fine-tuning step: flash attention + remat.
    Dense attention OOMs past ~8k encoder frames (docs/BENCH.md
    conversation-length table); this row proves the long-context TRAINING
    path (VERDICT r2 item 3) and measures its throughput."""
    import jax
    import jax.numpy as jnp

    from loco_asr_tpu.models.speecht5.config import SpeechT5Config
    from loco_asr_tpu.parallel import mesh as meshlib, partition, train
    from loco_asr_tpu.pipelines import common
    from loco_asr_tpu.utils.profiling import device_time_per_iter

    cfg = SpeechT5Config()
    mesh = meshlib.make_mesh(-1, 1, 1)
    params = common.load_speecht5_params(None, "asr", cfg,
                                         jax.random.PRNGKey(0))
    params = partition.shard_params(params, mesh)
    tx = train.adamw(1e-4, 0.01, 10, 1000)
    opt_state = tx.init(params)
    step_fn = train.make_asr_train_step(
        cfg, mesh, tx, donate=False, remat=remat, attn_impl=attn_impl,
        compute_dtype=jnp.bfloat16 if mp else None)

    rng = np.random.default_rng(0)
    t = int(seconds * 16000)
    frames = cfg.feat_extract_output_length(t)
    batch_d = train.shard_batch({
        "input_values": jnp.asarray(
            rng.standard_normal((batch, t)).astype(np.float32) * 0.1),
        "attention_mask": jnp.ones((batch, t), jnp.int32),
        "labels": jnp.asarray(rng.integers(
            1, cfg.vocab_size, (batch, label_len)).astype(np.int32)),
    }, mesh)

    def step(p, opt, b, r):
        new_p, new_opt, m = step_fn(p, opt, b, r)
        # consume EVERY updated leaf — see bench_train for why [:4] was
        # a DCE hole that undermeasured the backward
        tot = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(new_p))
        return m["loss"] + m["grad_norm"] + tot * 1e-20

    per = device_time_per_iter(step, params, opt_state, batch_d,
                               jax.random.PRNGKey(0), iters=4)
    rows = {
        f"longctx_train_frames": frames,
        f"longctx_train_step_ms": per * 1e3,
        f"longctx_train_audio_s_per_s": batch * seconds / per,
    }
    print(f"longctx train_asr [{attn_impl}+remat={remat}"
          f"{' mp' if mp else ''}, "
          f"B{batch}x{seconds:.0f}s = {frames} frames]: "
          f"{per*1e3:.1f} ms/step ({batch*seconds/per:,.1f} audio-s/s)")
    WWW.update(rows)


def bench_conv_train(conversation_seconds: float, batch: int,
                     attn_impl: str = "flash", remat="lite",
                     mp: bool = False, utt_seconds: float = 8.0):
    """Conversation-WINDOW training step: the batch comes from the REAL
    data path — a Kaldi dir (text/segments/wav.scp with per-utterance
    audio files) run through ConversationAsrDataset's window construction
    (chronological ordering, segment cropping, concatenation, separator
    tokens) and its padded batcher — not a handcrafted tensor.  Audio
    content is synthesized (no LDC corpus in this container) but every
    byte flows through the production pipeline train_asr
    --conversation_seconds uses."""
    import shutil
    import tempfile
    import wave as wave_mod

    import jax
    import jax.numpy as jnp

    from loco_asr_tpu.data.asr_dataset import ConversationAsrDataset
    from loco_asr_tpu.data.tokenizer import CharTokenizer
    from loco_asr_tpu.models.speecht5.config import SpeechT5Config
    from loco_asr_tpu.parallel import mesh as meshlib, partition, train
    from loco_asr_tpu.pipelines import common
    from loco_asr_tpu.utils.profiling import device_time_per_iter

    cfg = SpeechT5Config()
    rng = np.random.default_rng(0)
    root = tempfile.mkdtemp(prefix="conv_bench_")
    try:
        # one recording per batch row, each holding exactly one window's
        # worth of utterances (utt_seconds each, chronological utt ids)
        utts_per_win = max(1, int(conversation_seconds // utt_seconds))
        text_lines, seg_lines, scp_lines = [], [], []
        words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
                 "dogs", "and", "cats", "speak", "now"]
        for r in range(batch):
            rec = f"rec{r}-A"
            dur = utts_per_win * utt_seconds
            pcm = (rng.standard_normal(int(dur * 16000)) * 3000).astype(
                np.int16)
            path = f"{root}/{rec}.wav"
            with wave_mod.open(path, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(pcm.tobytes())
            scp_lines.append(f"{rec} {path}")
            for u in range(utts_per_win):
                s, e = u * utt_seconds, (u + 1) * utt_seconds
                uid = f"rec{r}-A-{int(s*100):06d}-{int(e*100):06d}"
                text = " ".join(rng.choice(words, 20))
                text_lines.append(f"{uid} {text}")
                seg_lines.append(f"{uid} {rec} {s:.2f} {e:.2f}")
        with open(f"{root}/text", "w") as f:
            f.write("\n".join(text_lines) + "\n")
        with open(f"{root}/segments", "w") as f:
            f.write("\n".join(seg_lines) + "\n")
        with open(f"{root}/wav.scp", "w") as f:
            f.write("\n".join(scp_lines) + "\n")

        ds = ConversationAsrDataset(root,
                                    window_seconds=conversation_seconds)
        n_windows = len(ds)
        tok = CharTokenizer()
        max_label = max(128, int(16 * conversation_seconds))
        b = next(ds.batches(tok, batch, max_label_len=max_label,
                            eos_id=cfg.eos_token_id))
        frames = cfg.feat_extract_output_length(b["input_values"].shape[1])
    finally:
        shutil.rmtree(root, ignore_errors=True)

    mesh = meshlib.make_mesh(-1, 1, 1)
    params = common.load_speecht5_params(None, "asr", cfg,
                                         jax.random.PRNGKey(0))
    params = partition.shard_params(params, mesh)
    tx = train.adamw(1e-4, 0.01, 10, 1000)
    opt_state = tx.init(params)
    step_fn = train.make_asr_train_step(
        cfg, mesh, tx, donate=False, remat=remat, attn_impl=attn_impl,
        compute_dtype=jnp.bfloat16 if mp else None)
    batch_d = train.shard_batch(
        {k: jnp.asarray(v) for k, v in b.items()
         if k in ("input_values", "attention_mask", "labels")}, mesh)

    def step(p, opt, bb, r):
        new_p, new_opt, m = step_fn(p, opt, bb, r)
        tot = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(new_p))
        return m["loss"] + m["grad_norm"] + tot * 1e-20

    per = device_time_per_iter(step, params, opt_state, batch_d,
                               jax.random.PRNGKey(0), iters=4)
    audio_s = float(np.asarray(b["attention_mask"]).sum()) / 16000.0
    WWW.update({
        "convtrain_windows": n_windows,
        "convtrain_frames": frames,
        "convtrain_label_len": int(b["labels"].shape[1]),
        "convtrain_step_ms": per * 1e3,
        "convtrain_audio_s_per_s": audio_s / per,
    })
    print(f"conversation-window train [{attn_impl}+remat={remat}"
          f"{' mp' if mp else ''}, B{batch} x "
          f"{conversation_seconds:.0f}s windows = {frames} frames, "
          f"labels {b['labels'].shape[1]}]: {per*1e3:.1f} ms/step "
          f"({audio_s/per:,.1f} audio-s/s)")


def bench_train_lm(bsize: int, seq_len: int, model: str = "gpt2",
                   mp: bool = False, rng_impl: str = "threefry",
                   loss_impl: str = "chunked", attn_impl: str = "dense",
                   remat="none", accum: int = 1, mu_bf16: bool = False,
                   opt: str = "adamw", state_timer: bool = False):
    """Full-size GPT-2 LM train step (fwd+bwd+AdamW) on [bsize, seq_len]
    token windows — the training half of the reference's lms/ subproject
    (eval_ppl covers scoring; this row covers train_lm throughput)."""
    import jax
    import jax.numpy as jnp

    from loco_asr_tpu.models.gpt2 import model as g
    from loco_asr_tpu.parallel import mesh as meshlib, partition, train
    from loco_asr_tpu.pipelines.eval_ppl import load_gpt2_params
    from loco_asr_tpu.utils.profiling import device_time_per_iter

    cfg = g.PRESETS[model]
    mesh = meshlib.make_mesh(-1, 1, 1)
    params = partition.shard_params(load_gpt2_params(None, cfg), mesh)
    if opt == "adafactor":
        tx = train.adafactor(3e-4, 0.01, 10, 1000)
    else:
        tx = train.adamw(3e-4, 0.01, 10, 1000,
                         mu_dtype=jnp.bfloat16 if mu_bf16 else None)
    opt_state = tx.init(params)
    step_fn = train.make_lm_train_step(
        cfg, mesh, tx, donate=False,
        compute_dtype=jnp.bfloat16 if mp else None,
        loss_impl=loss_impl, attn_impl=attn_impl, remat=remat,
        grad_accum=accum)

    rng = np.random.default_rng(0)
    batch_d = train.shard_batch({
        "ids": jnp.asarray(rng.integers(
            0, cfg.vocab_size, (bsize, seq_len)).astype(np.int32)),
        "lengths": jnp.full((bsize,), seq_len, jnp.int32),
    }, mesh)

    if state_timer:
        # carry (params, opt_state) through the timing loop so XLA
        # aliases the state in place — required for gpt2-xl, where the
        # default timer's pre+post param copies alone exceed HBM
        # (utils/profiling.device_time_per_iter_state docstring)
        from loco_asr_tpu.utils.profiling import device_time_per_iter_state
        per, params, opt_state = device_time_per_iter_state(
            step_fn, params, opt_state, batch_d, jax.random.PRNGKey(0),
            iters=4)
    else:
        def step(p, opt, b, r):
            new_p, new_opt, m = step_fn(p, opt, b, r)
            # consume every updated leaf (DCE guard — see bench_train)
            tot = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(new_p))
            return m["loss"] + m["grad_norm"] + tot * 1e-20

        per = device_time_per_iter(step, params, opt_state, batch_d,
                                   jax.random.PRNGKey(0), iters=6)
    # analytic fwd FLOPs: per token, 12 blocks x (qkvo 4h^2 + ffn 8h^2)
    # matmuls + attention 2*T*h (x2 for q.k and p.v) + lm head h*V
    h, L, V = cfg.n_embd, cfg.n_layer, cfg.vocab_size
    tok = bsize * seq_len
    fwd = tok * (L * (12 * h * h + 2 * 2 * seq_len * h) + h * V) * 2
    mfu = 100 * 3 * fwd / per / PEAK_FLOPS
    toks = tok / per
    rows = {
        "train_lm_step_ms": per * 1e3,
        "train_lm_tokens_per_s": toks,
        "train_lm_mfu_pct": mfu,
    }
    print(f"train_lm [{model}, B{bsize}x{seq_len}{' mp' if mp else ''}"
          f"{f' loss={loss_impl}' if loss_impl != 'chunked' else ''}"
          f"{f' attn={attn_impl}' if attn_impl != 'dense' else ''}"
          f"{f' remat={remat}' if remat not in (False, None, 'none') else ''}"
          f"{f' accum={accum}' if accum > 1 else ''}"
          f"{' mu=bf16' if mu_bf16 else ''}"
          f"{f' opt={opt}' if opt != 'adamw' else ''}"
          f"{f' rng={rng_impl}' if rng_impl != 'threefry' else ''}]: "
          f"{per*1e3:.1f} ms/step ({toks:,.0f} tok/s, ~{mfu:.0f}% MFU)")
    WWW.update(rows)


def bench_decode(seconds: float, decode_len: int):
    import jax
    import jax.numpy as jnp

    from loco_asr_tpu.decode.beam import greedy_decode
    from loco_asr_tpu.models.speecht5 import model as st5
    from loco_asr_tpu.models.speecht5.config import SpeechT5Config
    from loco_asr_tpu.pipelines import common
    from loco_asr_tpu.utils.profiling import device_time_per_iter

    cfg = SpeechT5Config()
    params = common.load_speecht5_params(None, "asr", cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    t = int(seconds * 16000)
    wav = jnp.asarray(rng.standard_normal((1, t)).astype(np.float32) * 0.1)
    mask = jnp.ones((1, t), jnp.int32)

    def e2e(p, wav, mask):
        enc, m = st5.encode_speech(p, cfg, wav, mask)
        toks, lens = greedy_decode(p, cfg, enc, m, max_len=decode_len)
        return jnp.mean(toks.astype(jnp.float32)) + jnp.mean(enc)

    per = device_time_per_iter(e2e, params, wav, mask, iters=5)
    rows = {"decode_long_audio_s": seconds,
            "decode_e2e_ms": per * 1e3,
            "decode_rtfx": seconds / per}
    print(f"long-audio decode [{seconds:.0f}s -> {decode_len} tokens]: "
          f"{per*1e3:.1f} ms e2e (RTFx {seconds/per:,.0f})")
    WWW.update(rows)


def bench_continuous(n_utts: int, slots: int, max_len: int):
    """Static greedy batching vs continuous batching on the SAME utterance
    set.  Random weights give geometric decode lengths (P(eos)~1/V per
    step), so streams retire at different times — the straggler effect the
    batcher exists to remove.  Wall-clock includes host admission (the
    honest serving metric); outputs are np.asarray-synced."""
    import time

    import jax
    import jax.numpy as jnp

    from loco_asr_tpu.decode.batcher import decode_continuous
    from loco_asr_tpu.decode.beam import greedy_decode
    from loco_asr_tpu.models.speecht5 import model as st5
    from loco_asr_tpu.models.speecht5.config import SpeechT5Config
    from loco_asr_tpu.pipelines import common

    cfg = SpeechT5Config()
    params = common.load_speecht5_params(None, "asr", cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    bucket = 5 * 16000
    utts = [(f"u{i}", (rng.standard_normal(
        rng.integers(2 * 16000, bucket + 1)) * 0.1).astype(np.float32))
        for i in range(n_utts)]
    audio_s = sum(len(w) for _, w in utts) / 16000.0

    enc_fn = jax.jit(lambda p, w, m: st5.encode_speech(p, cfg, w, m))
    dec_fn = jax.jit(lambda p, e, m: greedy_decode(p, cfg, e, m,
                                                   max_len=max_len))

    def run_static():
        outs = []
        for i in range(0, n_utts, slots):
            chunk = utts[i:i + slots]
            w = np.zeros((slots, bucket), np.float32)
            m = np.zeros((slots, bucket), np.int32)
            for j, (_, wav) in enumerate(chunk):
                w[j, : len(wav)] = wav
                m[j, : len(wav)] = 1
            enc, msk = enc_fn(params, jnp.asarray(w), jnp.asarray(m))
            toks, lens = dec_fn(params, enc, msk)
            outs.append((np.asarray(toks), np.asarray(lens)))
        return outs

    t0 = time.perf_counter()
    run_static()                               # warm compile
    print(f"  [static compile+warm {time.perf_counter()-t0:.1f}s]",
          file=sys.stderr)
    t0 = time.perf_counter()
    static_out = run_static()
    t_static = time.perf_counter() - t0

    t0 = time.perf_counter()
    decode_continuous(params, cfg, utts[:slots], slots=slots,
                      max_len=max_len, audio_samples=bucket,
                      encode_fn=enc_fn)        # warm compile
    print(f"  [continuous compile+warm {time.perf_counter()-t0:.1f}s]",
          file=sys.stderr)
    t0 = time.perf_counter()
    decode_continuous(params, cfg, utts, slots=slots,
                      max_len=max_len, audio_samples=bucket,
                      encode_fn=enc_fn)
    t_cont = time.perf_counter() - t0

    lens = np.concatenate([l for _, l in static_out])[:n_utts]
    rows = {
        "cont_static_wall_s": t_static, "cont_batcher_wall_s": t_cont,
        "cont_speedup": t_static / t_cont,
        "cont_rtfx": audio_s / t_cont,
        "cont_mean_decode_len": float(lens.mean()),
    }
    print(f"decode {n_utts} utts (slots {slots}, max_len {max_len}, mean "
          f"len {lens.mean():.0f}): static {t_static:.2f}s, continuous "
          f"{t_cont:.2f}s ({t_static/t_cont:.2f}x, RTFx {audio_s/t_cont:,.0f})")
    WWW.update(rows)


def bench_conversations(n_convs: int, utts_per_conv: int, slots: int,
                        max_len: int):
    """Conversation carry-over: batched decode_conversations vs the only
    other way to get identical numerics — sequential greedy_decode +
    ConversationContext per conversation (batch=1, decode/long_audio.py's
    mode).  This is the batcher's designed win regime: the sequential
    path cannot batch across streams because each utterance depends on
    its stream's history."""
    import time

    import jax
    import jax.numpy as jnp

    from loco_asr_tpu.decode.batcher import decode_conversations
    from loco_asr_tpu.decode.beam import greedy_decode
    from loco_asr_tpu.decode.context import ConversationContext
    from loco_asr_tpu.decode.fusion import FusionLM
    from loco_asr_tpu.models.gpt2 import model as g
    from loco_asr_tpu.models.speecht5 import model as st5
    from loco_asr_tpu.models.speecht5.config import SpeechT5Config
    from loco_asr_tpu.pipelines import common

    cfg = SpeechT5Config()
    params = common.load_speecht5_params(None, "asr", cfg,
                                         jax.random.PRNGKey(0))
    lm_cfg = g.GPT2Config(vocab_size=cfg.vocab_size)  # full-size GPT-2 body
    fusion = FusionLM(g.gpt2_init(jax.random.PRNGKey(7), lm_cfg), lm_cfg,
                      weight=0.3)
    rng = np.random.default_rng(0)
    bucket = 5 * 16000
    convs = []
    for c in range(n_convs):
        wavs = [(rng.standard_normal(
            rng.integers(2 * 16000, bucket + 1)) * 0.1).astype(np.float32)
            for _ in range(utts_per_conv)]
        convs.append((f"conv{c}", wavs))
    audio_s = sum(len(w) for _, ws in convs for w in ws) / 16000.0
    reserve = max_len + 8

    enc_fn = jax.jit(lambda p, w, m: st5.encode_speech(p, cfg, w, m))

    def run_sequential(convs_subset):
        dec = jax.jit(lambda p, lp, e, m, c, s: greedy_decode(
            p, cfg, e, m, max_len=max_len,
            fusion=FusionLM(lp, lm_cfg, weight=0.3),
            lm_cache=c, lm_start=s, return_lm_cache=True))
        for cid, wavs in convs_subset:
            ctx = ConversationContext(fusion, batch=1,
                                      decode_reserve=reserve)
            for wav in wavs:
                w = np.zeros((1, bucket), np.float32)
                m = np.zeros((1, bucket), np.int32)
                w[0, :len(wav)] = wav
                m[0, :len(wav)] = 1
                enc, msk = enc_fn(params, jnp.asarray(w), jnp.asarray(m))
                cache, start = ctx.state()
                toks, lens, cache = dec(params, fusion.params, enc, msk,
                                        cache, start)
                ctx.append(np.asarray(toks), np.asarray(lens), cache)

    # Warm both paths on the FULL workload (compile), then measure the
    # second run.  The batcher's admission path compiles one program per
    # pow-2 bucket size (1..slots) and those shapes only appear as slots
    # drain, so a 1-conversation warm-up leaves relay compiles inside the
    # measured region (first measurement of this bench: 25.3 s with
    # compiles inside the window).  Production runs amortize these
    # compiles via the persistent compilation cache (pipelines/common.py).
    run_sequential(convs)
    t0 = time.perf_counter()
    run_sequential(convs)
    t_seq = time.perf_counter() - t0

    decode_conversations(params, cfg, convs, fusion=fusion, slots=slots,
                         max_len=max_len, audio_samples=bucket,
                         encode_fn=enc_fn, decode_reserve=reserve)
    t0 = time.perf_counter()
    decode_conversations(params, cfg, convs, fusion=fusion, slots=slots,
                         max_len=max_len, audio_samples=bucket,
                         encode_fn=enc_fn, decode_reserve=reserve)
    t_batch = time.perf_counter() - t0

    rows = {"conv_sequential_wall_s": t_seq,
            "conv_batcher_wall_s": t_batch,
            "conv_speedup": t_seq / t_batch,
            "conv_rtfx": audio_s / t_batch}
    print(f"conversations {n_convs}x{utts_per_conv} (slots {slots}, "
          f"max_len {max_len}): sequential {t_seq:.2f}s, batched "
          f"{t_batch:.2f}s ({t_seq/t_batch:.2f}x, RTFx {audio_s/t_batch:,.0f})")

    # BEAM x carry-over (BASELINE configs 4+5 combined): K beams per
    # conversation slot, best-hypothesis LM state carried forward
    k = 4
    decode_conversations(params, cfg, convs, fusion=fusion, slots=slots,
                         max_len=max_len, beam_size=k, audio_samples=bucket,
                         encode_fn=enc_fn, decode_reserve=reserve)
    t0 = time.perf_counter()
    decode_conversations(params, cfg, convs, fusion=fusion, slots=slots,
                         max_len=max_len, beam_size=k, audio_samples=bucket,
                         encode_fn=enc_fn, decode_reserve=reserve)
    t_beam = time.perf_counter() - t0
    rows["conv_beam_wall_s"] = t_beam
    rows["conv_beam_rtfx"] = audio_s / t_beam
    print(f"conversations beam{k}+fusion+carry-over: {t_beam:.2f}s "
          f"(RTFx {audio_s/t_beam:,.0f}; {t_beam/t_batch:.2f}x greedy cost)")

    # sequential beam+fusion+carry-over wall — the only numerics-equal
    # alternative to the batched beam path (beam_decode_with_context per
    # stream, batch=1), so the beam row's speedup is measured against its
    # true baseline rather than the sequential *greedy* wall above
    from loco_asr_tpu.decode.context import beam_decode_with_context

    def run_sequential_beam(convs_subset):
        for cid, wavs in convs_subset:
            ctx = ConversationContext(fusion, batch=1,
                                      decode_reserve=reserve)
            for wav in wavs:
                w = np.zeros((1, bucket), np.float32)
                m = np.zeros((1, bucket), np.int32)
                w[0, :len(wav)] = wav
                m[0, :len(wav)] = 1
                enc, msk = enc_fn(params, jnp.asarray(w), jnp.asarray(m))
                beam_decode_with_context(params, cfg, enc, msk, ctx,
                                         beam_size=k, max_len=max_len)

    run_sequential_beam(convs)
    t0 = time.perf_counter()
    run_sequential_beam(convs)
    t_seq_beam = time.perf_counter() - t0
    rows["conv_beam_sequential_wall_s"] = t_seq_beam
    rows["conv_beam_speedup"] = t_seq_beam / t_beam
    print(f"conversations sequential beam{k}+fusion+carry-over: "
          f"{t_seq_beam:.2f}s (batched beam is {t_seq_beam/t_beam:.2f}x)")
    WWW.update(rows)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--only", choices=["ppl", "train", "decode", "cont",
                                      "longctx", "conv", "trainlm",
                                      "convtrain"],
                   default=None)
    p.add_argument("--longctx_seconds", type=float, default=164.0,
                   help="audio seconds for the long-context train row "
                        "(164 s ~= 8,198 encoder frames, past the dense "
                        "OOM knee)")
    p.add_argument("--longctx_batch", type=int, default=1)
    p.add_argument("--longctx_remat", default="full",
                   choices=["none", "full", "dots", "hybrid", "lite"])
    p.add_argument("--json", default=None, help="write rows to this file")
    p.add_argument("--ppl_bsize", type=int, default=8)
    p.add_argument("--ppl_max_len", type=int, default=1024)
    p.add_argument("--ppl_model", default="gpt2")
    p.add_argument("--ppl_attn_impl", choices=["dense", "flash"],
                   default="dense")
    p.add_argument("--train_batch", type=int, default=8)
    p.add_argument("--train_seconds", type=float, default=5.0)
    p.add_argument("--train_label_len", type=int, default=128)
    p.add_argument("--train_remat", nargs="?", const="full", default="none",
                   choices=["none", "full", "dots", "hybrid", "lite"])
    p.add_argument("--train_bf16", action="store_true",
                   help="FULL bf16 (params + optimizer cast); see "
                        "--train_mp for the standard scheme")
    p.add_argument("--train_mp", action="store_true",
                   help="mixed precision: bf16 compute/activations, f32 "
                        "master params + Adam (train step compute_dtype)")
    p.add_argument("--train_accum", type=int, default=1,
                   help="grad-accumulation microbatches for the trainlm row")
    p.add_argument("--train_opt", choices=["adamw", "adafactor"],
                   default="adamw",
                   help="optimizer for the trainlm row ('adafactor': "
                        "factored second moments, ~zero optimizer HBM "
                        "— the gpt2-xl one-chip configuration)")
    p.add_argument("--train_state_timer", action="store_true",
                   help="time the trainlm row with the state-carrying "
                        "chained loop (in-place param aliasing; required "
                        "for gpt2-xl)")
    p.add_argument("--train_mu_bf16", action="store_true",
                   help="store Adam's first moment in bf16 "
                        "(train.adamw mu_dtype; halves mu HBM)")
    p.add_argument("--ppl_bf16", action="store_true",
                   help="score in bf16 (eval_ppl --compute_dtype bfloat16)")
    p.add_argument("--train_loss_impl", choices=["chunked", "dense"],
                   default="chunked",
                   help="LM train-loss form (see train_lm --loss_impl)")
    p.add_argument("--train_freeze", action="store_true",
                   help="freeze the conv feature extractor (HF "
                        "fine-tuning convention; skips its backward)")
    p.add_argument("--train_attn_impl", choices=["dense", "flash"],
                   default="dense",
                   help="encoder self-attention in the short-T train row "
                        "(flash skips the saved [B,H,T,T] probs in the "
                        "backward — HBM relief, see BENCH.md)")
    p.add_argument("--decode_seconds", type=float, default=60.0)
    p.add_argument("--decode_len", type=int, default=200)
    p.add_argument("--rng_impl", default="threefry",
                   choices=["threefry", "rbg", "unsafe_rbg"],
                   help="PRNG for the train rows' dropout masks "
                        "(trainers default to 'rbg'; threefry here keeps "
                        "historical rows comparable)")
    args = p.parse_args(argv)

    from loco_asr_tpu.pipelines.common import (setup_compilation_cache,
                                               setup_rng_impl)
    setup_rng_impl(args.rng_impl)
    # persistent executable cache: repeated sweep invocations (block/batch
    # tuning) skip the multi-minute relay compiles (TPU-only, common.py)
    setup_compilation_cache()

    import jax
    print(f"backend: {jax.default_backend()} devices: {jax.devices()}",
          file=sys.stderr)
    if args.only in (None, "ppl"):
        bench_ppl(args.ppl_bsize, args.ppl_max_len, args.ppl_model,
                  args.ppl_attn_impl, bf16=args.ppl_bf16)
    if args.only in (None, "train"):
        bench_train(args.train_batch, args.train_seconds, args.train_label_len,
                    remat=args.train_remat, bf16=args.train_bf16,
                    mp=args.train_mp,
                    freeze=args.train_freeze, rng_impl=args.rng_impl,
                    attn_impl=args.train_attn_impl)
    if args.only in (None, "decode"):
        bench_decode(args.decode_seconds, args.decode_len)
    if args.only == "cont":
        bench_continuous(32, 8, 200)
    if args.only == "longctx":
        bench_longctx_train(args.longctx_seconds, args.longctx_batch,
                            args.train_label_len,
                            remat=args.longctx_remat, mp=args.train_mp)
    if args.only == "trainlm":
        bench_train_lm(args.ppl_bsize, args.ppl_max_len, args.ppl_model,
                       mp=args.train_mp, rng_impl=args.rng_impl,
                       loss_impl=args.train_loss_impl,
                       attn_impl=args.ppl_attn_impl, remat=args.train_remat,
                       accum=args.train_accum, mu_bf16=args.train_mu_bf16,
                       opt=args.train_opt,
                       state_timer=args.train_state_timer)
    if args.only == "conv":
        bench_conversations(8, 4, 8, 200)
    if args.only == "convtrain":
        bench_conv_train(args.longctx_seconds, args.longctx_batch,
                         remat=args.longctx_remat, mp=args.train_mp)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(WWW, f, indent=2)


if __name__ == "__main__":
    main()
