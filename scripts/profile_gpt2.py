"""Focused GPT-2 scoring profiling pass (the eval_ppl hot path).

Splits the [bsize, max_len] window-scoring step (score_tokens =
gpt2_forward + chunked lm head, pipelines/eval_ppl.py:161-163) into its
stages with the chained-loop methodology (the only honest timing on this
relay TPU — CLAUDE.md), and compares each against its speed-of-light so
"where do the missing tokens/s go" is answered with numbers:

  forward  = 12-layer transformer (dense causal attention)
  lm_head  = chunked logsumexp lm head over the tied [V, H] embedding
  attn     = one isolated dense attention chain at the exact shape
  score    = the full eval_ppl step (sanity: ~= forward + lm_head)

Usage: python scripts/profile_gpt2.py [--bsize 8] [--max_len 1024]
       [--model gpt2] [--attn_impl dense|flash] [--trace DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--bsize", type=int, default=8)
    p.add_argument("--max_len", type=int, default=1024)
    p.add_argument("--model", default="gpt2",
                   choices=["gpt2", "gpt2-medium", "gpt2-large", "gpt2-xl"])
    p.add_argument("--attn_impl", choices=["dense", "flash"], default="dense")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--trace", default=None,
                   help="also dump a jax.profiler trace to this dir")
    p.add_argument("--peak_tflops", type=float, default=190.0,
                   help="measured matmul peak on this part (docs/BENCH.md "
                        "round-3 calibration; f32 inputs ride bf16 MXU "
                        "passes under default precision)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from loco_asr_tpu.models.gpt2 import model as g
    from loco_asr_tpu.ops import attention as att
    from loco_asr_tpu.pipelines.common import setup_compilation_cache
    from loco_asr_tpu.utils.profiling import device_time_per_iter

    setup_compilation_cache()
    cfg = g.PRESETS[args.model]
    params = g.gpt2_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T = args.bsize, args.max_len
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32))
    hid = jnp.asarray(
        rng.standard_normal((B, T, cfg.n_embd)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal(
        (B, cfg.n_head, T, cfg.head_dim)).astype(np.float32))

    def fwd(p, i):
        return jnp.mean(g.gpt2_forward(p, cfg, i,
                                       attn_impl=args.attn_impl)[0])

    def lm_head(p, h):
        return jnp.mean(g.token_nll_from_hidden(p["wte"]["weight"], h, ids))

    # build the causal bias INSIDE the jit (an iota compare) rather than
    # closing over a [T, T] constant: the relay compiler rejects >~10 MB
    # request bodies (CLAUDE.md), and at T=2048 the baked bias is 16 MB
    def attn_chain(q):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, q * 1.01,
                       preferred_element_type=jnp.float32) \
            / (cfg.head_dim ** 0.5)
        s = s + att.causal_attention_bias(T, T).astype(s.dtype)
        pr = jax.nn.softmax(s, axis=-1)
        return jnp.mean(jnp.einsum("bhqk,bhkd->bhqd", pr, q * 0.99,
                                   preferred_element_type=jnp.float32))

    def score(p, i):
        return jnp.mean(g.score_tokens(p, cfg, i, attn_impl=args.attn_impl))

    t_fwd = device_time_per_iter(fwd, params, ids, iters=args.iters)
    t_head = device_time_per_iter(lm_head, params, hid, iters=args.iters)
    t_attn = device_time_per_iter(attn_chain, q, iters=args.iters)
    t_score = device_time_per_iter(score, params, ids, iters=args.iters)

    # ---- speed-of-light
    H, V, L = cfg.n_embd, cfg.vocab_size, cfg.n_layer
    peak = args.peak_tflops * 1e12
    blk_mm = 2 * B * T * (12 * H * H) * L          # qkv+proj+fc+proj per layer
    attn_mm = L * 2 * 2 * B * cfg.n_head * T * T * cfg.head_dim
    head_mm = 2 * B * T * V * H
    rows = [
        ("forward", t_fwd, blk_mm + attn_mm),
        ("lm_head", t_head, head_mm),
        ("attn x1 (dense chain)", t_attn, attn_mm / L),
        ("score (fwd+head)", t_score, blk_mm + attn_mm + head_mm),
    ]
    print(f"model={args.model} {B}x{T} attn_impl={args.attn_impl} "
          f"backend={jax.default_backend()}")
    print(f"{'stage':24} {'ms':>8} {'GFLOP':>8} {'sol_ms':>8} {'pct_sol':>8}")
    for name, t, fl in rows:
        sol = fl / peak
        print(f"{name:24} {t*1e3:8.2f} {fl/1e9:8.1f} {sol*1e3:8.2f} "
              f"{100*sol/t:8.1f}")
    print(f"indep throughput = {B*(T-1)/t_score:,.0f} tok/s")

    if args.trace:
        from loco_asr_tpu.utils.profiling import trace as jtrace
        score_jit = jax.jit(score)
        score_jit(params, ids)
        with jtrace(args.trace):
            for _ in range(3):
                r = score_jit(params, ids)
            jax.block_until_ready(r)
        print(f"trace written to {args.trace}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
