"""Focused encoder profiling pass at B=16 inference (VERDICT r2 item 9).

Breaks the 12.8 ms encoder step into its stages with the chained-loop
methodology (the only honest timing on this relay TPU — CLAUDE.md), and
compares the measured time of each stage against its speed-of-light
(FLOPs / 197 TFLOP/s bf16-on-MXU, bytes / 819 GB/s HBM for v5e) so the
round-4 question "is the remaining gap compute or memory" is answered
with numbers, not guesses.

Stages:
  prenet   = conv feature encoder + feature projection + pos-conv embed
  trunk    = 12-layer transformer (rel-pos attention + FFN)
  full     = encode_speech end-to-end (sanity: ~= prenet + trunk)

Usage: python scripts/profile_encoder.py [--seconds 5] [--batch 16]
       [--dtype float32|bfloat16] [--trace DIR]
Writes a markdown-ready table to stdout.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32")
    p.add_argument("--trace", default=None,
                   help="also dump a jax.profiler trace to this dir")
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from loco_asr_tpu.models.speecht5 import model as st5, prenets
    from loco_asr_tpu.models.speecht5.config import SpeechT5Config
    from loco_asr_tpu.utils.profiling import device_time_per_iter

    cfg = SpeechT5Config()
    params = st5.asr_init(jax.random.PRNGKey(0), cfg)
    if args.dtype == "bfloat16":
        from loco_asr_tpu.utils.pytree import cast_floating
        params = cast_floating(params, jnp.bfloat16)

    rng = np.random.default_rng(0)
    sr = 16000
    wav = jnp.asarray(rng.standard_normal(
        (args.batch, int(args.seconds * sr))).astype(np.float32) * 0.1)
    mask = jnp.ones(wav.shape, jnp.int32)
    if args.dtype == "bfloat16":
        wav = wav.astype(jnp.bfloat16)

    def prenet_fn(params, wav, mask):
        h, m = prenets.speech_prenet(
            params["encoder"]["prenet"], cfg, wav, mask, deterministic=True)
        return h

    hidden, hmask = jax.jit(lambda p, w, m: prenets.speech_prenet(
        p["encoder"]["prenet"], cfg, w, m, deterministic=True))(
        params, wav, mask)
    frames = hidden.shape[1]

    def trunk_fn(params, hidden, hmask):
        from loco_asr_tpu.models.speecht5 import encoder as enc_mod
        return enc_mod.encoder(params["encoder"]["wrapped_encoder"], cfg,
                               hidden, attention_mask=hmask,
                               deterministic=True)

    def full_fn(params, wav, mask):
        h, _ = st5.encode_speech(params, cfg, wav, mask)
        return h

    rows = []
    t_pre = device_time_per_iter(prenet_fn, params, wav, mask,
                                 iters=args.iters)
    t_trunk = device_time_per_iter(trunk_fn, params, hidden, hmask,
                                   iters=args.iters)
    t_full = device_time_per_iter(full_fn, params, wav, mask,
                                  iters=args.iters)

    # ---- speed-of-light estimates (v5e: 197 TFLOP/s bf16, 819 GB/s HBM)
    B, T, H = args.batch, int(args.seconds * sr), cfg.hidden_size
    F = frames
    # conv stack FLOPs: sum over layers 2*B*T_out*Cin*Cout*K
    t_in = T
    conv_flops = 0
    cin = 1
    for cout, k, s in zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride):
        t_out = (t_in - k) // s + 1
        conv_flops += 2 * B * t_out * cin * cout * k
        t_in, cin = t_out, cout
    conv_flops += 2 * B * F * cfg.conv_dim[-1] * H          # feat proj
    conv_flops += 2 * B * F * H * H * (cfg.num_conv_pos_embeddings
                                       / cfg.num_conv_pos_embedding_groups)
    # transformer FLOPs/layer: qkvo 4*2*B*F*H^2, attn 2*2*B*F^2*H(+rel),
    # ffn 2*2*B*F*H*ffn
    L = cfg.encoder_layers
    attn_flops = L * (8 * B * F * H * H + 6 * B * F * F * H)
    ffn_flops = L * (4 * B * F * H * cfg.encoder_ffn_dim)
    trunk_flops = attn_flops + ffn_flops
    peak = 197e12 if args.dtype == "bfloat16" else 99e12  # v5e fp32 ~ half
    rows.append(("prenet", t_pre, conv_flops, conv_flops / peak))
    rows.append(("trunk", t_trunk, trunk_flops, trunk_flops / peak))
    rows.append(("full", t_full, conv_flops + trunk_flops,
                 (conv_flops + trunk_flops) / peak))

    audio_s = args.batch * args.seconds
    print(f"batch={args.batch} seconds={args.seconds} dtype={args.dtype} "
          f"frames={frames} backend={jax.default_backend()}")
    print(f"{'stage':8} {'ms':>8} {'GFLOP':>8} {'sol_ms':>8} {'pct_sol':>8} "
          f"{'TFLOP/s':>8}")
    for name, t, fl, sol in rows:
        print(f"{name:8} {t*1e3:8.2f} {fl/1e9:8.1f} {sol*1e3:8.2f} "
              f"{100*sol/t:8.1f} {fl/t/1e12:8.1f}")
    print(f"encoder RTFx = {audio_s / t_full:.1f}")

    if args.trace:
        from loco_asr_tpu.utils.profiling import trace as jtrace
        full_jit = jax.jit(full_fn)
        full_jit(params, wav, mask)  # compile outside the trace
        with jtrace(args.trace):
            for _ in range(3):
                r = full_jit(params, wav, mask)
            jax.block_until_ready(r)
        print(f"trace written to {args.trace}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
