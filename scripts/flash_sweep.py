"""Flash-kernel performance decomposition on the real TPU (VERDICT r3
item 4: make flash <= dense at GPT-2 scoring scale OR prove the VPU
softmax floor makes that impossible).

Measures, at the GPT-2 scoring shape [B=8, H=12, T=1024, D=64]:
  * the dense causal attention chain (the XLA baseline flash must beat),
  * the production flash kernel across block sizes,
  * ablated kernel variants that isolate where the time goes:
      - dots-only (softmax replaced by identity: pure MXU cost)
      - no-renorm (exp but no running-max rescale: MXU + exp cost)
      - bf16 dots (operands fed to the MXU in bf16 instead of f32)

Timing is chained-loop differencing (the only honest method on the
relay-attached TPU, see utils/profiling.py).

Usage: python scripts/flash_sweep.py [--batch 8] [--heads 12]
           [--seq 1024] [--dim 64]
"""

from __future__ import annotations

import argparse
import functools
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax                                               # noqa: E402
import jax.numpy as jnp                                  # noqa: E402
from jax.experimental import pallas as pl                # noqa: E402
from jax.experimental.pallas import tpu as pltpu         # noqa: E402

from loco_asr_tpu.ops.pallas.flash_attention import (    # noqa: E402
    flash_attention)
from loco_asr_tpu.utils.profiling import device_time_per_iter  # noqa: E402

NEG_INF = -1e30


def _ablate_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                   scale, block_q, block_k, num_k_blocks, variant,
                   mxu_dtype):
    """Stripped copy of the production kernel with ablation switches.
    variant: 'full' | 'dots' (no softmax) | 'norenorm' (exp, no running
    max) — causal masking kept in all variants so the block-skip
    behavior matches production."""
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = qi * block_q
    k_start = ki * block_k
    run = k_start <= q_start + block_q - 1

    @pl.when(run)
    def _compute():
        q = q_ref[0].astype(mxu_dtype)
        k = k_ref[0].astype(mxu_dtype)
        v = v_ref[0].astype(mxu_dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = (k_start + cols) <= (q_start + rows)
        s = jnp.where(mask, s, NEG_INF if variant != "dots" else 0.0)

        if variant == "dots":
            p = s
            acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
                p.astype(mxu_dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif variant == "norenorm":
            p = jnp.exp(s * 1e-3)      # bounded exp, no running max
            l_scr[:, 0:1] = l_scr[:, 0:1] + jnp.sum(p, axis=1,
                                                    keepdims=True)
            acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
                p.astype(mxu_dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            m_prev = m_scr[:, 0:1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_scr[:, 0:1] = alpha * l_scr[:, 0:1] + jnp.sum(
                p, axis=1, keepdims=True)
            acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
                p.astype(mxu_dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        if variant == "dots":
            o_ref[0] = acc_scr[:].astype(o_ref.dtype)
        else:
            denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
            o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


def ablate(q, k, v, *, block_q, block_k, variant="full",
           mxu_dtype=jnp.float32):
    b, h, t, d = q.shape
    scale = d ** -0.5
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, t, d)
    vf = v.reshape(b * h, t, d)
    num_q = t // block_q
    num_k = t // block_k
    kernel = functools.partial(
        _ablate_kernel, scale=scale, block_q=block_q, block_k=block_k,
        num_k_blocks=num_k, variant=variant, mxu_dtype=mxu_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, num_q, num_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda bh, qi, ki: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )(qf, kf, vf)
    return out.reshape(b, h, t, d)


def dense_causal(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (d ** -0.5)
    t = q.shape[2]
    mask = jnp.tril(jnp.ones((t, t), bool))
    s = jnp.where(mask[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def bench_sublayer(batch: int, heads: int, seq: int, dim: int):
    """Attention SUBLAYER comparison (qkv proj + attention + out proj) —
    the level where the r4 decomposition found 5.4 ms of q/k/v relayout
    glue around the pallas_call at B=128.  'flash-nhd' consumes the
    projection output layout in place (ops/pallas flash_attention_nhd);
    'flash-bhtd' is the old transpose-wrapped path; 'dense' is XLA's
    fused chain (in-network form: the sublayer, not an isolated op)."""
    from loco_asr_tpu.ops.pallas import flash_attention_nhd

    e = heads * dim
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((batch, seq, e)), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((e, 3 * e)) * 0.02, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((e, e)) * 0.02, jnp.float32)

    def make(impl):
        def f(x, wqkv, wo):
            b, t, _ = x.shape
            qkv = x @ wqkv
            q, k, v = jnp.split(qkv, 3, axis=-1)
            if impl == "dense":
                tr = lambda z: z.reshape(b, t, heads, dim).transpose(
                    0, 2, 1, 3)
                q, k, v = tr(q), tr(k), tr(v)
                a = dense_causal(q, k, v)
                a = a.transpose(0, 2, 1, 3).reshape(b, t, e)
            elif impl == "flash-bhtd":
                tr = lambda z: z.reshape(b, t, heads, dim).transpose(
                    0, 2, 1, 3)
                a = flash_attention(tr(q), tr(k), tr(v), causal=True)
                a = a.transpose(0, 2, 1, 3).reshape(b, t, e)
            else:  # flash-nhd variants
                re = lambda z: z.reshape(b, t, heads, dim)
                prec = "default" if "default" in impl else "float32"
                bk = 1024 if "1024" in impl else None
                a = flash_attention_nhd(re(q), re(k), re(v), causal=True,
                                        precision=prec, block_k=bk)
                a = a.reshape(b, t, e)
            return a @ wo
        return f

    from loco_asr_tpu.utils.profiling import device_time_per_iter
    print(f"\nsublayer [B={batch},H={heads},T={seq},D={dim}] "
          f"(qkv proj + causal attention + out proj), ms/call:")
    for impl in ("dense", "flash-bhtd", "flash-nhd", "flash-nhd-default",
                 "flash-nhd-1024", "flash-nhd-default-1024"):
        per = device_time_per_iter(make(impl), x, wqkv, wo, iters=6)
        print(f"  {impl:12s} {per*1e3:8.2f} ms")
    # parity spot check nhd vs bhtd
    a = make("flash-nhd")(x, wqkv, wo)
    b = make("flash-bhtd")(x, wqkv, wo)
    print(f"  nhd vs bhtd max abs diff: "
          f"{float(jnp.max(jnp.abs(a - b))):.2e}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--seq", type=int, default=1024)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--sublayer", action="store_true",
                   help="run the sublayer (proj+attn+proj) comparison "
                        "instead of the kernel-level sweep")
    args = p.parse_args(argv)
    if args.sublayer:
        print(f"backend: {jax.default_backend()}", file=sys.stderr)
        bench_sublayer(args.batch, args.heads, args.seq, args.dim)
        return

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    shape = (args.batch, args.heads, args.seq, args.dim)
    q = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def t(fn):
        per = device_time_per_iter(fn, q, k, v, iters=10)
        return per * 1e3

    rows = {}
    rows["dense"] = t(lambda q, k, v: dense_causal(q, k, v))
    for bq, bk in [(256, 256), (512, 256), (256, 512), (512, 512),
                   (128, 512), (1024, 256), (512, 1024)]:
        if bq > args.seq or bk > args.seq:
            continue
        rows[f"flash {bq}x{bk}"] = t(functools.partial(
            flash_attention, causal=True, block_q=bq, block_k=bk))
    # ablations at the default block size
    for variant in ("full", "norenorm", "dots"):
        rows[f"ablate {variant} f32"] = t(functools.partial(
            ablate, block_q=256, block_k=256, variant=variant))
        rows[f"ablate {variant} bf16"] = t(functools.partial(
            ablate, block_q=256, block_k=256, variant=variant,
            mxu_dtype=jnp.bfloat16))
    for bq, bk in [(512, 512), (512, 1024)]:
        if bk <= args.seq:
            rows[f"ablate full bf16 {bq}x{bk}"] = t(functools.partial(
                ablate, block_q=bq, block_k=bk, variant="full",
                mxu_dtype=jnp.bfloat16))

    print(f"\nshape [B={args.batch},H={args.heads},T={args.seq},"
          f"D={args.dim}] causal, ms/call:")
    for name, ms in rows.items():
        print(f"  {name:28s} {ms:8.2f} ms")
    # correctness spot check for the bf16 full ablation vs dense
    ref = dense_causal(q, k, v)
    got = ablate(q, k, v, block_q=256, block_k=256, variant="full",
                 mxu_dtype=jnp.bfloat16)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"bf16-dot full kernel max abs err vs dense: {err:.4f}")


if __name__ == "__main__":
    main()
