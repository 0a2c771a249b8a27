"""Blockwise (flash) attention Pallas kernel for TPU.

O(T) memory causal attention for conversation-scale sequences — the
device-side answer to the reference's O(T*L) sliding-window scoring
(lms/src/utils.py:141-178) and the building block for sequence-parallel
ring attention (parallel/ring_attention.py).

Differentiable: forward is the Pallas kernel (online-softmax accumulation
in VMEM scratch, kv as the innermost grid dimension); backward is a
blockwise lax.scan recomputation from the saved logsumexp (flash-attention-2
math), O(T * block) memory — long-context attention is trainable without
materializing the [T, T] score matrix.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _ref2d(ref):
    """Load a [1, T, D] (flat-BH layout) or [1, T, 1, D] (NHD layout)
    block ref as [T, D] — rank is static, so this is a compile-time
    branch, not runtime control flow."""
    return ref[0, :, 0, :] if len(ref.shape) == 4 else ref[0]


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *,
                  scale: float, causal: bool, block_q: int, block_k: int,
                  num_k_blocks: int):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = qi * block_q
    k_start = ki * block_k
    # whole block strictly above the diagonal -> nothing to do
    run = (not causal) or (k_start <= q_start + block_q - 1)

    @pl.when(run)
    def _compute():
        # MXU operands ride the INPUT dtype (bf16 callers — mixed-precision
        # training — get full-rate bf16 MXU passes; f32 callers keep f32
        # numerics); accumulation and the online softmax stay f32
        # (measured: bf16 operands at [8,12,1024,64] halve the kernel
        # time again on top of the 512x512 block bump, docs/BENCH.md r4)
        q = _ref2d(q_ref)                                 # [Bq, D]
        k = _ref2d(k_ref)                                 # [Bk, D]
        v = _ref2d(v_ref)                                 # [Bk, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask = (k_start + cols) <= (q_start + rows)
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, 0:1]                            # [Bq, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)                            # [Bq, Bk] f32
        alpha = jnp.exp(m_prev - m_new)                   # [Bq, 1]
        l_new = alpha * l_scr[:, 0:1] + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
        o = (acc_scr[:] / denom).astype(o_ref.dtype)
        if len(o_ref.shape) == 4:       # NHD layout (static rank branch)
            o_ref[0, :, 0, :] = o
        else:
            o_ref[0] = o
        lse = (m_scr[:, 0:1] + jnp.log(denom)).astype(lse_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _flash_forward(q, k, v, *, causal, scale, block_q, block_k, interpret):
    """Padded/blocked pallas_call -> (out [B,H,Tq,D], lse [B,H,Tq])."""
    b, h, tq, d = q.shape
    tk = k.shape[2]

    block_q = min(block_q, _round_up(max(8, tq), 8))
    block_k = min(max(8, block_k), _round_up(tk, 8))
    pq = -tq % block_q
    pk = -tk % block_k
    if not causal:
        # padded keys would enter the softmax, so Tk must divide evenly;
        # halve block_k until it does (keeps Tk=384-style callers working
        # after the 128 -> 256 default-block bump) rather than erroring
        while pk and block_k > 8:
            block_k = max(8, block_k // 2)
            pk = -tk % block_k
        if pk:
            raise ValueError("non-causal flash requires Tk % block_k == 0 "
                             "(padded keys would enter the softmax); "
                             f"Tk={tk} has no 8-aligned block divisor")
    if pq or pk:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pq), (0, 0)))
        # pad keys with NEG_INF-safe zeros; causal mask excludes them for
        # every valid (unpadded) query row since their index > any valid row
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))
    tq_p, tk_p = q.shape[2], k.shape[2]

    qf = q.reshape(b * h, tq_p, d)
    kf = k.reshape(b * h, tk_p, d)
    vf = v.reshape(b * h, tk_p, d)
    num_q = tq_p // block_q
    num_k = tk_p // block_k

    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, num_k_blocks=num_k)

    out, lse = pl.pallas_call(
        kernel,
        grid=(b * h, num_q, num_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
        ],
        # lse rides in an [*, 8]-lane buffer: Mosaic requires the block's
        # last dim to be 128-divisible or equal to the array dim, so a
        # plain [bh, tq] layout with (1, block_q) blocks is not lowerable
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, 8), lambda bh, qi, ki: (bh, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, tq_p, 8), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)

    out = out.reshape(b, h, tq_p, d)[:, :, :tq]
    lse = lse[..., 0].reshape(b, h, tq_p)[:, :, :tq]
    return out, lse


def _flash_pair_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr,
                       acc_scr, *, scale: float, causal: bool,
                       block_q: int, block_k: int, num_k_blocks: int,
                       d: int, mxu_dtype=None):
    """Two-heads-per-grid-step flash kernel over [B, T, H*D] operands.

    Each block's 128-lane slice holds a HEAD PAIR (two D=64 heads side by
    side) — 128 lanes is the smallest Mosaic-lowerable last-dim block, so
    this is what lets the kernel consume the qkv projection's own layout
    with no relayout.  The two heads run sequentially inside the step
    with separate online-softmax stats (columns 0/1 of the [*, 8]
    scratch); the accumulator is the natural lane-packed [Bq, 128]."""
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = qi * block_q
    k_start = ki * block_k
    run = (not causal) or (k_start <= q_start + block_q - 1)

    @pl.when(run)
    def _compute():
        q = q_ref[0]                                      # [Bq, 2D]
        k = k_ref[0]                                      # [Bk, 2D]
        v = v_ref[0]                                      # [Bk, 2D]
        if mxu_dtype is not None:
            # "default"-precision mode: MXU operands in bf16, f32
            # accumulation — the same contraction XLA's default matmul
            # precision runs for the dense chain (docs/BENCH.md r5)
            q = q.astype(mxu_dtype)
            k = k.astype(mxu_dtype)
            v = v.astype(mxu_dtype)
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32,
                                            (block_q, block_k), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32,
                                            (block_q, block_k), 1)
            mask = (k_start + cols) <= (q_start + rows)
        for h2 in (0, 1):
            sl = slice(h2 * d, (h2 + 1) * d)
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if causal:
                s = jnp.where(mask, s, NEG_INF)
            m_prev = m_scr[:, h2:h2 + 1]                  # [Bq, 1]
            m_new = jnp.maximum(m_prev,
                                jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = (alpha * l_scr[:, h2:h2 + 1]
                     + jnp.sum(p, axis=1, keepdims=True))
            acc_scr[:, sl] = acc_scr[:, sl] * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_scr[:, h2:h2 + 1] = m_new
            l_scr[:, h2:h2 + 1] = l_new

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:, 0:2], 1e-30)         # [Bq, 2]
        recip = 1.0 / denom
        gain = jnp.concatenate(
            [jnp.broadcast_to(recip[:, 0:1], (block_q, d)),
             jnp.broadcast_to(recip[:, 1:2], (block_q, d))], axis=1)
        o_ref[0] = (acc_scr[:] * gain).astype(o_ref.dtype)
        lse2 = m_scr[:, 0:2] + jnp.log(denom)             # [Bq, 2]
        lse_ref[0] = jnp.pad(lse2, ((0, 0), (0, 6))).astype(lse_ref.dtype)


def _flash_forward_nhd(q, k, v, *, causal, scale, block_q, block_k,
                       interpret, precision="float32"):
    """[B, T, H, D] operands consumed IN PLACE -> (out [B, Tq, H, D],
    lse [B, H, Tq]).

    The arrays are viewed as [B, T, H*D] (a free reshape of the qkv
    projection output) and blocked 128 lanes at a time — one HEAD PAIR
    per grid step (:func:`_flash_pair_kernel`).  No [B, H, T, D] relayout
    copy is ever materialized (measured 5.4 ms of pure q/k/v transpose
    glue at gpt2 B=128 scoring, docs/BENCH.md round-4 decomposition —
    this path exists to delete it).  Requires D == 64 and an even head
    count; callers fall back to the flat-BH path otherwise."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if d != 64 or h % 2:
        raise ValueError(f"NHD path needs D == 64 and even heads, "
                         f"got D={d}, H={h}")
    hp = h // 2

    block_q = min(block_q, _round_up(max(8, tq), 8))
    block_k = min(max(8, block_k), _round_up(tk, 8))
    pq = -tq % block_q
    pk = -tk % block_k
    if not causal:
        while pk and block_k > 8:
            block_k = max(8, block_k // 2)
            pk = -tk % block_k
        if pk:
            raise ValueError("non-causal flash requires Tk % block_k == 0 "
                             "(padded keys would enter the softmax); "
                             f"Tk={tk} has no 8-aligned block divisor")
    if pq or pk:
        q = jnp.pad(q, ((0, 0), (0, pq), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pk), (0, 0), (0, 0)))
    tq_p, tk_p = q.shape[1], k.shape[1]
    num_q = tq_p // block_q
    num_k = tk_p // block_k

    qf = q.reshape(b, tq_p, h * d)
    kf = k.reshape(b, tk_p, h * d)
    vf = v.reshape(b, tk_p, h * d)

    # precision="default" mirrors XLA's default matmul precision: bf16
    # MXU passes with f32 accumulation, the SAME contraction the dense
    # baseline runs on TPU for f32 inputs.  Interpret mode (CPU) stays
    # f32 — exactly like XLA:CPU's default precision — so CPU parity
    # tests are unchanged.
    mxu_dtype = (jnp.bfloat16 if precision == "default" and not interpret
                 and q.dtype == jnp.float32 else None)
    kernel = functools.partial(
        _flash_pair_kernel, scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, num_k_blocks=num_k, d=d, mxu_dtype=mxu_dtype)

    q_spec = pl.BlockSpec((1, block_q, 2 * d),
                          lambda bh, qi, ki: (bh // hp, qi, bh % hp))
    kv_spec = pl.BlockSpec((1, block_k, 2 * d),
                           lambda bh, qi, ki: (bh // hp, ki, bh % hp))
    out, lse = pl.pallas_call(
        kernel,
        grid=(b * hp, num_q, num_k),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=(
            q_spec,
            pl.BlockSpec((1, block_q, 8), lambda bh, qi, ki: (bh, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, tq_p, h * d), q.dtype),
            jax.ShapeDtypeStruct((b * hp, tq_p, 8), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 8), jnp.float32),
            pltpu.VMEM((block_q, 8), jnp.float32),
            pltpu.VMEM((block_q, 2 * d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)

    out = out.reshape(b, tq_p, h, d)[:, :tq]
    # lse columns 0/1 hold the pair's two heads
    lse = (lse[..., :2].reshape(b, hp, tq_p, 2)
           .transpose(0, 1, 3, 2).reshape(b, h, tq_p)[:, :, :tq])
    return out, lse


def _flash_backward(q, k, v, out, lse, g, *, causal, scale, block_k):
    """Blockwise flash-attention-2 backward over kv blocks (lax.scan):
    memory O(Tq * block_k) instead of O(Tq * Tk)."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    pk = -tk % block_k
    if pk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))
    tk_p = k.shape[2]
    num_k = tk_p // block_k

    # MXU operands ride the input dtype (bf16 callers get bf16 passes);
    # softmax recompute, ds, and every accumulation stay f32 — for f32
    # inputs the casts are no-ops and the math is bit-identical
    dt = q.dtype
    gf = g.astype(jnp.float32)
    delta = jnp.sum(gf * out.astype(jnp.float32), axis=-1)       # [B,H,Tq]
    g_dt = g.astype(dt)
    q_pos = jnp.arange(tq)

    k_blocks = k.reshape(b, h, num_k, block_k, d).transpose(2, 0, 1, 3, 4)
    v_blocks = v.reshape(b, h, num_k, block_k, d).transpose(2, 0, 1, 3, 4)

    def body(dq_acc, inputs):
        j, k_j, v_j = inputs
        k_pos = j * block_k + jnp.arange(block_k)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_j,
                       preferred_element_type=jnp.float32) * scale
        if causal:
            mask = k_pos[None, :] <= q_pos[:, None]
            s = jnp.where(mask[None, None], s, NEG_INF)
        else:
            s = jnp.where((k_pos < tk)[None, None, None, :], s, NEG_INF)
        p = jnp.exp(s - lse[..., None])                          # [B,H,Tq,Bk]
        dv_j = jnp.einsum("bhqk,bhqd->bhkd", p.astype(dt), g_dt,
                          preferred_element_type=jnp.float32)
        dp = jnp.einsum("bhqd,bhkd->bhqk", g_dt, v_j,
                        preferred_element_type=jnp.float32)
        ds = p * (dp - delta[..., None])
        dq_acc = dq_acc + jnp.einsum("bhqk,bhkd->bhqd", ds.astype(dt), k_j,
                                     preferred_element_type=jnp.float32) \
            * scale
        dk_j = jnp.einsum("bhqk,bhqd->bhkd", ds.astype(dt), q,
                          preferred_element_type=jnp.float32) * scale
        return dq_acc, (dk_j, dv_j)

    dq, (dk_blocks, dv_blocks) = jax.lax.scan(
        body, jnp.zeros((b, h, tq, d), jnp.float32),
        (jnp.arange(num_k), k_blocks, v_blocks))
    dk = dk_blocks.transpose(1, 2, 0, 3, 4).reshape(b, h, tk_p, d)[:, :, :tk]
    dv = dv_blocks.transpose(1, 2, 0, 3, 4).reshape(b, h, tk_p, d)[:, :, :tk]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_attention(q, k, v, causal, scale, block_q, block_k, interpret):
    out, _ = _flash_forward(q, k, v, causal=causal, scale=scale,
                            block_q=block_q, block_k=block_k,
                            interpret=interpret)
    return out


def _fwd(q, k, v, causal, scale, block_q, block_k, interpret):
    out, lse = _flash_forward(q, k, v, causal=causal, scale=scale,
                              block_q=block_q, block_k=block_k,
                              interpret=interpret)
    return out, (q, k, v, out, lse)


def _bwd(causal, scale, block_q, block_k, interpret, residuals, g):
    q, k, v, out, lse = residuals
    return _flash_backward(q, k, v, out, lse, g, causal=causal, scale=scale,
                           block_k=block_k)


_flash_attention.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_attention_nhd(q, k, v, causal, scale, block_q, block_k,
                         interpret, precision="float32"):
    out, _ = _flash_forward_nhd(q, k, v, causal=causal, scale=scale,
                                block_q=block_q, block_k=block_k,
                                interpret=interpret, precision=precision)
    return out


def _nhd_fwd(q, k, v, causal, scale, block_q, block_k, interpret,
             precision="float32"):
    out, lse = _flash_forward_nhd(q, k, v, causal=causal, scale=scale,
                                  block_q=block_q, block_k=block_k,
                                  interpret=interpret, precision=precision)
    return out, (q, k, v, out, lse)


def _nhd_bwd(causal, scale, block_q, block_k, interpret, precision,
             residuals, g):
    # backward reuses the flat-BH blockwise kernel path; the transposes
    # here cost the relayout the forward avoided, which is the right
    # trade — the NHD path's workload is fwd-only bulk scoring
    q, k, v, out, lse = residuals
    tr = lambda x: x.transpose(0, 2, 1, 3)
    dq, dk, dv = _flash_backward(tr(q), tr(k), tr(v), tr(out), lse, tr(g),
                                 causal=causal, scale=scale,
                                 block_k=block_k)
    return tr(dq), tr(dk), tr(dv)


_flash_attention_nhd.defvjp(_nhd_fwd, _nhd_bwd)


def flash_attention_nhd(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
    causal: bool = True, scale: Optional[float] = None,
    block_q: Optional[int] = None, block_k: Optional[int] = None,
    interpret: Optional[bool] = None, precision: str = "float32",
) -> jnp.ndarray:
    """[B, T, H, D] q/k/v -> [B, Tq, H, D] causal flash attention.

    Identical math to :func:`flash_attention`, but the operands are
    consumed in the layout the qkv projection writes ([B, T, H*D]
    reshaped — a free view), and the output lands back in it: the
    [B, H, T, D] relayout copies around the pallas_call disappear
    entirely (5.4 ms of the 32.8 ms flash sublayer at gpt2 B=128
    scoring, docs/BENCH.md round-4 decomposition).  Differentiable; the
    backward transposes to the flat-BH kernel.  No rel_pe/kv_valid_len
    support — padding must be inert under causality (right padding),
    exactly the eval_ppl scoring contract.

    The in-place kernel packs a HEAD PAIR per 128-lane block (Mosaic's
    minimum last-dim block), so it needs D == 64 and an even head count
    — every GPT-2 preset qualifies; other shapes transparently fall back
    to the flat-BH kernel with transposes (same numbers).

    ``precision``: "float32" (exact f32 operand passes — multi-pass on
    the MXU, slower) or "default" — bf16 MXU operands with f32
    accumulation, the SAME contraction XLA's default matmul precision
    runs for the f32 dense chain on TPU (so "matching dense" means
    matching THIS).  Forward only; the backward always recomputes in the
    input dtype.  Interpret mode (CPU) stays f32 either way, like
    XLA:CPU's own default precision.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    b, t, h, d = q.shape
    if d != 64 or h % 2:
        tr = lambda x: x.transpose(0, 2, 1, 3)
        out = _flash_attention(tr(q), tr(k), tr(v), causal, scale,
                               block_q if block_q is not None else 512,
                               block_k if block_k is not None else 512,
                               interpret)
        return out.transpose(0, 2, 1, 3)
    return _flash_attention_nhd(q, k, v, causal, scale,
                                block_q if block_q is not None else 512,
                                block_k if block_k is not None else 512,
                                interpret, precision)


# ---------------------------------------------------------------------------
# Relative-position + key-padding variant (SpeechT5 encoder long-context path)
#
# HF SpeechT5 relative attention (ops/attention.py:93-135 pins the dense
# contract): s[i,j] = scale*q[i].k[j] + scale*q[i].pe[clip(i-j,-L,L-1)+L].
# The rel term factorizes as qpe[i, m] = scale*q[i].pe[m]  (one [T,2L] matmul)
# followed by a Toeplitz band-select m = clip(i-j)+L.  Mosaic has no gather,
# so the select is restructured:
#   outside:  y[i, j] = qpe[i, (r - j) mod Wp]   (r = i mod block_q) — computed
#             as ONE einsum against a pre-sheared PE table (no gather at all)
#   in-kernel: roll right by (D + L) mod Wp  ->  z[r, c] = qpe[r, r-c+D+L]
#             (D = q_start - k_start), slice the first block_k lanes, and
#             recover the two clip columns (m=0, m=2L-1) with iota-masked
#             lane sums.  All ops are Mosaic-lowerable (pltpu.roll verified).
# ---------------------------------------------------------------------------


def _rel_rev_table(pe_pad: jnp.ndarray, wp: int) -> jnp.ndarray:
    """[Wp, D] zero-padded rel-PE table -> reversed table with
    P_rev[m] = pe_pad[(-m) mod Wp].  The kernel computes
    qrev = (scale*q) @ P_rev^T in VMEM and per-row-rolls it into the
    sheared form y[r, j] = qpe[r, (r - j) mod Wp] — the whole
    [B, H, Tq, Wp] sheared-qpe tensor never touches HBM (it used to be
    einsum-materialized host-side: ~150 MB/layer of HBM round-trip at
    batch 16, which made the kernel LOSE to dense attention below
    ~2k frames)."""
    idx = (-jnp.arange(wp)) % wp
    return jnp.take(pe_pad, idx, axis=0)


def _flash_rel_kernel(q_ref, k_ref, v_ref, prev_ref, vl_ref, o_ref, lse_ref,
                      m_scr, l_scr, acc_scr, y_scr, *,
                      scale: float, causal: bool, block_q: int, block_k: int,
                      num_k_blocks: int, rel_max: int, wp: int):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        # sheared pre-scaled qpe for this q block, built fully in VMEM:
        # one [Bq, D] x [D, Wp] MXU matmul against the reversed PE table,
        # then a per-row roll-right by r (log-step doubling: roll the
        # whole tile by 2^b and keep it for rows with bit b set).
        qf = q_ref[0].astype(jnp.float32) * scale
        prv = prev_ref[...].astype(jnp.float32)           # [Wp, D]
        y = jax.lax.dot_general(qf, prv, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, wp), 0)
        bit = 1
        while bit < block_q:
            rolled = pltpu.roll(y, bit, axis=1)
            y = jnp.where((rows & bit) != 0, rolled, y)
            bit *= 2
        y_scr[:] = y

    q_start = qi * block_q
    k_start = ki * block_k
    run = (not causal) or (k_start <= q_start + block_q - 1)

    @pl.when(run)
    def _compute():
        # native-dtype MXU operands (bf16 callers get bf16 passes);
        # softmax/accumulators stay f32 — see _flash_kernel
        q = _ref2d(q_ref)                                 # [Bq, D]
        k = _ref2d(k_ref)                                 # [Bk, D]
        v = _ref2d(v_ref)                                 # [Bk, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale

        # --- relative-position band (y is pre-scaled sheared qpe) ---
        y = y_scr[...]                                    # [Bq, Wp]
        d_off = q_start - k_start
        t = jax.lax.rem(d_off + rel_max, wp)
        t = jnp.where(t < 0, t + wp, t)
        z = pltpu.roll(y, t, axis=1)[:, :block_k]         # interior band
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        idx_true = rows - cols + d_off + rel_max          # unclipped pe index
        r2 = jax.lax.broadcasted_iota(jnp.int32, (block_q, wp), 0)
        j2 = jax.lax.broadcasted_iota(jnp.int32, (block_q, wp), 1)
        m_of = jax.lax.rem(r2 - j2 + wp * 2, wp)          # true column of y
        col0 = jnp.sum(jnp.where(m_of == 0, y, 0.0), axis=1, keepdims=True)
        colL = jnp.sum(jnp.where(m_of == 2 * rel_max - 1, y, 0.0),
                       axis=1, keepdims=True)
        rel = jnp.where(idx_true <= 0, col0,
                        jnp.where(idx_true >= 2 * rel_max - 1, colL, z))
        s = s + rel

        if causal:
            s = jnp.where((k_start + cols) <= (q_start + rows), s, NEG_INF)
        vl = vl_ref[0, 0, 0]                              # valid key length
        s = jnp.where((k_start + cols) < vl, s, NEG_INF)

        m_prev = m_scr[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_scr[:, 0:1] + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
        o = (acc_scr[:] / denom).astype(o_ref.dtype)
        if len(o_ref.shape) == 4:       # NHD layout (static rank branch)
            o_ref[0, :, 0, :] = o
        else:
            o_ref[0] = o
        lse = (m_scr[:, 0:1] + jnp.log(denom)).astype(lse_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _flash_rel_forward(q, k, v, pe, valid_len, *, causal, scale, block_q,
                       block_k, interpret):
    """Forward with rel-pos band + key-padding mask.

    pe: [2L, D] relative-position key table (HF SpeechT5 layout).
    valid_len: [B] int32 number of valid key positions per batch element.
    Returns (out [B,H,Tq,D], lse [B,H,Tq]).
    """
    b, h, tq, d = q.shape
    tk = k.shape[2]
    rel_max = pe.shape[0] // 2
    block_q = min(block_q, _round_up(max(8, tq), 8))
    block_k = min(max(8, block_k), _round_up(tk, 8))
    wp = _round_up(max(2 * rel_max, block_k), _LANES)

    pq = -tq % block_q
    pk = -tk % block_k
    if pq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pq), (0, 0)))
    if pk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))
    tq_p, tk_p = q.shape[2], k.shape[2]

    # Reversed, zero-padded PE table; the kernel builds the sheared qpe
    # in VMEM from this [Wp, D] constant (see _rel_rev_table).
    pe_pad = jnp.pad(pe.astype(jnp.float32), ((0, wp - 2 * rel_max), (0, 0)))
    pe_rev = _rel_rev_table(pe_pad, wp)                    # [Wp, D]

    vl = jnp.broadcast_to(
        jnp.minimum(valid_len, tk).astype(jnp.int32)[:, None, None, None],
        (b, h, 8, _LANES))

    qf = q.reshape(b * h, tq_p, d)
    kf = k.reshape(b * h, tk_p, d)
    vf = v.reshape(b * h, tk_p, d)
    vlf = vl.reshape(b * h, 8, _LANES)
    num_q = tq_p // block_q
    num_k = tk_p // block_k

    kernel = functools.partial(
        _flash_rel_kernel, scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, num_k_blocks=num_k, rel_max=rel_max, wp=wp)

    out, lse = pl.pallas_call(
        kernel,
        grid=(b * h, num_q, num_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((wp, d), lambda bh, qi, ki: (0, 0)),
            pl.BlockSpec((1, 8, _LANES), lambda bh, qi, ki: (bh, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, 8), lambda bh, qi, ki: (bh, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, tq_p, 8), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, wp), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, pe_rev, vlf)

    out = out.reshape(b, h, tq_p, d)[:, :, :tq]
    lse = lse[..., 0].reshape(b, h, tq_p)[:, :, :tq]
    return out, lse


def _flash_rel_backward_xla(q, k, v, pe, valid_len, out, lse, g, *,
                            causal, scale, block_k):
    """Blockwise backward with the rel-pos band, in plain XLA.  KEPT ONLY
    AS THE TEST ORACLE for the Pallas backward below: its
    ``take_along_axis`` band gathers do not vectorize on TPU — measured
    28 s (!) for ONE [1,12,8199,64] layer backward vs 13.4 ms forward
    (docs/BENCH.md round-3) — long enough that multi-iteration programs
    tripped the TPU worker watchdog ("worker crashed" on the longctx
    train bench).  Production gradients go through
    :func:`_flash_rel_backward_pallas`."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    rel_max = pe.shape[0] // 2
    two_l = 2 * rel_max
    pk = -tk % block_k
    if pk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))
    tk_p = k.shape[2]
    num_k = tk_p // block_k

    qf = q.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    pef = pe.astype(jnp.float32)
    delta = jnp.sum(gf * out.astype(jnp.float32), axis=-1)       # [B,H,Tq]
    q_pos = jnp.arange(tq)
    vl = jnp.minimum(valid_len, tk).astype(jnp.int32)            # [B]
    qpe = jnp.einsum("bhid,md->bhim", qf, pef,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32) * scale  # [B,H,Tq,2L]

    k_blocks = k.reshape(b, h, num_k, block_k, d).transpose(2, 0, 1, 3, 4)
    v_blocks = v.reshape(b, h, num_k, block_k, d).transpose(2, 0, 1, 3, 4)

    ms = jnp.arange(two_l)

    def body(carry, inputs):
        dq_acc, dqpe_acc = carry
        j, k_j, v_j = inputs
        k_pos = j * block_k + jnp.arange(block_k)
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_j.astype(jnp.float32),
                       preferred_element_type=jnp.float32) * scale
        dist = q_pos[:, None] - k_pos[None, :]                   # [Tq, Bk]
        idx = jnp.clip(dist, -rel_max, rel_max - 1) + rel_max
        rel = jnp.take_along_axis(
            qpe, jnp.broadcast_to(idx, (b, h, tq, block_k)), axis=-1)
        s = s + rel
        if causal:
            s = jnp.where((dist >= 0)[None, None], s, NEG_INF)
        s = jnp.where((k_pos[None, :] < vl[:, None])[:, None, None, :],
                      s, NEG_INF)
        p = jnp.exp(s - lse[..., None])                          # [B,H,Tq,Bk]
        dv_j = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
        dp = jnp.einsum("bhqd,bhkd->bhqk", gf, v_j.astype(jnp.float32))
        ds = p * (dp - delta[..., None])
        dq_acc = dq_acc + jnp.einsum("bhqk,bhkd->bhqd", ds,
                                     k_j.astype(jnp.float32)) * scale
        dk_j = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * scale

        # dqpe: interior band via gather from ds; clip columns via masked sums
        # interior m = i - kpos + L  <=>  column c = i + L - m - j*Bk
        cidx = q_pos[:, None] + rel_max - ms[None, :] - j * block_k  # [Tq,2L]
        in_rng = (cidx >= 0) & (cidx < block_k)
        ds_gather = jnp.take_along_axis(
            ds, jnp.broadcast_to(jnp.clip(cidx, 0, block_k - 1),
                                 (b, h, tq, two_l)), axis=-1)
        interior = jnp.where(in_rng[None, None], ds_gather, 0.0)
        # clip masks exclude the boundary indices owned by the clip columns
        interior = interior * ((ms > 0) & (ms < two_l - 1))[None, None, None]
        low = jnp.sum(jnp.where((dist <= -rel_max)[None, None], ds, 0.0),
                      axis=-1)                                   # m = 0
        high = jnp.sum(jnp.where((dist >= rel_max - 1)[None, None], ds, 0.0),
                       axis=-1)                                  # m = 2L-1
        dqpe_j = interior.at[..., 0].add(low).at[..., two_l - 1].add(high)
        dqpe_acc = dqpe_acc + dqpe_j
        return (dq_acc, dqpe_acc), (dk_j, dv_j)

    (dq, dqpe), (dk_blocks, dv_blocks) = jax.lax.scan(
        body, (jnp.zeros_like(qf), jnp.zeros_like(qpe)),
        (jnp.arange(num_k), k_blocks, v_blocks))
    dk = dk_blocks.transpose(1, 2, 0, 3, 4).reshape(b, h, tk_p, d)[:, :, :tk]
    dv = dv_blocks.transpose(1, 2, 0, 3, 4).reshape(b, h, tk_p, d)[:, :, :tk]
    dq = dq + jnp.einsum("bhim,md->bhid", dqpe, pef,
                         preferred_element_type=jnp.float32) * scale
    dpe = jnp.einsum("bhim,bhid->md", dqpe, qf,
                     preferred_element_type=jnp.float32) * scale
    import numpy as _np
    dvl = _np.zeros(valid_len.shape, jax.dtypes.float0)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dpe.astype(pe.dtype), dvl)


# ---------------------------------------------------------------------------
# Pallas backward for the rel-pos kernel.
#
# Standard flash-attention-2 two-kernel split (dq+dqpe over k-blocks;
# dk+dv over q-blocks), with the rel-pos band handled WITHOUT gathers:
#
# * The score recompute rebuilds the sheared qpe exactly like the forward
#   (matmul against the reversed PE table + log-step per-row roll).
# * The band's own gradient dqpe[i, m] = sum_{j: clip(i-j)+L == m} ds[i, j]
#   is the transpose of the forward's Toeplitz band-select.  Key trick:
#   with block_k == Wp the true pe index m == (r - c + q_start + L) mod Wp
#   is the SAME for slot (r, c) of every k-block (d_off shifts by exactly
#   Wp per block), and interior masking keeps at most one k-block's
#   contribution per slot — so ds accumulates RAW across k-blocks in VMEM
#   and ONE per-row roll at the last block shears the accumulator into
#   (negated) pe coordinates.  The clip columns (m = 0, m = 2L-1)
#   accumulate as masked row-sums in two scratch lanes, like the forward.
#
# Everything is matmuls + rolls + iota masks: Mosaic-lowerable, no
# scatter/gather.  See _flash_rel_backward_xla's docstring for why the
# XLA form had to be replaced.
# ---------------------------------------------------------------------------


def _rel_bwd_dq_kernel(q_ref, k_ref, v_ref, prev_ref, vl_ref, lse_ref,
                       delta_ref, g_ref, dq_ref, dqpe_ref,
                       y_scr, dq_scr, ds_scr, clip_scr, *,
                       scale: float, causal: bool, block_q: int,
                       block_k: int, num_k_blocks: int, rel_max: int,
                       wp: int):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    q_start = qi * block_q
    k_start = ki * block_k

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)
        ds_scr[:] = jnp.zeros_like(ds_scr)
        clip_scr[:] = jnp.zeros_like(clip_scr)
        qf = q_ref[0].astype(jnp.float32) * scale
        prv = prev_ref[...].astype(jnp.float32)
        y = jax.lax.dot_general(qf, prv, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, wp), 0)
        bit = 1
        while bit < block_q:
            rolled = pltpu.roll(y, bit, axis=1)
            y = jnp.where((rows & bit) != 0, rolled, y)
            bit *= 2
        y_scr[:] = y

    run = (not causal) or (k_start <= q_start + block_q - 1)

    @pl.when(run)
    def _compute():
        # native-dtype MXU operands, f32 accumulation (see _flash_kernel)
        qf = q_ref[0]
        kf = k_ref[0]
        vf = v_ref[0]
        gf = g_ref[0]
        s = jax.lax.dot_general(qf, kf, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale

        y = y_scr[...]
        d_off = q_start - k_start
        t = jax.lax.rem(d_off + rel_max, wp)
        t = jnp.where(t < 0, t + wp, t)
        z = pltpu.roll(y, t, axis=1)[:, :block_k]
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        idx_true = rows - cols + d_off + rel_max
        r2 = jax.lax.broadcasted_iota(jnp.int32, (block_q, wp), 0)
        j2 = jax.lax.broadcasted_iota(jnp.int32, (block_q, wp), 1)
        m_of = jax.lax.rem(r2 - j2 + wp * 2, wp)
        col0 = jnp.sum(jnp.where(m_of == 0, y, 0.0), axis=1, keepdims=True)
        colL = jnp.sum(jnp.where(m_of == 2 * rel_max - 1, y, 0.0),
                       axis=1, keepdims=True)
        rel = jnp.where(idx_true <= 0, col0,
                        jnp.where(idx_true >= 2 * rel_max - 1, colL, z))
        s = s + rel

        if causal:
            s = jnp.where((k_start + cols) <= (q_start + rows), s, NEG_INF)
        vl = vl_ref[0, 0, 0]
        s = jnp.where((k_start + cols) < vl, s, NEG_INF)

        p = jnp.exp(s - lse_ref[0][:, 0:1])
        dp = jax.lax.dot_general(gf, vf, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0][:, 0:1])
        dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
            ds.astype(kf.dtype), kf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

        # dqpe: raw accumulation — valid because block_k == wp (see header)
        interior = (idx_true > 0) & (idx_true < 2 * rel_max - 1)
        ds_scr[:] = ds_scr[:] + jnp.where(interior, ds, 0.0)
        low = jnp.sum(jnp.where(idx_true <= 0, ds, 0.0), axis=1,
                      keepdims=True)
        high = jnp.sum(jnp.where(idx_true >= 2 * rel_max - 1, ds, 0.0),
                       axis=1, keepdims=True)
        lanes = jax.lax.broadcasted_iota(jnp.int32, clip_scr.shape, 1)
        clip_scr[:] = clip_scr[:] + jnp.where(
            lanes == 0, low, jnp.where(lanes == 1, high, 0.0))

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)
        # shear the raw ds accumulator into m' = (-m) mod wp coordinates:
        # out[r, jj] = a[r, (jj + r + t0) mod wp], t0 = (q_start + L) mod wp
        a = ds_scr[...]
        t0 = jax.lax.rem(jnp.int32(q_start + rel_max), wp)
        a = pltpu.roll(a, wp - t0, axis=1)          # constant: right by -t0
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, wp), 0)
        bit = 1
        while bit < block_q:
            rolled = pltpu.roll(a, wp - bit, axis=1)   # right by -bit
            a = jnp.where((rows & bit) != 0, rolled, a)
            bit *= 2
        lanes = jax.lax.broadcasted_iota(jnp.int32, (block_q, wp), 1)
        a = a + jnp.where(lanes == 0, clip_scr[:, 0:1], 0.0)
        a = a + jnp.where(lanes == wp - (2 * rel_max - 1),
                          clip_scr[:, 1:2], 0.0)
        dqpe_ref[0] = a


def _rel_bwd_dkv_kernel(q_ref, k_ref, v_ref, prev_ref, vl_ref, lse_ref,
                        delta_ref, g_ref, dk_ref, dv_ref,
                        dk_scr, dv_scr, *,
                        scale: float, causal: bool, block_q: int,
                        block_k: int, num_q_blocks: int, rel_max: int,
                        wp: int):
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    q_start = qi * block_q
    k_start = ki * block_k

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    run = (not causal) or (k_start <= q_start + block_q - 1)

    @pl.when(run)
    def _compute():
        # native-dtype MXU operands, f32 accumulation (see _flash_kernel)
        qf = q_ref[0]
        kf = k_ref[0]
        vf = v_ref[0]
        gf = g_ref[0]
        # sheared qpe for THIS q block (rebuilt per grid step — qi is the
        # innermost axis here, so there is no q-block to amortize over);
        # the qpe table matmul stays f32 (tiny, feeds the f32 rel band)
        yq = jax.lax.dot_general(qf.astype(jnp.float32) * scale,
                                 prev_ref[...].astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        rows_w = jax.lax.broadcasted_iota(jnp.int32, (block_q, wp), 0)
        bit = 1
        while bit < block_q:
            rolled = pltpu.roll(yq, bit, axis=1)
            yq = jnp.where((rows_w & bit) != 0, rolled, yq)
            bit *= 2

        s = jax.lax.dot_general(qf, kf, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        d_off = q_start - k_start
        t = jax.lax.rem(d_off + rel_max, wp)
        t = jnp.where(t < 0, t + wp, t)
        z = pltpu.roll(yq, t, axis=1)[:, :block_k]
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        idx_true = rows - cols + d_off + rel_max
        j2 = jax.lax.broadcasted_iota(jnp.int32, (block_q, wp), 1)
        m_of = jax.lax.rem(rows_w - j2 + wp * 2, wp)
        col0 = jnp.sum(jnp.where(m_of == 0, yq, 0.0), axis=1, keepdims=True)
        colL = jnp.sum(jnp.where(m_of == 2 * rel_max - 1, yq, 0.0),
                       axis=1, keepdims=True)
        rel = jnp.where(idx_true <= 0, col0,
                        jnp.where(idx_true >= 2 * rel_max - 1, colL, z))
        s = s + rel
        if causal:
            s = jnp.where((k_start + cols) <= (q_start + rows), s, NEG_INF)
        vl = vl_ref[0, 0, 0]
        s = jnp.where((k_start + cols) < vl, s, NEG_INF)

        p = jnp.exp(s - lse_ref[0][:, 0:1])
        dp = jax.lax.dot_general(gf, vf, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0][:, 0:1])
        # contract over the q rows (dim 0 of both operands)
        dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
            p.astype(gf.dtype), gf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
            ds.astype(qf.dtype), qf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(qi == num_q_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _flash_rel_backward_pallas(q, k, v, pe, valid_len, out, lse, g, *,
                               causal, scale, block_q, interpret):
    """Pallas backward for the rel-pos flash kernel: (dq, dk, dv, dpe).

    block_k is FORCED to Wp (the padded band width) — the dqpe
    accumulation trick requires it (see the header comment above)."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    rel_max = pe.shape[0] // 2
    two_l = 2 * rel_max
    wp = _round_up(max(two_l, _LANES), _LANES)
    block_k = wp
    block_q = min(block_q, _round_up(max(8, tq), 8))

    pq = -tq % block_q
    pk = -tk % block_k
    qf32 = q.astype(jnp.float32)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)                                   # [B,H,Tq]
    qp, gp = q, g
    lse_p, delta_p = lse, delta
    if pq:
        qp = jnp.pad(qp, ((0, 0), (0, 0), (0, pq), (0, 0)))
        gp = jnp.pad(gp, ((0, 0), (0, 0), (0, pq), (0, 0)))
        lse_p = jnp.pad(lse_p, ((0, 0), (0, 0), (0, pq)))
        delta_p = jnp.pad(delta_p, ((0, 0), (0, 0), (0, pq)))
    kp, vp = k, v
    if pk:
        kp = jnp.pad(kp, ((0, 0), (0, 0), (0, pk), (0, 0)))
        vp = jnp.pad(vp, ((0, 0), (0, 0), (0, pk), (0, 0)))
    tq_p, tk_p = qp.shape[2], kp.shape[2]
    num_q = tq_p // block_q
    num_k = tk_p // block_k

    pe_pad = jnp.pad(pe.astype(jnp.float32), ((0, wp - two_l), (0, 0)))
    pe_rev = _rel_rev_table(pe_pad, wp)                        # [Wp, D]
    vl = jnp.broadcast_to(
        jnp.minimum(valid_len, tk).astype(jnp.int32)[:, None, None, None],
        (b, h, 8, _LANES)).reshape(b * h, 8, _LANES)

    qr = qp.reshape(b * h, tq_p, d)
    kr = kp.reshape(b * h, tk_p, d)
    vr = vp.reshape(b * h, tk_p, d)
    gr = gp.reshape(b * h, tq_p, d)
    lse_l = jnp.broadcast_to(
        lse_p.reshape(b * h, tq_p)[..., None], (b * h, tq_p, 8)
    ).astype(jnp.float32)
    delta_l = jnp.broadcast_to(
        delta_p.reshape(b * h, tq_p)[..., None], (b * h, tq_p, 8)
    ).astype(jnp.float32)

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
        pl.BlockSpec((wp, d), lambda bh, qi, ki: (0, 0)),
        pl.BlockSpec((1, 8, _LANES), lambda bh, qi, ki: (bh, 0, 0)),
        pl.BlockSpec((1, block_q, 8), lambda bh, qi, ki: (bh, qi, 0)),
        pl.BlockSpec((1, block_q, 8), lambda bh, qi, ki: (bh, qi, 0)),
        pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
    ]
    dq_kernel = functools.partial(
        _rel_bwd_dq_kernel, scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, num_k_blocks=num_k, rel_max=rel_max, wp=wp)
    dq_r, dqpe_rev = pl.pallas_call(
        dq_kernel,
        grid=(b * h, num_q, num_k),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, wp), lambda bh, qi, ki: (bh, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, tq_p, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, tq_p, wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, wp), jnp.float32),     # y (sheared qpe)
            pltpu.VMEM((block_q, d), jnp.float32),      # dq accumulator
            pltpu.VMEM((block_q, wp), jnp.float32),     # raw ds accumulator
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # clip-column sums
        ],
        interpret=interpret,
    )(qr, kr, vr, pe_rev, vl, lse_l, delta_l, gr)

    dkv_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, ki, qi: (bh, qi, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh, ki, qi: (bh, ki, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh, ki, qi: (bh, ki, 0)),
        pl.BlockSpec((wp, d), lambda bh, ki, qi: (0, 0)),
        pl.BlockSpec((1, 8, _LANES), lambda bh, ki, qi: (bh, 0, 0)),
        pl.BlockSpec((1, block_q, 8), lambda bh, ki, qi: (bh, qi, 0)),
        pl.BlockSpec((1, block_q, 8), lambda bh, ki, qi: (bh, qi, 0)),
        pl.BlockSpec((1, block_q, d), lambda bh, ki, qi: (bh, qi, 0)),
    ]
    dkv_kernel = functools.partial(
        _rel_bwd_dkv_kernel, scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, num_q_blocks=num_q, rel_max=rel_max, wp=wp)
    dk_r, dv_r = pl.pallas_call(
        dkv_kernel,
        grid=(b * h, num_k, num_q),
        in_specs=dkv_specs,
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda bh, ki, qi: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, ki, qi: (bh, ki, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, tk_p, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, tk_p, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(qr, kr, vr, pe_rev, vl, lse_l, delta_l, gr)

    dq = dq_r.reshape(b, h, tq_p, d)[:, :, :tq]
    dk = dk_r.reshape(b, h, tk_p, d)[:, :, :tk]
    dv = dv_r.reshape(b, h, tk_p, d)[:, :, :tk]
    # un-negate the pe coordinate: dqpe[m] = rev[(-m) mod wp]
    rev = dqpe_rev.reshape(b, h, tq_p, wp)[:, :, :tq]
    dqpe = jnp.concatenate(
        [rev[..., :1], jnp.flip(rev[..., wp - two_l + 1:], axis=-1)],
        axis=-1)                                              # [B,H,Tq,2L]
    pef = pe.astype(jnp.float32)
    dq = dq + jnp.einsum("bhim,md->bhid", dqpe, pef,
                         preferred_element_type=jnp.float32) * scale
    dpe = jnp.einsum("bhim,bhid->md", dqpe, qf32,
                     preferred_element_type=jnp.float32) * scale
    import numpy as _np
    dvl = _np.zeros(valid_len.shape, jax.dtypes.float0)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dpe.astype(pe.dtype), dvl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_attention_rel(q, k, v, pe, valid_len, causal, scale, block_q,
                         block_k, interpret):
    out, _ = _flash_rel_forward(q, k, v, pe, valid_len, causal=causal,
                                scale=scale, block_q=block_q, block_k=block_k,
                                interpret=interpret)
    return out


def _rel_fwd(q, k, v, pe, valid_len, causal, scale, block_q, block_k,
             interpret):
    out, lse = _flash_rel_forward(q, k, v, pe, valid_len, causal=causal,
                                  scale=scale, block_q=block_q,
                                  block_k=block_k, interpret=interpret)
    return out, (q, k, v, pe, valid_len, out, lse)


def _rel_bwd(causal, scale, block_q, block_k, interpret, residuals, g):
    q, k, v, pe, valid_len, out, lse = residuals
    # bwd q-block: 256 amortizes the per-step qpe shear in the dkv kernel;
    # block_k is chosen inside (forced to Wp for the dqpe trick)
    return _flash_rel_backward_pallas(
        q, k, v, pe, valid_len, out, lse, g, causal=causal, scale=scale,
        block_q=max(block_q, 256), interpret=interpret)


_flash_attention_rel.defvjp(_rel_fwd, _rel_bwd)


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
    causal: bool = True, scale: Optional[float] = None,
    rel_pe: Optional[jnp.ndarray] = None,
    kv_valid_len: Optional[jnp.ndarray] = None,
    block_q: Optional[int] = None, block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """[B, H, T, D] q/k/v -> [B, H, Tq, D] attention output.

    Differentiable (custom VJP, blockwise backward).  Tq/Tk are padded to
    the block sizes internally and cropped.

    rel_pe: optional [2L, D] relative-position key table (HF SpeechT5
      semantics: s += scale * q . pe[clip(i-j, -L, L-1) + L]); gradients
      flow to it.  Enables the banded-rel kernel (encoder long-context).
    kv_valid_len: optional [B] int32 valid key count per batch row; keys at
      or beyond it are masked (variable-length/non-causal batches).  Without
      it, non-causal padding requires Tk % block_k == 0 on the plain path.
    block_q/block_k: block sizes; None picks measured defaults — 512x512
      for the plain kernel (v5e sweep at [8,12,1024,64], round-4:
      512x512 = 0.50 ms vs 256x256 = 1.38 ms vs dense chain = 1.77 ms
      — the bigger tiles amortize the per-block online-softmax VPU work
      and grid overhead; docs/BENCH.md round-4 decomposition) and, for
      the rel/masked kernel, 128 x single-k-block-up-to-1024 (short
      sequences skip the streaming-softmax renormalization entirely and
      run as one fused VMEM-resident pass).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    if rel_pe is None and kv_valid_len is None:
        return _flash_attention(q, k, v, causal, scale,
                                block_q if block_q is not None else 512,
                                block_k if block_k is not None else 512,
                                interpret)
    if block_q is None:
        # 256 measured -16% vs 128 at [1,12,8199,64] (round-4 sweep);
        # 512 with a 1024-wide k block exceeds the 16 MB scoped VMEM
        block_q = 256
    if block_k is None:
        block_k = min(_round_up(k.shape[2], _LANES), 1024)
    b = q.shape[0]
    tk = k.shape[2]
    if kv_valid_len is None:
        kv_valid_len = jnp.full((b,), tk, jnp.int32)
    if rel_pe is None:
        # mask-only: a zero 2-row table makes the rel band identically zero
        rel_pe = jnp.zeros((2, q.shape[-1]), q.dtype)
    return _flash_attention_rel(q, k, v, rel_pe, kv_valid_len, causal, scale,
                                block_q, block_k, interpret)
