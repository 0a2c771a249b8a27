"""Fused first-layer speech front-end kernel: conv1 + instance-norm + GELU.

The SpeechT5/wav2vec2 feature encoder's first layer (kernel 10, stride 5,
1->512 channels, GroupNorm with groups == channels, GELU) dominates the
prenet's memory traffic: XLA materializes the [B, 512, T/5] conv output,
re-reads it for the per-channel normalization statistics, and writes it
again.  This kernel computes statistics in a first grid phase WITHOUT
writing the conv output (conv FLOPs are trivial, ~2.6 GFLOP per second of
audio, so recomputing in phase 2 is free), then normalizes + GELUs +
writes once — one HBM output write instead of XLA's write/read/write.

Math contract: lax conv (NCH) -> GroupNorm(C groups, eps 1e-5) -> erf-GELU,
identical to prenets.feature_encoder's first layer (parity-tested to 3e-6).

Status (measured on v5e-1, batch 16 x 5 s): 3.1 ms at chunk 128 vs XLA's
2.9 ms; raising the scoped-VMEM budget (v5e has 128 MB physical) and
growing chunks makes it *slower* (3.5 ms at 1024 — the per-chunk
[C, CF] output transpose dominates, not grid-step overhead).  Conclusion:
XLA's own conv+norm fusion is already near the traffic floor here.  Kept
as a parity-exact reference for a future multi-layer fused front-end
(docs/ROADMAP.md); not wired into the default prenet path.

Mosaic layout notes: blocks carry ITEMS=8 batch rows so the wav block's
sublane dim meets the (8, 128) tiling constraint; inputs are
stride-separated tap views (lane dims of `stride` are not reshapeable
inside Mosaic); phase 0 parks its output block on chunk 0 (consecutive
identical block indices coalesce into one copy-out, so the stats pass
writes almost nothing).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5
_ITEMS = 8


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| <= 1.5e-7): Mosaic has
    no erf primitive, and tanh-approx GELU would break reference numerics."""
    sign = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-a * a))


def _kernel(ws1_ref, ws2_ref, wa_ref, wb_ref, scale_ref, bias_ref, out_ref,
            sum_scr, sq_scr, *, chunk_frames: int, total_frames: int,
            stride: int):
    phase = pl.program_id(1)
    c = pl.program_id(2)

    @pl.when((phase == 0) & (c == 0))
    def _reset():
        sum_scr[:] = jnp.zeros_like(sum_scr)
        sq_scr[:] = jnp.zeros_like(sq_scr)

    # stride-separated taps: ws1[i, j, f] = wav[i, stride*f + j],
    # ws2[i, j, f] = wav[i, stride*(f+1) + j]; conv = two tap contractions
    a = ws1_ref[:]                                               # [I, S, CF]
    b2 = ws2_ref[:]
    y = (jax.lax.dot_general(a, wa_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         + jax.lax.dot_general(b2, wb_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32))  # [I, CF, C]

    fidx = c * chunk_frames + jax.lax.broadcasted_iota(
        jnp.int32, (chunk_frames, 1), 0)
    valid = (fidx < total_frames).astype(jnp.float32)            # [CF, 1]

    @pl.when(phase == 0)
    def _accumulate():
        yv = y * valid[None]
        sum_scr[:] = sum_scr[:] + jnp.sum(yv, axis=1)            # [I, C]
        sq_scr[:] = sq_scr[:] + jnp.sum(yv * yv, axis=1)

    @pl.when(phase == 1)
    def _normalize_and_write():
        n = jnp.float32(total_frames)
        mean = sum_scr[:] / n                                    # [I, C]
        var = sq_scr[:] / n - mean * mean
        inv = jax.lax.rsqrt(var + _EPS)
        z = (y - mean[:, None, :]) * inv[:, None, :]
        z = z * scale_ref[0][None, None, :] + bias_ref[0][None, None, :]
        z = 0.5 * z * (1.0 + _erf(z / jnp.sqrt(jnp.float32(2.0))))
        out_ref[:] = z.transpose(0, 2, 1).astype(out_ref.dtype)  # [I, C, CF]


def conv1_instance_norm_gelu(
    wav: jnp.ndarray, weight: jnp.ndarray, scale: jnp.ndarray,
    bias: jnp.ndarray, *, stride: int = 5, chunk_frames: int = 128,
    vmem_limit_mb: int = 100, interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """[B, T] waveform, [C, 1, K] conv weight (torch OIH, K == 2*stride),
    [C] norm scale/bias -> [B, C, (T-K)//stride + 1] activations."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t = wav.shape
    cch, _, k = weight.shape
    if k != 2 * stride:
        raise ValueError(f"kernel {k} must equal 2*stride {stride} "
                         "(wav2vec2 first-layer geometry)")
    total_frames = (t - k) // stride + 1
    num_chunks = -(-total_frames // chunk_frames)
    pb = -b % _ITEMS
    # pad so num_chunks * chunk_frames (+1 lookahead) frame rows exist
    need = (num_chunks * chunk_frames + 1) * stride + stride
    wav_p = jnp.pad(wav, ((0, pb), (0, max(0, need - t))))
    n_rows = num_chunks * chunk_frames

    # stride-separated tap views (tiny host->HBM copies, 2x the waveform):
    # ws1[i, j, f] = wav[i, stride*f + j]; ws2 shifts by one frame
    resh = wav_p[:, : (n_rows + 1) * stride].reshape(b + pb, n_rows + 1, stride)
    ws1 = resh[:, :-1].transpose(0, 2, 1)                        # [B, S, F]
    ws2 = resh[:, 1:].transpose(0, 2, 1)

    w_flat = weight[:, 0, :].T                                   # [K, C]
    wa, wb = w_flat[:stride], w_flat[stride:]

    out = pl.pallas_call(
        functools.partial(_kernel, chunk_frames=chunk_frames,
                          total_frames=total_frames, stride=stride),
        grid=((b + pb) // _ITEMS, 2, num_chunks),
        in_specs=[
            pl.BlockSpec((_ITEMS, stride, chunk_frames),
                         lambda bb, p, cc: (bb, 0, cc)),
            pl.BlockSpec((_ITEMS, stride, chunk_frames),
                         lambda bb, p, cc: (bb, 0, cc)),
            pl.BlockSpec((stride, cch), lambda bb, p, cc: (0, 0)),
            pl.BlockSpec((stride, cch), lambda bb, p, cc: (0, 0)),
            pl.BlockSpec((1, cch), lambda bb, p, cc: (0, 0)),
            pl.BlockSpec((1, cch), lambda bb, p, cc: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_ITEMS, cch, chunk_frames),
                               lambda bb, p, cc: (bb, 0, p * cc)),
        out_shape=jax.ShapeDtypeStruct(
            (b + pb, cch, num_chunks * chunk_frames), wav.dtype),
        scratch_shapes=[
            pltpu.VMEM((_ITEMS, cch), jnp.float32),
            pltpu.VMEM((_ITEMS, cch), jnp.float32),
        ],
        # v5e has 128 MB VMEM; the compiler's 16 MB scoped default would
        # force tiny chunks (grid-step overhead then dominates)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024),
        interpret=interpret,
    )(ws1, ws2, wa, wb, scale[None, :], bias[None, :])

    return out[:b, :, :total_frames]
