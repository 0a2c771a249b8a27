"""HiFi-GAN vocoder (log-mel -> waveform), completing the TTS audio path.

Numerics contract: HF SpeechT5HifiGan (modeling_speecht5.py:3049-3233) —
conv_pre -> [leaky_relu -> conv-transpose upsample -> averaged multi-kernel
residual blocks] x4 -> leaky_relu -> conv_post -> tanh; optional
mean/scale input normalization.  All convs map to MXU-friendly
lax.conv_general_dilated calls (the transposed convs via lhs_dilation).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...ops import layers


@dataclasses.dataclass(frozen=True)
class HifiGanConfig:
    model_in_dim: int = 80
    sampling_rate: int = 16000
    upsample_initial_channel: int = 512
    upsample_rates: Tuple[int, ...] = (4, 4, 4, 4)
    upsample_kernel_sizes: Tuple[int, ...] = (8, 8, 8, 8)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    leaky_relu_slope: float = 0.1
    normalize_before: bool = True


def tiny_hifigan_config(**over) -> HifiGanConfig:
    base = dict(model_in_dim=8, upsample_initial_channel=16,
                upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
                resblock_kernel_sizes=(3, 7),
                resblock_dilation_sizes=((1, 3), (1, 3)))
    base.update(over)
    return HifiGanConfig(**base)


def hifigan_init(rng, cfg: HifiGanConfig, dtype=jnp.float32) -> Dict:
    ks = iter(jax.random.split(rng, 256))
    p: Dict = {
        "conv_pre": layers.conv1d_init(next(ks), cfg.model_in_dim,
                                       cfg.upsample_initial_channel, 7, dtype=dtype),
        "mean": jnp.zeros((cfg.model_in_dim,), dtype),
        "scale": jnp.ones((cfg.model_in_dim,), dtype),
        "upsampler": {},
        "resblocks": {},
    }
    num_kernels = len(cfg.resblock_kernel_sizes)
    for i, (rate, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        in_ch = cfg.upsample_initial_channel // (2 ** i)
        out_ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        # torch ConvTranspose1d weight layout: (in, out, k)
        scale = 1.0 / math.sqrt(in_ch * k)
        p["upsampler"][str(i)] = {
            "weight": jax.random.uniform(next(ks), (in_ch, out_ch, k), dtype,
                                         -scale, scale),
            "bias": jnp.zeros((out_ch,), dtype),
        }
        for j, (rk, dils) in enumerate(zip(cfg.resblock_kernel_sizes,
                                           cfg.resblock_dilation_sizes)):
            block = {"convs1": {}, "convs2": {}}
            for d_i, dil in enumerate(dils):
                block["convs1"][str(d_i)] = layers.conv1d_init(
                    next(ks), out_ch, out_ch, rk, dtype=dtype)
                block["convs2"][str(d_i)] = layers.conv1d_init(
                    next(ks), out_ch, out_ch, rk, dtype=dtype)
            p["resblocks"][str(i * num_kernels + j)] = block
    last_ch = cfg.upsample_initial_channel // (2 ** len(cfg.upsample_rates))
    p["conv_post"] = layers.conv1d_init(next(ks), last_ch, 1, 7, dtype=dtype)
    return p


def _conv_transpose1d(p: Dict, x: jnp.ndarray, *, stride: int,
                      padding: int) -> jnp.ndarray:
    """torch ConvTranspose1d on [B, C, T] with (in, out, k) weights."""
    w = p["weight"]
    k = w.shape[-1]
    # transpose to OIH and flip the kernel; lhs_dilation realizes the stride
    w_conv = jnp.flip(w.transpose(1, 0, 2), axis=-1)
    y = jax.lax.conv_general_dilated(
        x, w_conv.astype(x.dtype),
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"))
    return y + p["bias"][None, :, None].astype(y.dtype)


def _leaky(x: jnp.ndarray, slope: float) -> jnp.ndarray:
    return jnp.where(x >= 0, x, slope * x)


def _resblock(p: Dict, cfg: HifiGanConfig, x: jnp.ndarray, kernel: int,
              dilations: Sequence[int]) -> jnp.ndarray:
    for d_i, dil in enumerate(dilations):
        residual = x
        h = _leaky(x, cfg.leaky_relu_slope)
        pad = (kernel * dil - dil) // 2
        h = jax.lax.conv_general_dilated(
            h, p["convs1"][str(d_i)]["weight"].astype(h.dtype), (1,),
            [(pad, pad)], rhs_dilation=(dil,),
            dimension_numbers=("NCH", "OIH", "NCH"))
        h = h + p["convs1"][str(d_i)]["bias"][None, :, None]
        h = _leaky(h, cfg.leaky_relu_slope)
        pad1 = (kernel - 1) // 2
        h = jax.lax.conv_general_dilated(
            h, p["convs2"][str(d_i)]["weight"].astype(h.dtype), (1,),
            [(pad1, pad1)], dimension_numbers=("NCH", "OIH", "NCH"))
        h = h + p["convs2"][str(d_i)]["bias"][None, :, None]
        x = h + residual
    return x


def hifigan(params: Dict, cfg: HifiGanConfig,
            spectrogram: jnp.ndarray) -> jnp.ndarray:
    """[B, T, mel] (or [T, mel]) log-mel -> waveform [B, T*prod(rates)]."""
    batched = spectrogram.ndim == 3
    if not batched:
        spectrogram = spectrogram[None]
    if cfg.normalize_before:
        spectrogram = (spectrogram - params["mean"]) / params["scale"]
    x = spectrogram.transpose(0, 2, 1)
    x = layers.conv1d(params["conv_pre"], x, padding=3)
    num_kernels = len(cfg.resblock_kernel_sizes)
    for i, (rate, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = _leaky(x, cfg.leaky_relu_slope)
        x = _conv_transpose1d(params["upsampler"][str(i)], x,
                              stride=rate, padding=(k - rate) // 2)
        acc = None
        for j, (rk, dils) in enumerate(zip(cfg.resblock_kernel_sizes,
                                           cfg.resblock_dilation_sizes)):
            r = _resblock(params["resblocks"][str(i * num_kernels + j)],
                          cfg, x, rk, dils)
            acc = r if acc is None else acc + r
        x = acc / num_kernels
    x = _leaky(x, 0.01)  # torch F.leaky_relu default slope (HF omits the slope here)
    x = layers.conv1d(params["conv_post"], x, padding=3)
    x = jnp.tanh(x)
    wav = x[:, 0, :]
    return wav if batched else wav[0]


def load_hf_hifigan(state_dict) -> Dict:
    """HF SpeechT5HifiGan state dict -> our tree (conv layouts identical)."""
    import numpy as np

    from ...utils.pytree import unflatten_from_paths

    flat = {}
    for key, v in state_dict.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        k = key.replace("parametrizations.weight.original0", "weight_g") \
               .replace("parametrizations.weight.original1", "weight_v")
        flat[k] = arr
    # collapse any weight-norm pairs into plain weights
    for k in [k for k in list(flat) if k.endswith("weight_v")]:
        base = k[: -len("weight_v")]
        v = flat.pop(k)
        g = flat.pop(base + "weight_g")
        axes = tuple(i for i in range(v.ndim) if i != 0)
        norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
        flat[base + "weight"] = g * v / norm
    return unflatten_from_paths(flat)
