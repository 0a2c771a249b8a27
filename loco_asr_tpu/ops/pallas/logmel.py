"""Fused log-mel front-end Pallas kernel.

Replaces the host-side librosa/HF-processor feature path (reference
extract_*.py:59-60 hot loop #1) with one device kernel per frame block:
window multiply (VPU) -> DFT as two matmuls against cos/sin bases (MXU;
XLA's TPU FFT is far slower than MXU matmul at n_fft=1024) -> magnitude ->
mel filterbank matmul -> log10.  Numerics match ops/audio.log_mel_spectrogram
(and therefore the HF SpeechT5 extractor) to ~1e-4.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .. import audio


@functools.lru_cache(maxsize=4)
def _constants(sampling_rate: int, frame_length: int, fft_length: int,
               num_mel_bins: int, fmin: float, fmax: float
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    window = audio.hann_window(frame_length, periodic=True).astype(np.float32)
    n_freqs = fft_length // 2 + 1
    t = np.arange(frame_length)[:, None]
    f = np.arange(n_freqs)[None, :]
    angle = 2.0 * np.pi * t * f / fft_length
    cos = np.cos(angle).astype(np.float32)          # [L, F]
    sin = -np.sin(angle).astype(np.float32)         # rfft convention
    mel = audio.mel_filter_bank(n_freqs, num_mel_bins, fmin, fmax,
                                sampling_rate)      # [F, M]
    return window, cos, sin, mel


def _logmel_kernel(frames_ref, window_ref, cos_ref, sin_ref, mel_ref, out_ref,
                   *, mel_floor: float):
    x = frames_ref[:] * window_ref[:]                # [Bf, L] (VPU)
    re = jnp.dot(x, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(x, sin_ref[:], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)                # [Bf, F]
    mel = jnp.dot(mag, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log10(jnp.maximum(mel, mel_floor))


def fused_log_mel(
    wav: jnp.ndarray, *,
    sampling_rate: int = 16000, frame_length: int = 1024, hop: int = 256,
    fft_length: int = 1024, num_mel_bins: int = 80,
    fmin: float = 80.0, fmax: float = 7600.0, mel_floor: float = 1e-10,
    block_frames: int = 128, interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """[.., T] waveform -> [.., frames, num_mel_bins] log10-mel.

    Default parameters = SpeechT5 feature extractor; see
    ops/audio.log_mel_spectrogram for the XLA reference implementation.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    window, cos, sin, mel = _constants(sampling_rate, frame_length,
                                       fft_length, num_mel_bins, fmin, fmax)
    lead = wav.shape[:-1]
    frames = audio.frame_signal(wav.astype(jnp.float32), frame_length, hop,
                                center=True)
    n = frames.shape[-2]
    flat = frames.reshape(-1, frame_length)          # [N, L]
    total = flat.shape[0]
    pad = -total % block_frames
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_logmel_kernel, mel_floor=mel_floor),
        grid=(flat.shape[0] // block_frames,),
        in_specs=[
            pl.BlockSpec((block_frames, frame_length), lambda i: (i, 0)),
            pl.BlockSpec((1, frame_length), lambda i: (0, 0)),
            pl.BlockSpec(cos.shape, lambda i: (0, 0)),
            pl.BlockSpec(sin.shape, lambda i: (0, 0)),
            pl.BlockSpec(mel.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_frames, num_mel_bins), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((flat.shape[0], num_mel_bins),
                                       jnp.float32),
        interpret=interpret,
    )(flat, jnp.asarray(window)[None, :], jnp.asarray(cos), jnp.asarray(sin),
      jnp.asarray(mel))

    return out[:total].reshape(*lead, n, num_mel_bins)
