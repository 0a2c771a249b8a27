"""Audio front-end: decode, resample, STFT, log-mel, SpecAugment.

Replaces the reference's implicit native audio stack (librosa/libsndfile/
soxr decode+resample at extract_*.py:56 and slurp_data.py:44, sph2pipe for
Fisher SPHERE files at data/fisher/scripts/fisher_data_prep.sh:165-175) with
first-party code:

  * WAV / NIST SPHERE readers (numpy host path; loco_asr_tpu.native has a
    C++ fast path for batch ingest).
  * Windowed-sinc polyphase resampler (host, numpy) for non-16k sources.
  * STFT -> log-mel filterbank in JAX, numerics-matched to the HF SpeechT5
    feature extractor (hann periodic window, center/reflect padding,
    magnitude spectrogram, slaney mel filters, log10 with 1e-10 floor).
  * SpecAugment mask sampling (wav2vec2 _compute_mask_indices semantics) in
    pure JAX for on-device augmentation.

The device path (stft/log_mel) is jit-compatible with static shapes; see
ops/pallas/logmel.py for the fused Pallas kernel used on the hot path.
"""

from __future__ import annotations

import math
import wave
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Decoding: WAV + NIST SPHERE (sph2pipe replacement)
# ---------------------------------------------------------------------------

_ULAW_BIAS = 0x84


def ulaw_to_linear(u: np.ndarray) -> np.ndarray:
    """mu-law byte -> int16 PCM (G.711, matches sph2pipe's table)."""
    u = ~u.astype(np.uint8)
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    sample = ((mantissa.astype(np.int32) << 3) + _ULAW_BIAS) << exponent
    sample -= _ULAW_BIAS
    return np.where(sign != 0, -sample, sample).astype(np.int16)


def alaw_to_linear(a: np.ndarray) -> np.ndarray:
    """A-law byte -> int16 PCM (G.711)."""
    a = a.astype(np.uint8) ^ 0x55
    sign = a & 0x80
    exponent = (a >> 4) & 0x07
    mantissa = (a & 0x0F).astype(np.int32)
    sample = (mantissa << 4) + 8
    sample = np.where(exponent > 0, (sample + 0x100) << (exponent - 1), sample)
    return np.where(sign != 0, -sample, sample).astype(np.int16)


def read_sphere(path: str, channel: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """Read a NIST SPHERE file -> (float32 waveform in [-1, 1], sample_rate).

    Supports ulaw / alaw / pcm (1-2 bytes) and 1-2 channels; ``channel``
    selects 0-based channel (sph2pipe -c 1/-c 2 equivalent with channel=0/1).
    Shorten-compressed SPHERE ("embedded-shorten-v2.xx", the common LDC
    telephone-corpus coding sph2pipe decompresses) is decoded first-party
    via ops/shorten (native/loco_audio.cc has the fast path).
    """
    with open(path, "rb") as f:
        magic = f.read(8)
        if not magic.startswith(b"NIST_1A"):
            raise ValueError(f"{path}: not a NIST SPHERE file")
        header_size = int(f.read(8).strip())
        f.seek(0)
        header = f.read(header_size).decode("ascii", errors="replace")
        fields = {}
        for line in header.splitlines()[2:]:
            line = line.strip()
            if line == "end_head" or not line:
                break
            parts = line.split(None, 2)
            if len(parts) == 3:
                name, typ, value = parts
                fields[name] = int(value) if typ.startswith("-i") else value
        n_channels = int(fields.get("channel_count", 1))
        sample_rate = int(fields.get("sample_rate", 8000))
        n_bytes = int(fields.get("sample_n_bytes", 2))
        encoding = str(fields.get("sample_coding", "pcm"))
        byte_format = str(fields.get("sample_byte_format", "01"))
        sample_count = fields.get("sample_count")
        f.seek(header_size)
        raw = f.read()

    if "shorten" in encoding:
        from . import shorten as shn
        samples, ftype = shn.decode(raw, max_samples=sample_count)
        vals = shn.internal_to_float(samples, ftype)  # [n, nchan]
        if sample_count:
            vals = vals[:sample_count]
        if vals.shape[1] != n_channels:
            raise ValueError(
                f"{path}: shorten stream has {vals.shape[1]} channels, "
                f"header says {n_channels}")
        if n_channels > 1:
            vals = vals[:, channel] if channel is not None else vals.mean(axis=1)
        else:
            vals = vals[:, 0]
        return np.ascontiguousarray(vals, np.float32), sample_rate

    if encoding.startswith("ulaw") or encoding.startswith("mu-law"):
        pcm = ulaw_to_linear(np.frombuffer(raw, np.uint8))
    elif encoding.startswith("alaw"):
        pcm = alaw_to_linear(np.frombuffer(raw, np.uint8))
    else:  # linear pcm
        dtype = np.dtype(np.int16 if n_bytes == 2 else np.int8)
        if n_bytes == 2 and byte_format == "10":
            dtype = dtype.newbyteorder(">")
        pcm = np.frombuffer(raw, dtype).astype(np.int16)

    if n_channels > 1:
        pcm = pcm[: (len(pcm) // n_channels) * n_channels].reshape(-1, n_channels)
        pcm = pcm[:, channel] if channel is not None else pcm.mean(axis=1).astype(np.int16)
    return pcm.astype(np.float32) / 32768.0, sample_rate


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a PCM WAV file -> (float32 mono waveform in [-1, 1], rate)."""
    with wave.open(path, "rb") as w:
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        pcm = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 1:
        pcm = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 4:
        pcm = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        val = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
               | (b[:, 2].astype(np.int32) << 16))
        val = np.where(val >= 1 << 23, val - (1 << 24), val)
        pcm = val.astype(np.float32) / float(1 << 23)
    else:
        raise ValueError(f"{path}: unsupported sample width {width}")
    if n_channels > 1:
        pcm = pcm.reshape(-1, n_channels).mean(axis=1)
    return pcm, rate


def load_audio(path: str, target_sr: int = 16000) -> Tuple[np.ndarray, int]:
    """Decode WAV/SPHERE (auto-detected) and resample to ``target_sr``.

    This is the framework's replacement for ``librosa.load(path, sr=16000)``
    (reference extract_*.py:56): float32 mono at the requested rate.
    """
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic.startswith(b"NIST_1A"):
        wav, sr = read_sphere(path)
    else:
        wav, sr = read_wav(path)
    if sr != target_sr:
        wav = resample(wav, sr, target_sr)
        sr = target_sr
    return wav, sr


# ---------------------------------------------------------------------------
# Resampling (host-side, polyphase windowed sinc)
# ---------------------------------------------------------------------------

def resample(x: np.ndarray, sr_in: int, sr_out: int, *, zeros: int = 32,
             rolloff: float = 0.945) -> np.ndarray:
    """Polyphase windowed-sinc resampler (Kaiser-windowed low-pass).

    Quality comparable to soxr/librosa 'kaiser_best'; host-side numpy since
    resampling is ingest work, not device work.
    """
    if sr_in == sr_out:
        return x
    g = math.gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    cutoff = rolloff * 0.5 * min(1.0, up / down)
    half_width = zeros / (2.0 * cutoff)
    taps_per_phase = int(2 * half_width) + 1
    t = (np.arange(taps_per_phase * up) - taps_per_phase * up // 2) / up
    kernel = 2 * cutoff * np.sinc(2 * cutoff * t) * np.kaiser(len(t), 14.0)
    # Upsample-filter-downsample via polyphase: insert zeros, convolve, decimate.
    y = np.zeros(len(x) * up, np.float32)
    y[::up] = x * up
    y = np.convolve(y, kernel.astype(np.float32), mode="same")
    return y[::down].astype(np.float32)


# ---------------------------------------------------------------------------
# STFT -> log-mel (device path; HF SpeechT5 feature-extractor parity)
# ---------------------------------------------------------------------------

def hann_window(length: int, periodic: bool = True) -> np.ndarray:
    n = length + 1 if periodic else length
    w = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n) / (n - 1)))
    return w[:length].astype(np.float64)


def hertz_to_mel_slaney(freq):
    freq = np.asarray(freq, np.float64)
    mels = 3.0 * freq / 200.0
    log_region = freq >= 1000.0
    logstep = 27.0 / np.log(6.4)
    return np.where(log_region, 15.0 + np.log(np.maximum(freq, 1e-10) / 1000.0) * logstep, mels)


def mel_to_hertz_slaney(mels):
    mels = np.asarray(mels, np.float64)
    freq = 200.0 * mels / 3.0
    log_region = mels >= 15.0
    logstep = np.log(6.4) / 27.0
    return np.where(log_region, 1000.0 * np.exp(logstep * (mels - 15.0)), freq)


def mel_filter_bank(num_frequency_bins: int, num_mel_filters: int,
                    min_frequency: float, max_frequency: float,
                    sampling_rate: int) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular mel filter bank.

    Numerics contract: transformers.audio_utils.mel_filter_bank(norm="slaney",
    mel_scale="slaney") as instantiated by SpeechT5FeatureExtractor.
    Returns [num_frequency_bins, num_mel_filters].
    """
    mel_min = hertz_to_mel_slaney(min_frequency)
    mel_max = hertz_to_mel_slaney(max_frequency)
    mel_freqs = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = mel_to_hertz_slaney(mel_freqs)
    fft_freqs = np.linspace(0, sampling_rate // 2, num_frequency_bins)

    filter_diff = np.diff(filter_freqs)
    slopes = filter_freqs[None, :] - fft_freqs[:, None]  # [bins, mels+2]
    down = -slopes[:, :-2] / filter_diff[:-1]
    up = slopes[:, 2:] / filter_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    enorm = 2.0 / (filter_freqs[2:] - filter_freqs[:-2])
    fb *= enorm[None, :]
    return fb.astype(np.float32)


def frame_signal(wav: jnp.ndarray, frame_length: int, hop: int,
                 center: bool = True) -> jnp.ndarray:
    """[.., T] waveform -> [.., frames, frame_length] with reflect padding."""
    if center:
        pad = frame_length // 2
        pad_cfg = [(0, 0)] * (wav.ndim - 1) + [(pad, pad)]
        wav = jnp.pad(wav, pad_cfg, mode="reflect")
    n = wav.shape[-1]
    num_frames = 1 + (n - frame_length) // hop
    idx = jnp.arange(num_frames)[:, None] * hop + jnp.arange(frame_length)[None, :]
    return wav[..., idx]


def log_mel_spectrogram(
    wav: jnp.ndarray,
    *,
    sampling_rate: int = 16000,
    frame_length: int = 1024,
    hop: int = 256,
    fft_length: int = 1024,
    num_mel_bins: int = 80,
    fmin: float = 80.0,
    fmax: float = 7600.0,
    mel_floor: float = 1e-10,
    window: Optional[np.ndarray] = None,
    mel_filters: Optional[np.ndarray] = None,
) -> jnp.ndarray:
    """Waveform [.., T] -> log10-mel [.., frames, num_mel_bins].

    Default parameters replicate SpeechT5FeatureExtractor (64 ms hann window,
    16 ms hop, magnitude spectrogram, slaney mels, log10 with 1e-10 floor).
    jit-compatible; this is the XLA reference path, the fused Pallas kernel
    lives in ops/pallas/logmel.py.
    """
    if window is None:
        window = hann_window(frame_length, periodic=True)
    if mel_filters is None:
        mel_filters = mel_filter_bank(fft_length // 2 + 1, num_mel_bins, fmin,
                                      fmax, sampling_rate)
    frames = frame_signal(wav.astype(jnp.float32), frame_length, hop, center=True)
    frames = frames * jnp.asarray(window)
    spec = jnp.abs(jnp.fft.rfft(frames, n=fft_length, axis=-1))
    mel = jnp.maximum(spec @ jnp.asarray(mel_filters, spec.dtype), mel_floor)
    return jnp.log10(mel).astype(jnp.float32)


def zero_mean_unit_var(wav: jnp.ndarray, length: Optional[jnp.ndarray] = None,
                       eps: float = 1e-7) -> jnp.ndarray:
    """Per-utterance normalization over the first ``length`` samples
    (Wav2Vec2/SpeechT5 feature-extractor do_normalize semantics); padded
    tail is zeroed."""
    if length is None:
        mean = jnp.mean(wav, axis=-1, keepdims=True)
        var = jnp.var(wav, axis=-1, keepdims=True)
        return (wav - mean) / jnp.sqrt(var + eps)
    t = wav.shape[-1]
    mask = (jnp.arange(t)[None, :] < length[:, None]).astype(wav.dtype)
    n = jnp.maximum(length[:, None].astype(wav.dtype), 1.0)
    mean = jnp.sum(wav * mask, -1, keepdims=True) / n
    var = jnp.sum(jnp.square(wav - mean) * mask, -1, keepdims=True) / n
    return (wav - mean) / jnp.sqrt(var + eps) * mask


# ---------------------------------------------------------------------------
# SpecAugment (on-device mask sampling)
# ---------------------------------------------------------------------------

def compute_mask_indices(
    rng: jax.Array,
    shape: Tuple[int, int],
    mask_prob: float,
    mask_length: int,
    lengths: Optional[jnp.ndarray] = None,
    min_masks: int = 0,
) -> jnp.ndarray:
    """Sample SpecAugment span masks, [B, T] bool.

    Behavioral contract of wav2vec2's _compute_mask_indices (used by the
    SpeechT5 speech prenet for mask_time/mask_feature): approximately
    ``mask_prob * T / mask_length`` spans of length ``mask_length`` per row,
    clipped to the per-row valid length.  Implemented vectorized in JAX.
    """
    b, t = shape
    if lengths is None:
        lengths = jnp.full((b,), t)
    num_spans = jnp.maximum(
        (mask_prob * lengths.astype(jnp.float32) / mask_length + jax.random.uniform(rng, (b,))).astype(jnp.int32),
        min_masks,
    )
    max_spans = int(mask_prob * t / mask_length + 1) + min_masks
    starts_rng = jax.random.split(rng, 2)[1]
    span_max = jnp.maximum(lengths - mask_length, 1)[:, None]
    starts = (jax.random.uniform(starts_rng, (b, max_spans)) * span_max).astype(jnp.int32)
    span_active = jnp.arange(max_spans)[None, :] < num_spans[:, None]
    pos = jnp.arange(t)[None, None, :]
    in_span = (pos >= starts[..., None]) & (pos < (starts + mask_length)[..., None])
    mask = jnp.any(in_span & span_active[..., None], axis=1)
    valid = jnp.arange(t)[None, :] < lengths[:, None]
    return mask & valid
