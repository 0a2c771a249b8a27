"""Native C++ audio core: build, decode parity vs the numpy path, resample
parity, and the sph_decode CLI."""

import io
import os
import subprocess
import sys
import wave

import numpy as np
import pytest

from loco_asr_tpu import native
from loco_asr_tpu.ops import audio

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def _write_sphere(path, pcm16, rate=8000, channels=1, encoding="pcm"):
    from tests.test_audio import _linear_to_ulaw  # reuse the encoder

    if encoding == "ulaw":
        data = _linear_to_ulaw(pcm16).tobytes()
        n_bytes = 1
    else:
        data = pcm16.tobytes()
        n_bytes = 2
    header = (
        "NIST_1A\n   1024\n"
        f"sample_rate -i {rate}\n"
        f"channel_count -i {channels}\n"
        f"sample_n_bytes -i {n_bytes}\n"
        f"sample_coding -s4 {'ulaw' if encoding == 'ulaw' else 'pcm'}\n"
        "sample_byte_format -s2 01\n"
        "end_head\n")
    with open(path, "wb") as f:
        f.write(header.encode().ljust(1024, b" "))
        f.write(data)


def test_native_sphere_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    t = np.arange(1000)
    ch_a = (np.sin(2 * np.pi * t / 80) * 10000).astype(np.int16)
    ch_b = (rng.standard_normal(1000) * 5000).astype(np.int16)
    inter = np.empty(2000, np.int16)
    inter[0::2], inter[1::2] = ch_a, ch_b
    p = str(tmp_path / "x.sph")
    _write_sphere(p, inter, channels=2)

    for ch in (0, 1):
        nat, rate_n = native.read_sphere(p, ch)
        ref, rate_r = audio.read_sphere(p, ch)
        assert rate_n == rate_r == 8000
        np.testing.assert_allclose(nat, ref, atol=1e-6)


def test_native_sphere_ulaw(tmp_path):
    rng = np.random.default_rng(1)
    pcm = (rng.standard_normal(400) * 6000).astype(np.int16)
    p = str(tmp_path / "u.sph")
    _write_sphere(p, pcm, encoding="ulaw")
    nat, _ = native.read_sphere(p)
    ref, _ = audio.read_sphere(p)
    np.testing.assert_allclose(nat, ref, atol=1e-6)


def test_native_wav_matches_numpy(tmp_path):
    rng = np.random.default_rng(2)
    pcm = (rng.standard_normal(1500) * 9000).astype(np.int16)
    p = str(tmp_path / "a.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    nat, rate = native.read_wav(p)
    ref, _ = audio.read_wav(p)
    assert rate == 16000
    np.testing.assert_allclose(nat, ref, atol=1e-6)


def test_native_resample_matches_numpy():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(4000).astype(np.float32)
    nat = native.resample(x, 8000, 16000)
    ref = audio.resample(x, 8000, 16000)
    assert abs(len(nat) - len(ref)) <= 1
    n = min(len(nat), len(ref))
    # interior parity (edges differ by convolution boundary handling)
    np.testing.assert_allclose(nat[100:n - 100], ref[100:n - 100],
                               atol=2e-4, rtol=1e-3)


def test_sph_decode_cli(tmp_path):
    t = np.arange(800)
    ch_a = (np.sin(2 * np.pi * t / 80) * 10000).astype(np.int16)
    ch_b = (np.cos(2 * np.pi * t / 40) * 5000).astype(np.int16)
    inter = np.empty(1600, np.int16)
    inter[0::2], inter[1::2] = ch_a, ch_b
    p = str(tmp_path / "x.sph")
    _write_sphere(p, inter, channels=2)

    out = subprocess.run(
        [sys.executable, "-m", "loco_asr_tpu.pipelines.sph_decode",
         "-f", "wav", "-p", "-c", "1", p],
        capture_output=True, check=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    with wave.open(io.BytesIO(out.stdout)) as w:
        assert w.getframerate() == 8000
        decoded = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    np.testing.assert_allclose(decoded, ch_a, atol=1)
