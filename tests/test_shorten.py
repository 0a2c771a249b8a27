"""Shorten codec tests: encoder/decoder roundtrip over every command the
format defines, Python-vs-C++ decoder cross-check, and end-to-end
"embedded-shorten" SPHERE decode (the coding sph2pipe handles for real LDC
corpora, /root/reference/data/fisher/scripts/fisher_data_prep.sh:172-174).

No shorten binary or sph2pipe exists in this environment, so the bitstream
is pinned three ways: (1) the published spec constants, (2) roundtrip
through our own encoder, (3) bit-exact agreement between two independent
implementations (ops/shorten.py and native/loco_audio.cc).
"""

import numpy as np
import pytest

from loco_asr_tpu import native
from loco_asr_tpu.ops import audio
from loco_asr_tpu.ops import shorten as shn


def _signal(n=1500, nchan=2, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    cols = [(3000 * np.sin(t / (17 + 5 * c))
             + rng.integers(-60, 60, n)).astype(np.int32)
            for c in range(nchan)]
    return np.stack(cols, axis=1)


@pytest.mark.parametrize("commands", [
    None,
    [shn.FN_DIFF0],
    [shn.FN_DIFF1],
    [shn.FN_DIFF2],
    [shn.FN_DIFF3],
    [shn.FN_DIFF0, shn.FN_DIFF1, shn.FN_DIFF2, shn.FN_DIFF3],
])
def test_roundtrip_diff_commands(commands):
    x = _signal()
    data = shn.encode(x, shn.TYPE_S16LH, blocksize=256, commands=commands)
    dec, ftype = shn.decode(data)
    assert ftype == shn.TYPE_S16LH
    np.testing.assert_array_equal(dec, x)


def test_roundtrip_qlpc_with_means():
    x = _signal(seed=3)
    data = shn.encode(x, shn.TYPE_S16LH, nmean=4, maxnlpc=3,
                      qlpc=[60, -30, 5],
                      commands=[shn.FN_QLPC, shn.FN_DIFF1])
    dec, _ = shn.decode(data)
    np.testing.assert_array_equal(dec, x)


def test_roundtrip_bitshift():
    x = (_signal(seed=4) >> 3) << 3
    data = shn.encode(x, shn.TYPE_S16LH, bitshift=3, nmean=2)
    dec, _ = shn.decode(data)
    np.testing.assert_array_equal(dec, x)


def test_roundtrip_zero_blocks_and_verbatim():
    x = np.zeros((700, 1), np.int32)
    data = shn.encode(x, shn.TYPE_S16LH, commands=[shn.FN_ZERO],
                      verbatim=b"NIST_1A original header bytes")
    dec, _ = shn.decode(data)
    np.testing.assert_array_equal(dec, x)


def test_roundtrip_partial_final_block_changes_blocksize():
    x = _signal(n=777, nchan=1)  # 777 % 256 != 0 -> FN_BLOCKSIZE emitted
    data = shn.encode(x, shn.TYPE_S16LH, blocksize=256)
    dec, _ = shn.decode(data)
    np.testing.assert_array_equal(dec, x)


def test_roundtrip_unsigned_types():
    rng = np.random.default_rng(5)
    x8 = rng.integers(0, 256, (400, 1)).astype(np.int32)
    dec, _ = shn.decode(shn.encode(x8, shn.TYPE_U8))
    np.testing.assert_array_equal(dec, x8)
    f = shn.internal_to_float(dec, shn.TYPE_U8)
    assert f.min() >= -1.0 and f.max() <= 1.0

    x16 = rng.integers(0, 65536, (400, 1)).astype(np.int32)
    dec, _ = shn.decode(shn.encode(x16, shn.TYPE_U16LH))
    np.testing.assert_array_equal(dec, x16)


def test_roundtrip_ulaw_internal_domain():
    rng = np.random.default_rng(6)
    ub = rng.integers(0, 256, (600, 2)).astype(np.uint8)
    lin = np.stack([shn.ulaw_bytes_to_internal(ub[:, 0]),
                    shn.ulaw_bytes_to_internal(ub[:, 1])], axis=1)
    dec, ftype = shn.decode(shn.encode(lin, shn.TYPE_AU2, nmean=4))
    np.testing.assert_array_equal(dec, lin)
    # linear output equals the G.711 expansion sph2pipe would emit
    f = shn.internal_to_float(dec, ftype)
    np.testing.assert_array_equal(
        f[:, 0], audio.ulaw_to_linear(ub[:, 0]).astype(np.float32) / 32768.0)


def _write_shorten_sphere(path, stream, nchan, n, rate=8000,
                          coding="ulaw,embedded-shorten-v2.00"):
    hdr = (f"NIST_1A\n   1024\nsample_rate -i {rate}\n"
           f"channel_count -i {nchan}\nsample_count -i {n}\n"
           f"sample_n_bytes -i 1\n"
           f"sample_coding -s{len(coding)} {coding}\nend_head\n")
    with open(path, "wb") as f:
        f.write(hdr.encode().ljust(1024, b" "))
        f.write(stream)


@pytest.fixture(scope="module")
def shorten_sphere(tmp_path_factory):
    rng = np.random.default_rng(1)
    n = 3000
    t = np.arange(n)
    ub = np.stack([
        np.clip(np.sin(t / 30) * 80 + 90 + rng.integers(-3, 3, n), 0, 255),
        np.clip(np.cos(t / 25) * 70 + 100 + rng.integers(-3, 3, n), 0, 255),
    ], axis=1).astype(np.uint8)
    lin = np.stack([shn.ulaw_bytes_to_internal(ub[:, 0]),
                    shn.ulaw_bytes_to_internal(ub[:, 1])], axis=1)
    stream = shn.encode(
        lin, shn.TYPE_AU2, nmean=4, maxnlpc=3, qlpc=[60, -30, 5],
        commands=[shn.FN_DIFF1, shn.FN_QLPC, shn.FN_DIFF2, shn.FN_DIFF3,
                  shn.FN_DIFF0],
        verbatim=b"NIST_1A header copy")
    path = tmp_path_factory.mktemp("shn") / "conv.sph"
    _write_shorten_sphere(str(path), stream, 2, n)
    return str(path), lin


def test_embedded_shorten_sphere_python(shorten_sphere):
    path, lin = shorten_sphere
    for ch in (0, 1):
        wav, sr = audio.read_sphere(path, channel=ch)
        assert sr == 8000
        np.testing.assert_array_equal(
            wav, lin[:, ch].astype(np.float32) / 32768.0)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_embedded_shorten_sphere_native_matches_python(shorten_sphere):
    path, lin = shorten_sphere
    for ch in (0, 1):
        wav_py, _ = audio.read_sphere(path, channel=ch)
        wav_c, sr = native.read_sphere(path, channel=ch)
        assert sr == 8000
        np.testing.assert_array_equal(wav_c, wav_py)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_info_reports_sample_count(shorten_sphere):
    import ctypes
    path, lin = shorten_sphere
    lib = native.load()
    r, c, n = ctypes.c_int32(), ctypes.c_int32(), ctypes.c_int64()
    rc = lib.la_sphere_info(path.encode(), ctypes.byref(r), ctypes.byref(c),
                            ctypes.byref(n))
    assert rc == 0 and (r.value, c.value, n.value) == (8000, 2, len(lin))


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_pcm_shorten_cross_check():
    """S16 shorten payload: C++ and Python decoders agree bit-for-bit."""
    x = _signal(n=2000, nchan=1, seed=9)
    stream = shn.encode(x, shn.TYPE_S16LH, nmean=2,
                        commands=[shn.FN_DIFF2, shn.FN_DIFF3])
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "pcm.sph")
        _write_shorten_sphere(path, stream, 1, len(x),
                              coding="pcm,embedded-shorten-v2.00")
        wav_py, _ = audio.read_sphere(path)
        wav_c, _ = native.read_sphere(path)
    np.testing.assert_array_equal(wav_py, x[:, 0].astype(np.float32) / 32768.0)
    np.testing.assert_array_equal(wav_c, wav_py)


def test_truncated_stream_raises():
    x = _signal(n=500, nchan=1)
    data = shn.encode(x, shn.TYPE_S16LH)
    with pytest.raises(shn.ShortenError):
        shn.decode(data[:20])


def test_bad_magic_raises():
    with pytest.raises(shn.ShortenError):
        shn.decode(b"\x00" * 64)


def test_native_no_sample_count_estimate_and_grow(tmp_path):
    """A shorten SPHERE without a sample_count header: la_sphere_info must
    return an estimate (rc=1) WITHOUT decoding, and read_sphere must grow
    its buffer until the single decode fits, returning exact audio."""
    from loco_asr_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    n = 2000
    ub = np.clip(rng.integers(0, 255, (n, 1)), 0, 255).astype(np.uint8)
    lin = shn.ulaw_bytes_to_internal(ub[:, 0])[:, None]
    stream = shn.encode(lin, shn.TYPE_AU2, nmean=4, maxnlpc=0,
                        commands=[shn.FN_DIFF1, shn.FN_DIFF2])
    path = tmp_path / "nocount.sph"
    coding = "ulaw,embedded-shorten-v2.00"
    hdr = (f"NIST_1A\n   1024\nsample_rate -i 8000\n"
           f"channel_count -i 1\nsample_n_bytes -i 1\n"
           f"sample_coding -s{len(coding)} {coding}\nend_head\n")
    with open(path, "wb") as f:
        f.write(hdr.encode().ljust(1024, b" "))
        f.write(stream)

    out, rate = native.read_sphere(str(path))
    assert rate == 8000 and len(out) == n
    want = shn.internal_to_float(lin, shn.TYPE_AU2)[:, 0]
    np.testing.assert_allclose(out, want, atol=1e-6)
