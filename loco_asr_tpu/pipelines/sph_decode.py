"""sph2pipe-compatible CLI: decode NIST SPHERE to WAV on stdout.

Drop-in for the wav.scp command pipes the reference emits
(fisher_data_prep.sh:172-174: ``sph2pipe -f wav -p -c {1,2} file |``).
Channels are 1-based like sph2pipe's -c.  Uses the native C++ decoder when
available, numpy otherwise.
"""

from __future__ import annotations

import argparse
import struct
import sys


def wav_header(n_samples: int, sample_rate: int, channels: int = 1,
               bits: int = 16) -> bytes:
    byte_rate = sample_rate * channels * bits // 8
    block_align = channels * bits // 8
    data_size = n_samples * block_align
    return (b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate,
                                    byte_rate, block_align, bits)
            + b"data" + struct.pack("<I", data_size))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="SPHERE -> WAV decoder (sph2pipe replacement)")
    p.add_argument("-c", "--channel", type=int, default=None,
                   help="1-based channel (sph2pipe convention); default: mix")
    p.add_argument("-f", "--format", default="wav", choices=["wav", "raw"],
                   help="kept for sph2pipe CLI parity")
    p.add_argument("-p", action="store_true",
                   help="force PCM output (sph2pipe parity; always on here)")
    p.add_argument("sph", help="input .sph file")
    p.add_argument("out", nargs="?", default=None,
                   help="output file (default: stdout)")
    args = p.parse_args(argv)

    import numpy as np

    channel = None if args.channel is None else args.channel - 1
    try:
        from .. import native
        if native.available():
            wav, rate = native.read_sphere(args.sph, channel)
        else:
            raise RuntimeError
    except Exception:
        from ..ops.audio import read_sphere
        wav, rate = read_sphere(args.sph, channel)

    pcm = np.clip(wav * 32768.0, -32768, 32767).astype("<i2")
    out = sys.stdout.buffer if args.out is None else open(args.out, "wb")
    try:
        if args.format == "wav":
            out.write(wav_header(len(pcm), rate))
        out.write(pcm.tobytes())
    finally:
        if args.out is not None:
            out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
