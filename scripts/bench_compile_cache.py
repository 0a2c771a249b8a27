"""Measure the persistent-compilation-cache win (VERDICT r2 item 4).

Runs ONE full-size encoder jit in this process and reports
  - wall seconds from process start to first completed forward
    (includes backend init + relay compile), and
  - whether the persistent cache was enabled and where.

Drive it twice against a fresh cache dir to measure cold vs warm:

    rm -rf /tmp/loco_cc_probe
    LOCO_COMPILE_CACHE_DIR=/tmp/loco_cc_probe python scripts/bench_compile_cache.py
    LOCO_COMPILE_CACHE_DIR=/tmp/loco_cc_probe python scripts/bench_compile_cache.py

The delta between the two "first_forward_s" numbers is the compile time
the cache saves on every subsequent process start of the same program
(docs/BENCH.md round-3 section records the measured pair).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.perf_counter()


def main() -> int:
    import numpy as np

    from loco_asr_tpu.pipelines.common import setup_compilation_cache

    cache_dir = setup_compilation_cache()

    import jax
    import jax.numpy as jnp

    from loco_asr_tpu.models.speecht5 import model as st5
    from loco_asr_tpu.models.speecht5.config import SpeechT5Config

    cfg = SpeechT5Config()
    params = st5.asr_init(jax.random.PRNGKey(0), cfg)
    fwd = jax.jit(lambda p, w, m: st5.encode_speech(p, cfg, w, m)[0])
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((16, 80000)).astype(np.float32) * 0.1)
    mask = jnp.ones(wav.shape, jnp.int32)

    t_pre = time.perf_counter() - T0
    out = fwd(params, wav, mask)
    float(out.sum())  # real host sync (relay acks block_until_ready at dispatch)
    t_first = time.perf_counter() - T0

    n_entries = len(os.listdir(cache_dir)) if cache_dir else 0
    print(json.dumps({
        "backend": jax.default_backend(),
        "cache_dir": cache_dir,
        "cache_entries_after": n_entries,
        "setup_s": round(t_pre, 2),
        "first_forward_s": round(t_first, 2),
        "compile_plus_run_s": round(t_first - t_pre, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
