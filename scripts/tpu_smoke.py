"""TPU hardware smoke suite: compile + run every Pallas kernel and the
flagship model paths on the real chip.

Interpret-mode tests cannot catch Mosaic lowering constraints (block
tiling rules, unsupported primitives) — this script is the hardware-side
complement to tests/.  Prints one PASS/FAIL line per check; exits nonzero
on any failure.

Usage: python scripts/tpu_smoke.py
"""

import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check(name, fn):
    try:
        fn()
        print(f"PASS {name}")
        return True
    except Exception:
        print(f"FAIL {name}")
        traceback.print_exc()
        return False


def main() -> int:
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    ok = True
    rng = np.random.default_rng(0)

    def flash():
        from loco_asr_tpu.ops.pallas import flash_attention

        q = jnp.asarray(rng.standard_normal((1, 4, 512, 64)).astype(np.float32))
        out = jax.jit(lambda q: flash_attention(q, q, q, causal=True))(q)
        assert bool(jnp.isfinite(out).all())

    def flash_grad():
        from loco_asr_tpu.ops.pallas import flash_attention

        q = jnp.asarray(rng.standard_normal((1, 2, 256, 64)).astype(np.float32))
        g = jax.jit(jax.grad(lambda q: flash_attention(q, q, q).sum()))(q)
        assert bool(jnp.isfinite(g).all())

    def flash_nhd():
        # [B, T, H, D] in-place layout path: Mosaic must lower the
        # (1, block, 1, D) BlockSpecs and match the flat-BH numbers
        from loco_asr_tpu.ops.pallas import (flash_attention,
                                             flash_attention_nhd)

        q = jnp.asarray(rng.standard_normal((2, 512, 4, 64))
                        .astype(np.float32) * 0.3)
        out = jax.jit(lambda q: flash_attention_nhd(q, q, q,
                                                    causal=True))(q)
        tr = lambda x: x.transpose(0, 2, 1, 3)
        want = jax.jit(lambda q: flash_attention(q, q, q,
                                                 causal=True))(tr(q))
        diff = float(jnp.abs(tr(out) - want).max())
        assert diff < 1e-5, f"nhd vs flat-BH diff {diff}"

    def logmel():
        from loco_asr_tpu.ops.pallas import fused_log_mel

        wav = jnp.asarray(rng.standard_normal((2, 32000)).astype(np.float32))
        out = jax.jit(fused_log_mel)(wav)
        assert bool(jnp.isfinite(out).all())

    def conv_frontend():
        from loco_asr_tpu.ops.pallas.conv_frontend import conv1_instance_norm_gelu

        wav = jnp.asarray(rng.standard_normal((8, 16000)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((512, 1, 10)).astype(np.float32) * 0.1)
        out = jax.jit(lambda a, b: conv1_instance_norm_gelu(
            a, b, jnp.ones(512), jnp.zeros(512)))(wav, w)
        assert bool(jnp.isfinite(out).all())

    def encoder():
        from loco_asr_tpu.models.speecht5 import model as st5
        from loco_asr_tpu.models.speecht5.config import SpeechT5Config

        cfg = SpeechT5Config()
        params = st5.asr_init(jax.random.PRNGKey(0), cfg)
        wav = jnp.asarray(rng.standard_normal((2, 32000)).astype(np.float32) * 0.1)
        out, _ = jax.jit(lambda p, w: st5.encode_speech(p, cfg, w))(params, wav)
        assert bool(jnp.isfinite(out).all())

    def decode():
        from loco_asr_tpu.decode.beam import beam_search
        from loco_asr_tpu.models.speecht5 import model as st5
        from loco_asr_tpu.models.speecht5.config import tiny_config

        cfg = tiny_config(apply_spec_augment=False)
        params = st5.asr_init(jax.random.PRNGKey(0), cfg)
        wav = jnp.asarray(rng.standard_normal((2, 1600)).astype(np.float32) * 0.1)
        enc, mask = st5.encode_speech(params, cfg, wav)
        hyp = jax.jit(lambda p, e, m: beam_search(
            p, cfg, e, m, beam_size=4, max_len=8))(params, enc, mask)
        assert bool((hyp.lengths <= 8).all())

    def flash_rel_long():
        # conversation-length rel-pos encoding: T=16k, beyond dense memory
        from loco_asr_tpu.ops.pallas import flash_attention

        T, L = 16384, 160
        q = jnp.asarray(rng.standard_normal((1, 4, T, 64)).astype(np.float32) * 0.1)
        pe = jnp.asarray(rng.standard_normal((2 * L, 64)).astype(np.float32) * 0.1)
        vl = jnp.asarray(np.array([T - 100], np.int32))
        out = jax.jit(lambda q, pe: flash_attention(
            q, q, q, causal=False, scale=64 ** -0.5, rel_pe=pe,
            kv_valid_len=vl))(q, pe)
        assert bool(jnp.isfinite(out).all())

    def flash_rel_parity():
        # on-chip parity vs the dense rel path at T=256
        from loco_asr_tpu.ops.pallas import flash_attention

        T, L = 256, 160
        q = jnp.asarray(rng.standard_normal((2, 4, T, 64)).astype(np.float32) * 0.3)
        pe = jnp.asarray(rng.standard_normal((2 * L, 64)).astype(np.float32) * 0.3)
        vl = jnp.asarray(np.array([T, T - 37], np.int32))
        scale = 64 ** -0.5
        out = jax.jit(lambda q, pe: flash_attention(
            q, q, q, causal=False, scale=scale, rel_pe=pe,
            kv_valid_len=vl))(q, pe)

        def dense(q, pe):
            i = jnp.arange(T)[:, None]
            j = jnp.arange(T)[None, :]
            idx = jnp.clip(i - j, -L, L - 1) + L
            s = jnp.einsum("bhqd,bhkd->bhqk", q, q) * scale
            s = s + jnp.einsum("bhqd,qkd->bhqk", q, pe[idx]) * scale
            s = jnp.where((j < vl[:, None, None, None]), s, -1e30)
            return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), q)
        with jax.default_matmul_precision("highest"):
            want = jax.jit(dense)(q, pe)
        diff = float(jnp.abs(out - want).max())
        assert diff < 1e-3, f"flash-rel vs dense diff {diff}"

    for name, fn in (("pallas flash attention", flash),
                     ("pallas flash attention grad", flash_grad),
                     ("pallas flash NHD layout", flash_nhd),
                     ("pallas flash rel-pos 16k", flash_rel_long),
                     ("pallas flash rel-pos parity", flash_rel_parity),
                     ("pallas fused log-mel", logmel),
                     ("pallas conv frontend", conv_frontend),
                     ("speecht5 encoder (full size)", encoder),
                     ("beam decode (tiny)", decode)):
        ok = check(name, fn) and ok
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
