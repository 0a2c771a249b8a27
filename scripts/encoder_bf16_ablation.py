"""Selective-bf16 ablation of the SpeechT5 encoder forward (VERDICT r4
item 6): full-bf16 broke the <1e-3 embedding-MAE budget (0.0068) and
all-activations-bf16 (0.002) too, but nothing BETWEEN f32-everywhere and
bf16-everywhere was ever measured.  This harness ablates per-subsystem
activation+param casts — attention-only, ffn-only, conv-only — and
reports each point's MAE vs the f32 oracle and its measured step time,
so the headline-bench decision ("which parts may ride bf16 inside the
1e-3 budget, and does any of them pay?") is a table, not a guess.

Ablation mechanism: a patched copy of encoder._layer_body that casts the
selected sublayer's inputs+params to bf16 and the sublayer output back
to f32 (module-global patch; measurement harness only — if a point ever
pays, it graduates to a first-class encoder knob).

Run on the TPU: python scripts/encoder_bf16_ablation.py
"""

from __future__ import annotations

import sys
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax                                               # noqa: E402
import jax.numpy as jnp                                  # noqa: E402

from loco_asr_tpu.models.speecht5 import encoder as enc_mod  # noqa: E402
from loco_asr_tpu.models.speecht5 import model as st5        # noqa: E402
from loco_asr_tpu.models.speecht5.config import SpeechT5Config  # noqa: E402
from loco_asr_tpu.ops import attention, layers, remat as remat_lib  # noqa: E402
from loco_asr_tpu.utils.profiling import device_time_per_iter  # noqa: E402
from loco_asr_tpu.utils.pytree import cast_floating      # noqa: E402

BATCH, SECONDS, SR = 16, 5.0, 16000


def make_layer_body(attn_bf16: bool = False, ffn_bf16: bool = False):
    """encoder._layer_body with selective sublayer casts (see module
    docstring; mirrors the original body exactly otherwise)."""

    def body(cfg, hidden, layer_params, *, attention_bias, rel_pe,
             kv_valid_len, dropout_rng, deterministic, attn_impl="dense",
             ring=None, position_bias=None):
        act = layers.ACTIVATIONS[cfg.hidden_act]
        rngs = ((None,) * 4 if dropout_rng is None
                else jax.random.split(dropout_rng, 4))

        ap = layer_params["attention"]
        a_in = hidden
        if attn_bf16:
            ap = cast_floating(ap, jnp.bfloat16)
            a_in = hidden.astype(jnp.bfloat16)
        attn_out, _ = attention.multi_head_attention(
            ap, a_in, num_heads=cfg.encoder_attention_heads,
            attention_bias=attention_bias, rel_pe=rel_pe,
            rel_max=cfg.encoder_max_relative_position,
            position_bias=position_bias, kv_valid_len=kv_valid_len,
            dropout_rng=rngs[0], dropout_rate=cfg.attention_dropout,
            deterministic=deterministic, attn_impl=attn_impl, ring=ring)
        attn_out = attn_out.astype(jnp.float32)
        attn_out = layers.dropout(rngs[1], attn_out, cfg.hidden_dropout,
                                  deterministic)
        hidden = hidden + attn_out
        hidden = layers.layer_norm(layer_params["layer_norm"], hidden,
                                   eps=cfg.layer_norm_eps)

        fp = layer_params["feed_forward"]
        f_in = hidden
        if ffn_bf16:
            fp = cast_floating(fp, jnp.bfloat16)
            f_in = hidden.astype(jnp.bfloat16)
        ff = remat_lib.tag_big(layers.dense(fp["intermediate_dense"], f_in))
        ff = remat_lib.tag_big(act(ff))
        ff = layers.dropout(rngs[2], ff, cfg.activation_dropout,
                            deterministic)
        ff = layers.dense(fp["output_dense"], ff).astype(jnp.float32)
        ff = layers.dropout(rngs[3], ff, cfg.hidden_dropout, deterministic)
        hidden = hidden + ff
        hidden = layers.layer_norm(layer_params["final_layer_norm"], hidden,
                                   eps=cfg.layer_norm_eps)
        return hidden

    return body


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    cfg = SpeechT5Config()
    params = st5.asr_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal(
        (BATCH, int(SECONDS * SR))).astype(np.float32) * 0.1)
    mask = jnp.ones(wav.shape, jnp.int32)

    fwd = jax.jit(lambda p, w, m: st5.encode_speech(p, cfg, w, m)[0])
    ref = np.asarray(fwd(params, wav, mask))
    t_ref = device_time_per_iter(
        lambda p, w, m: st5.encode_speech(p, cfg, w, m)[0].mean(),
        params, wav, mask, iters=20) * 1e3
    rtfx = BATCH * SECONDS / (t_ref / 1e3)
    print(f"{'f32 baseline':22s} MAE 0.0       {t_ref:7.2f} ms  "
          f"RTFx {rtfx:,.0f}")

    from loco_asr_tpu.models.speecht5 import prenets

    def conv_fwd(p, w, m):
        """conv-only point: waveform+prenet ride bf16 (the gram path and
        conv1d_nhc follow the input dtype), the trunk gets f32 back."""
        hidden, mask2 = prenets.speech_prenet(
            p["encoder"]["prenet"], cfg, w.astype(jnp.bfloat16), m)
        hidden = hidden.astype(jnp.float32)
        return enc_mod.encoder(p["encoder"]["wrapped_encoder"], cfg,
                               hidden, mask2)

    def run_point(name, *, attn=False, ffn=False, conv=False,
                  full=False):
        orig = enc_mod._layer_body
        p = params
        w = wav
        fn = lambda p, w, m: st5.encode_speech(p, cfg, w, m)[0]
        try:
            if attn or ffn:
                enc_mod._layer_body = make_layer_body(attn_bf16=attn,
                                                      ffn_bf16=ffn)
            if conv:
                fn = conv_fwd
            if full:
                p = cast_floating(params, jnp.bfloat16)
                w = wav.astype(jnp.bfloat16)
            out = np.asarray(jax.jit(fn)(p, w, mask), np.float32)
            mae = float(np.mean(np.abs(out - ref)))
            t = device_time_per_iter(
                lambda p, w, m: fn(p, w, m).astype(jnp.float32).mean(),
                p, w, mask, iters=20) * 1e3
            budget = "PASS" if mae < 1e-3 else "OVER"
            print(f"{name:22s} MAE {mae:.5f} [{budget}] {t:7.2f} ms  "
                  f"RTFx {BATCH*SECONDS/(t/1e3):,.0f}")
        finally:
            enc_mod._layer_body = orig

    run_point("attn-only bf16", attn=True)
    run_point("ffn-only bf16", ffn=True)
    run_point("attn+ffn bf16", attn=True, ffn=True)
    run_point("conv-only bf16", conv=True)
    run_point("full bf16", full=True)


if __name__ == "__main__":
    main()
