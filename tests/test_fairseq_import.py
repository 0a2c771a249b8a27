"""fairseq speecht5_base.pt import path (C5 mapper,
models/speecht5/import_torch.py load_fairseq_* / graft_fairseq_into_*).

No fairseq checkpoint ships in this container, so the test constructs a
synthetic fairseq state dict by INVERSE-renaming a tiny random model's own
parameters into the fairseq naming scheme the reference's Mapping class
documents (map_speecht5_hf.py:34-181: self_attn/fc1/fc2/pos_emb/
feature_extractor.N.{0,2}/post_extract_proj/mask_emb/pos_conv.0), grafts
it into a DIFFERENT random init, and requires the grafted encoder forward
to equal the source model's bitwise.  This pins every rename rule and
every transpose in the mapper."""

import re

import numpy as np
import jax
import jax.numpy as jnp

from loco_asr_tpu.models.speecht5 import model as st5
from loco_asr_tpu.models.speecht5 import import_torch as it
from loco_asr_tpu.models.speecht5.config import tiny_config
from loco_asr_tpu.utils.pytree import flatten_with_paths

DENSE = ("q_proj", "k_proj", "v_proj", "out_proj",
         "intermediate_dense", "output_dense", "projection")


def to_fairseq_state(params) -> dict:
    """Our ASR pytree -> synthetic fairseq ckpt['model'] naming."""
    out = {}
    enc = flatten_with_paths(params["encoder"]["wrapped_encoder"])
    for k, v in enc.items():
        v = np.asarray(v)
        fk = k.replace("embed_positions.pe_k", "pos_emb.pe_k")
        fk = re.sub(r"layers\.(\d+)\.attention\.", r"layers.\1.self_attn.", fk)
        fk = re.sub(r"layers\.(\d+)\.layer_norm\.",
                    r"layers.\1.self_attn_layer_norm.", fk)
        fk = re.sub(r"layers\.(\d+)\.feed_forward\.intermediate_dense\.",
                    r"layers.\1.fc1.", fk)
        fk = re.sub(r"layers\.(\d+)\.feed_forward\.output_dense\.",
                    r"layers.\1.fc2.", fk)
        if fk.endswith(".kernel"):
            v, fk = v.T, fk[: -len(".kernel")] + ".weight"
        fk = re.sub(r"\.scale$", ".weight", fk)
        out["encoder." + fk] = v

    pre = flatten_with_paths(params["encoder"]["prenet"])
    for k, v in pre.items():
        v = np.asarray(v)
        if k == "masked_spec_embed":
            fk = "mask_emb"
        elif k.startswith("feature_projection.layer_norm."):
            fk = ("layer_norm." +
                  k.rsplit(".", 1)[1].replace("scale", "weight"))
        elif k == "feature_projection.projection.kernel":
            fk, v = "post_extract_proj.weight", v.T
        elif k == "feature_projection.projection.bias":
            fk = "post_extract_proj.bias"
        elif k.startswith("feature_encoder.conv_layers."):
            m = re.match(r"feature_encoder\.conv_layers\.(\d+)\."
                         r"(conv|layer_norm)\.(weight|scale|bias)", k)
            sub = "0" if m.group(2) == "conv" else "2"
            leaf = m.group(3).replace("scale", "weight")
            fk = f"feature_extractor.conv_layers.{m.group(1)}.{sub}.{leaf}"
        elif k.startswith("pos_conv_embed.conv."):
            fk = "pos_conv.0." + k[len("pos_conv_embed.conv."):]
        else:
            continue  # sinusoidal tables etc. — recomputed, not stored
        out["speech_encoder_prenet." + fk] = v
    return out


def test_fairseq_graft_roundtrip():
    cfg = tiny_config()
    src = st5.asr_init(jax.random.PRNGKey(0), cfg)
    other = st5.asr_init(jax.random.PRNGKey(1), cfg)

    state = to_fairseq_state(src)
    # real base ckpts always carry the text prenet table too
    state["text_encoder_prenet.encoder_prenet.0.weight"] = (
        np.zeros((cfg.vocab_size, cfg.hidden_size), np.float32))
    ckpt = {"model": state}
    grafted = it.graft_fairseq_into_asr(other, ckpt)

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((2, 3200)).astype(np.float32) * 0.1)
    mask = jnp.ones(wav.shape, jnp.int32)
    ref, _ = st5.encode_speech(src, cfg, wav, mask)
    got, _ = st5.encode_speech(grafted, cfg, wav, mask)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # and the graft really replaced things: the donor differs
    bad, _ = st5.encode_speech(other, cfg, wav, mask)
    assert np.abs(np.asarray(bad) - np.asarray(ref)).max() > 1e-3


def test_fairseq_text_prenet_mapping():
    emb = np.random.default_rng(0).standard_normal((7, 24)).astype(np.float32)
    state = {"text_encoder_prenet.encoder_prenet.0.weight": emb}
    sub = it.load_fairseq_text_prenet(state)
    np.testing.assert_array_equal(sub["embed_tokens"]["weight"], emb)
    assert float(sub["encode_positions"]["alpha"]) == 1.0
