"""SpeechT5 pre-nets: speech encoder prenet (conv feature encoder +
projection + conv/sinusoidal positions), text encoder prenet (scaled
positional encoding), text decoder prenet, speech decoder pre/post nets.

Numerics contract: HF modeling_speecht5.py prenet classes; parameter tree
paths are our canonical names (see import_torch.py for the renaming table,
the TPU-side port of the reference's fairseq->HF Mapping contract,
speech_text/map_speecht5_hf.py:1-181).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import layers
from ...ops.audio import compute_mask_indices
from .config import SpeechT5Config


# ---------------------------------------------------------------------------
# Conv feature encoder (wav2vec2-style, raw waveform -> [B, frames, C])
# ---------------------------------------------------------------------------

def feature_encoder_init(rng, cfg: SpeechT5Config, dtype=jnp.float32) -> Dict:
    n = len(cfg.conv_dim)
    ks = jax.random.split(rng, n)
    convs = {}
    for i in range(n):
        in_ch = 1 if i == 0 else cfg.conv_dim[i - 1]
        p = {"conv": layers.conv1d_init(ks[i], in_ch, cfg.conv_dim[i],
                                        cfg.conv_kernel[i], bias=cfg.conv_bias, dtype=dtype)}
        if not cfg.conv_bias and "bias" in p["conv"]:
            del p["conv"]["bias"]
        if cfg.feat_extract_norm == "group" and i == 0:
            p["layer_norm"] = layers.group_norm_init(cfg.conv_dim[0], dtype)
        elif cfg.feat_extract_norm == "layer":
            p["layer_norm"] = layers.layer_norm_init(cfg.conv_dim[i], dtype)
        convs[str(i)] = p
    return {"conv_layers": convs}


def feature_encoder(params: Dict, cfg: SpeechT5Config, input_values: jnp.ndarray) -> jnp.ndarray:
    """[B, T] raw waveform -> [B, frames, conv_dim[-1]]."""
    x = input_values[:, None, :]  # [B, 1, T]
    for i in range(len(cfg.conv_dim)):
        p = params["conv_layers"][str(i)]
        x = layers.conv1d(p["conv"], x, stride=cfg.conv_stride[i])
        if cfg.feat_extract_norm == "group" and i == 0:
            x = layers.group_norm(p["layer_norm"], x, num_groups=cfg.conv_dim[0])
        elif cfg.feat_extract_norm == "layer":
            x = layers.layer_norm(p["layer_norm"], x.transpose(0, 2, 1),
                                  eps=cfg.layer_norm_eps).transpose(0, 2, 1)
        x = layers.gelu(x)
    return x.transpose(0, 2, 1)


def conv1_instance_norm_gelu_gram(
        wav: jnp.ndarray, weight: jnp.ndarray, scale: jnp.ndarray,
        bias: jnp.ndarray, *, stride: int = 5, eps: float = 1e-5,
        time_major: bool = False) -> jnp.ndarray:
    """First feature-encoder layer (conv k=2*stride, 1->C, instance-norm
    over frames, erf-GELU) with gram-matrix statistics — ONE pass over the
    big activation instead of XLA's three.

    The conv output is linear in the K tap values, so per-channel stats
    factor through tiny tap statistics (K = 10):
        mean_c = tap_mean . W[:, c]             (linearity of the mean)
        E[y^2]_c = W[:, c]^T G W[:, c],  G = E[taps taps^T]  ([K, K] gram)
    The [B, C, F]-sized tensor is then produced once by a single tap
    matmul with the normalize+GELU epilogue fused in by XLA — stats never
    read it.  Same E[y^2]-mean^2 variance form as ops/pallas/conv_frontend
    (parity ~1e-6).  ``time_major`` selects [B, F, C] output; default
    [B, C, F] feeds the NCH conv layers above with no transpose pass (the
    layout is the matmul's own output assignment).

    A conv bias, if present, cancels exactly through the instance norm
    (it shifts y and mean identically) and is therefore ignored.
    """
    b, t = wav.shape
    k = weight.shape[2]
    if k != 2 * stride:
        raise ValueError(f"kernel {k} must equal 2*stride {stride}")
    f = (t - k) // stride + 1
    r = wav[:, : stride * (f + 1)].reshape(b, f + 1, stride)
    taps = jnp.concatenate([r[:, :f], r[:, 1:f + 1]], axis=-1)   # [B, F, K]
    w = weight[:, 0, :].T                                        # [K, C]

    tap_mean = jnp.mean(taps, axis=1)                            # [B, K]
    gram = jnp.einsum("bfi,bfj->bij", taps, taps,
                      preferred_element_type=jnp.float32) / f    # [B, K, K]
    mean = tap_mean @ w                                          # [B, C]
    ysq = jnp.einsum("ic,bij,jc->bc", w, gram, w,
                     preferred_element_type=jnp.float32)         # E[y^2]
    var = ysq - mean * mean
    inv = jax.lax.rsqrt(var + eps)                               # [B, C]
    gain = (inv * scale[None, :]).astype(jnp.float32)            # fold norm
    off = (bias[None, :] - mean * gain)                          # into affine

    # stats/accumulation stay f32 above; the BIG activation is emitted in
    # the caller's dtype — under bf16 mixed precision an f32 output here
    # silently re-promoted the whole downstream conv stack to f32
    # (conv1d_nhc follows x.dtype), which is why mp measured slower than
    # f32 at B=16 in round 4.  f32 callers are bitwise unchanged.
    if time_major:
        y = jnp.einsum("bfk,kc->bfc", taps, w,
                       preferred_element_type=jnp.float32)
        y = y * gain[:, None, :] + off[:, None, :]
    else:
        y = jnp.einsum("bfk,kc->bcf", taps, w,
                       preferred_element_type=jnp.float32)
        y = y * gain[:, :, None] + off[:, :, None]
    return layers.gelu(y.astype(wav.dtype))


def feature_encoder_fused(params: Dict, cfg: SpeechT5Config,
                          input_values: jnp.ndarray) -> jnp.ndarray:
    """:func:`feature_encoder` with (a) the first layer's conv+instance-
    norm+GELU replaced by the one-pass gram-statistics form (same
    numbers, ~1e-6) and (b) the remaining conv layers run time-major
    (NHC) so channels stay in the TPU lane dimension end-to-end —
    bitwise-equal to the NCH path but without XLA's inter-layer
    relayout copy (813 us at batch 16x5 s, traced)."""
    c0 = params["conv_layers"]["0"]
    x = conv1_instance_norm_gelu_gram(
        input_values, c0["conv"]["weight"], c0["layer_norm"]["scale"],
        c0["layer_norm"]["bias"], stride=cfg.conv_stride[0],
        time_major=True)
    for i in range(1, len(cfg.conv_dim)):
        p = params["conv_layers"][str(i)]
        x = layers.conv1d_nhc(x, p["conv"]["weight"],
                              stride=cfg.conv_stride[i],
                              bias=p["conv"].get("bias"))
        if cfg.feat_extract_norm == "layer":
            x = layers.layer_norm(p["layer_norm"], x,
                                  eps=cfg.layer_norm_eps)
        x = layers.gelu(x)
    return x


# ---------------------------------------------------------------------------
# Speech encoder prenet
# ---------------------------------------------------------------------------

def speech_prenet_init(rng, cfg: SpeechT5Config, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(rng, 5)
    p = {
        "feature_encoder": feature_encoder_init(ks[0], cfg, dtype),
        "feature_projection": {
            "layer_norm": layers.layer_norm_init(cfg.conv_dim[-1], dtype),
            "projection": layers.dense_init(ks[1], cfg.conv_dim[-1], cfg.hidden_size, dtype=dtype),
        },
        "pos_conv_embed": {
            "conv": layers.weight_norm_conv1d_init(
                ks[2], cfg.hidden_size, cfg.hidden_size, cfg.num_conv_pos_embeddings,
                groups=cfg.num_conv_pos_embedding_groups, dtype=dtype),
        },
    }
    if cfg.mask_time_prob > 0.0 or cfg.mask_feature_prob > 0.0:
        p["masked_spec_embed"] = jax.random.uniform(ks[3], (cfg.hidden_size,), dtype)
    return p


def _sinusoidal_speech_table(cfg: SpeechT5Config,
                             min_positions: int = 0) -> np.ndarray:
    # HF: SinusoidalPositionalEmbedding(max_speech_positions + pad + 1, ...,
    # padding_idx=pad); internally adds offset 2 and EXPANDS on demand when
    # the sequence outruns the table (make_weights in forward) — we size it
    # to the actual sequence up front (static under jit).
    num = max(cfg.max_speech_positions, min_positions) + cfg.pad_token_id + 1 + 2
    return layers.sinusoidal_table(num, cfg.hidden_size, padding_idx=cfg.pad_token_id)


def reduce_attention_mask(cfg: SpeechT5Config, frame_len: int,
                          attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Waveform-resolution validity mask -> frame-resolution mask.

    Contract of HF _get_feature_vector_attention_mask: all frames strictly
    before the conv output length of the row's valid samples are valid.
    """
    lengths = jnp.sum(attention_mask.astype(jnp.int32), axis=-1)
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        lengths = (lengths - k) // s + 1
    return (jnp.arange(frame_len)[None, :] < lengths[:, None]).astype(jnp.int32)


def speech_prenet(
    params: Dict,
    cfg: SpeechT5Config,
    input_values: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    *,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    sinusoidal_table: Optional[np.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """[B, T] waveform -> ([B, frames, H] hidden, [B, frames] frame mask)."""
    if (cfg.feat_extract_norm == "group"
            and cfg.conv_kernel[0] == 2 * cfg.conv_stride[0]):
        feats = feature_encoder_fused(params["feature_encoder"], cfg,
                                      input_values)
    else:
        feats = feature_encoder(params["feature_encoder"], cfg, input_values)

    if attention_mask is not None:
        attention_mask = reduce_attention_mask(cfg, feats.shape[1], attention_mask)

    fp = params["feature_projection"]
    hidden = layers.layer_norm(fp["layer_norm"], feats, eps=cfg.layer_norm_eps)
    hidden = layers.dense(fp["projection"], hidden)

    # SpecAugment on hidden states (training only).
    if not deterministic and cfg.apply_spec_augment and rng is not None:
        b, t, h = hidden.shape
        r_time, r_feat = jax.random.split(rng)
        if cfg.mask_time_prob > 0:
            lengths = None if attention_mask is None else jnp.sum(attention_mask, -1)
            m = compute_mask_indices(r_time, (b, t), cfg.mask_time_prob,
                                     cfg.mask_time_length, lengths,
                                     cfg.mask_time_min_masks)
            hidden = jnp.where(m[..., None], params["masked_spec_embed"].astype(hidden.dtype), hidden)
        if cfg.mask_feature_prob > 0:
            m = compute_mask_indices(r_feat, (b, h), cfg.mask_feature_prob,
                                     cfg.mask_feature_length, None,
                                     cfg.mask_feature_min_masks)
            hidden = jnp.where(m[:, None, :], 0.0, hidden)

    # Relative conv positional embedding (weight-normed grouped conv +
    # gelu), run time-major: ~1.8x faster than the NCH grouped conv on
    # TPU (no group-relayout copies) and numerically identical.
    w = layers.weight_norm_conv1d_weight(params["pos_conv_embed"]["conv"])
    pos = layers.conv1d_nhc(hidden, w,
                            padding=cfg.num_conv_pos_embeddings // 2,
                            groups=cfg.num_conv_pos_embedding_groups,
                            bias=params["pos_conv_embed"]["conv"]["bias"])
    if cfg.num_conv_pos_embeddings % 2 == 0:
        pos = pos[:, :-1]
    hidden = hidden + layers.gelu(pos)

    # Sinusoidal absolute positions (fairseq make_positions semantics).
    table = (sinusoidal_table if sinusoidal_table is not None
             else _sinusoidal_speech_table(cfg, min_positions=hidden.shape[1]))
    valid = attention_mask if attention_mask is not None else jnp.ones(hidden.shape[:2], jnp.int32)
    pos_ids = layers.positions_from_padding(valid, cfg.pad_token_id)
    hidden = hidden + jnp.take(jnp.asarray(table, hidden.dtype), pos_ids, axis=0)

    return hidden, attention_mask


# ---------------------------------------------------------------------------
# Text encoder prenet
# ---------------------------------------------------------------------------

def text_encoder_prenet_init(rng, cfg: SpeechT5Config, dtype=jnp.float32) -> Dict:
    return {
        "embed_tokens": layers.embedding_init(rng, cfg.vocab_size, cfg.hidden_size,
                                              dtype=dtype, padding_idx=cfg.pad_token_id),
        "encode_positions": {"alpha": jnp.ones((), dtype)},
    }


def text_encoder_prenet(params: Dict, cfg: SpeechT5Config, input_ids: jnp.ndarray,
                        *, pe_table: Optional[np.ndarray] = None) -> jnp.ndarray:
    emb = layers.embedding(params["embed_tokens"], input_ids)
    pe = pe_table if pe_table is not None else layers.interleaved_sinusoidal_table(
        cfg.max_text_positions, cfg.hidden_size)
    L = input_ids.shape[1]
    return emb + params["encode_positions"]["alpha"] * jnp.asarray(pe[:L], emb.dtype)


# ---------------------------------------------------------------------------
# Text decoder prenet / postnet
# ---------------------------------------------------------------------------

def text_decoder_prenet_init(rng, cfg: SpeechT5Config, dtype=jnp.float32) -> Dict:
    return {
        "embed_tokens": layers.embedding_init(rng, cfg.vocab_size, cfg.hidden_size,
                                              dtype=dtype, padding_idx=cfg.pad_token_id),
    }


def _sinusoidal_text_table(cfg: SpeechT5Config,
                           min_positions: int = 0) -> np.ndarray:
    num = max(cfg.max_text_positions, min_positions) + cfg.pad_token_id + 1 + 2
    return layers.sinusoidal_table(num, cfg.hidden_size, padding_idx=cfg.pad_token_id)


def text_decoder_prenet(params: Dict, cfg: SpeechT5Config, input_ids: jnp.ndarray,
                        *, past_length: int = 0,
                        table: Optional[np.ndarray] = None) -> jnp.ndarray:
    """Token embedding (optionally scaled) + sinusoidal positions.

    Positions are derived from non-pad mask per HF TextDecoderPrenet
    (create_position_ids_from_input_ids over the raw input ids).
    """
    scale = float(np.sqrt(cfg.hidden_size)) if cfg.scale_embedding else 1.0
    t = table if table is not None else _sinusoidal_text_table(
        cfg, min_positions=input_ids.shape[1])
    valid = (input_ids != cfg.pad_token_id)
    if jnp.ndim(past_length) == 1:      # per-stream offsets ([B])
        past_length = past_length[:, None]
    pos_ids = layers.positions_from_padding(valid, cfg.pad_token_id, past_length)
    # past_length can be dynamic (KV decoding); clamp instead of the NaN
    # fill jnp.take would produce out of range
    pos_ids = jnp.minimum(pos_ids, len(t) - 1)
    emb = layers.embedding(params["embed_tokens"], input_ids) * scale
    return emb + jnp.take(jnp.asarray(t, emb.dtype), pos_ids, axis=0)


def text_decoder_postnet_init(rng, cfg: SpeechT5Config, dtype=jnp.float32) -> Dict:
    p = layers.dense_init(rng, cfg.hidden_size, cfg.vocab_size, bias=False, dtype=dtype)
    return {"lm_head": p}


def text_decoder_postnet(params: Dict, hidden: jnp.ndarray) -> jnp.ndarray:
    return layers.dense(params["lm_head"], hidden)


# ---------------------------------------------------------------------------
# Speech decoder prenet / postnet (TTS side)
# ---------------------------------------------------------------------------

def speech_decoder_prenet_init(rng, cfg: SpeechT5Config, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(rng, cfg.speech_decoder_prenet_layers + 2)
    lyr = {}
    for i in range(cfg.speech_decoder_prenet_layers):
        in_dim = cfg.num_mel_bins if i == 0 else cfg.speech_decoder_prenet_units
        lyr[str(i)] = layers.dense_init(ks[i], in_dim, cfg.speech_decoder_prenet_units, dtype=dtype)
    return {
        "layers": lyr,
        "final_layer": layers.dense_init(ks[-2], cfg.speech_decoder_prenet_units,
                                         cfg.hidden_size, dtype=dtype),
        "encode_positions": {"alpha": jnp.ones((), dtype)},
        "speaker_embeds_layer": layers.dense_init(
            ks[-1], cfg.speaker_embedding_dim + cfg.hidden_size, cfg.hidden_size, dtype=dtype),
    }


def speech_decoder_prenet(params: Dict, cfg: SpeechT5Config, input_values: jnp.ndarray,
                          speaker_embeddings: Optional[jnp.ndarray] = None,
                          *, rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """[B, T, mel] -> [B, T, H].  The bottleneck dropout is applied even at
    eval (Tacotron2 §2.2 convention, matched to HF _consistent_dropout:
    a single mask shared across the batch)."""
    x = input_values
    p_drop = cfg.speech_decoder_prenet_dropout
    for i in range(cfg.speech_decoder_prenet_layers):
        x = jax.nn.relu(layers.dense(params["layers"][str(i)], x))
        if rng is not None and p_drop > 0:
            rng, sub = jax.random.split(rng)
            mask = jax.random.bernoulli(sub, p_drop, x.shape[1:])
            x = jnp.where(mask[None], x, 0.0) / (1.0 - p_drop)
    x = layers.dense(params["final_layer"], x)
    pe = layers.interleaved_sinusoidal_table(cfg.max_speech_positions, cfg.hidden_size)
    x = x + params["encode_positions"]["alpha"] * jnp.asarray(pe[: x.shape[1]], x.dtype)
    if speaker_embeddings is not None:
        se = speaker_embeddings / jnp.linalg.norm(speaker_embeddings, axis=-1, keepdims=True)
        se = jnp.broadcast_to(se[:, None, :], (x.shape[0], x.shape[1], se.shape[-1]))
        x = jax.nn.relu(layers.dense(params["speaker_embeds_layer"],
                                     jnp.concatenate([x, se], axis=-1)))
    return x


def speech_decoder_prenet_step(params: Dict, cfg: SpeechT5Config,
                               frame: jnp.ndarray, idx: jnp.ndarray,
                               speaker_embeddings: Optional[jnp.ndarray] = None,
                               *, rng: Optional[jax.Array] = None,
                               pe_table: Optional[np.ndarray] = None) -> jnp.ndarray:
    """Single-position prenet: [B, mel] frame at position ``idx`` -> [B, H].

    The prenet is position-wise (dense stack + positional add), so
    evaluating one position equals evaluating the full sequence and
    slicing — this is what makes the TTS generation loop O(T) instead of
    re-running the prenet over the whole history (HF _generate_speech
    re-runs it; numerics are identical).
    """
    x = frame
    p_drop = cfg.speech_decoder_prenet_dropout
    for i in range(cfg.speech_decoder_prenet_layers):
        x = jax.nn.relu(layers.dense(params["layers"][str(i)], x))
        if rng is not None and p_drop > 0:
            rng, sub = jax.random.split(rng)
            mask = jax.random.bernoulli(sub, p_drop, x.shape[1:])
            x = jnp.where(mask[None], x, 0.0) / (1.0 - p_drop)
    x = layers.dense(params["final_layer"], x)
    pe = pe_table if pe_table is not None else layers.interleaved_sinusoidal_table(
        cfg.max_speech_positions, cfg.hidden_size)
    x = x + params["encode_positions"]["alpha"] * jnp.asarray(pe, x.dtype)[idx]
    if speaker_embeddings is not None:
        se = speaker_embeddings / jnp.linalg.norm(speaker_embeddings, axis=-1,
                                                  keepdims=True)
        x = jax.nn.relu(layers.dense(params["speaker_embeds_layer"],
                                     jnp.concatenate([x, se], axis=-1)))
    return x


def speech_decoder_postnet_init(rng, cfg: SpeechT5Config, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(rng, cfg.speech_decoder_postnet_layers + 2)
    convs = {}
    for i in range(cfg.speech_decoder_postnet_layers):
        in_ch = cfg.num_mel_bins if i == 0 else cfg.speech_decoder_postnet_units
        out_ch = (cfg.num_mel_bins if i == cfg.speech_decoder_postnet_layers - 1
                  else cfg.speech_decoder_postnet_units)
        conv = layers.conv1d_init(ks[i], in_ch, out_ch, cfg.speech_decoder_postnet_kernel,
                                  bias=False, dtype=dtype)
        convs[str(i)] = {
            "conv": conv,
            "batch_norm": {"scale": jnp.ones((out_ch,), dtype), "bias": jnp.zeros((out_ch,), dtype),
                           "mean": jnp.zeros((out_ch,), dtype), "var": jnp.ones((out_ch,), dtype)},
        }
    return {
        "feat_out": layers.dense_init(ks[-2], cfg.hidden_size,
                                      cfg.num_mel_bins * cfg.reduction_factor, dtype=dtype),
        "prob_out": layers.dense_init(ks[-1], cfg.hidden_size, cfg.reduction_factor, dtype=dtype),
        "layers": convs,
    }


def speech_decoder_postnet_conv(params: Dict, cfg: SpeechT5Config,
                                mel: jnp.ndarray) -> jnp.ndarray:
    """Residual conv postnet: [B, T, mel] -> refined [B, T, mel]."""
    x = mel.transpose(0, 2, 1)
    for i in range(cfg.speech_decoder_postnet_layers):
        p = params["layers"][str(i)]
        x = layers.conv1d(p["conv"], x, padding=(cfg.speech_decoder_postnet_kernel - 1) // 2)
        bn = p["batch_norm"]
        x = (x - bn["mean"][None, :, None]) * jax.lax.rsqrt(bn["var"][None, :, None] + 1e-5)
        x = x * bn["scale"][None, :, None] + bn["bias"][None, :, None]
        if i < cfg.speech_decoder_postnet_layers - 1:
            x = jnp.tanh(x)
    return mel + x.transpose(0, 2, 1)


def speech_decoder_postnet(params: Dict, cfg: SpeechT5Config,
                           hidden: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[B, T, H] -> (mel_before [B, T*r, mel], mel_after, stop_logits [B, T*r])."""
    b = hidden.shape[0]
    before = layers.dense(params["feat_out"], hidden).reshape(b, -1, cfg.num_mel_bins)
    logits = layers.dense(params["prob_out"], hidden).reshape(b, -1)
    after = speech_decoder_postnet_conv(params, cfg, before)
    return before, after, logits
