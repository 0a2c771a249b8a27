"""Continuous-batching decode driver (iteration-level scheduling).

Static batching (pipelines/decode_asr.py) runs each batch until its
SLOWEST utterance finishes: every early-EOS stream idles its slot.  This
driver keeps a fixed set of decode SLOTS on device, each at its own decode
step (per-stream cache offsets — ops/attention.py vector ``cache_index``),
and refills a slot the moment its stream emits EOS.  The TPU program
stays fixed-shape; scheduling is host-side admission between jit'd
``chunk_steps``-step bursts, so the per-burst host sync amortizes the
relay round-trip (~30 ms on this box) over many decode steps.

The reference has no serving/batching layer at all (SURVEY §2.3, §5);
this is the net-new serving primitive of the TPU build (ROADMAP item 5).

Numerics: identical to per-utterance greedy_decode — slots are
independent rows of the same fixed-shape program
(tests/test_continuous_batching.py pins equality).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Iterable, List, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..models.speecht5 import decoder as dec
from ..models.speecht5 import model as st5
from ..models.speecht5.config import SpeechT5Config


class SlotState(NamedTuple):
    """Fixed-shape device state for S decode slots."""
    enc: jnp.ndarray        # [S, Tf, H] encoder hidden per slot
    enc_mask: jnp.ndarray   # [S, Tf] int32 frame validity
    caches: Dict            # per-layer self-attn KV, [S, H, max_len+1, hd]
    step: jnp.ndarray       # [S] int32 per-slot decode position
    last: jnp.ndarray       # [S, 1] int32 last token (next step's input)
    done: jnp.ndarray       # [S] bool
    out: jnp.ndarray        # [S, max_len] int32 emitted tokens


def init_slots(cfg: SpeechT5Config, slots: int, enc_frames: int,
               max_len: int, dtype=jnp.float32) -> SlotState:
    """All slots empty (done=True, so they decode pads until admitted)."""
    return SlotState(
        enc=jnp.zeros((slots, enc_frames, cfg.hidden_size), dtype),
        enc_mask=jnp.zeros((slots, enc_frames), jnp.int32),
        caches=dec.init_decode_cache(cfg, slots, max_len + 1, dtype),
        step=jnp.zeros((slots,), jnp.int32),
        last=jnp.full((slots, 1), cfg.decoder_start_token_id, jnp.int32),
        done=jnp.ones((slots,), bool),
        out=jnp.full((slots, max_len), cfg.pad_token_id, jnp.int32),
    )


def _insert_many(cfg: SpeechT5Config, state: SlotState, sel: jnp.ndarray,
                 enc_new: jnp.ndarray, mask_new: jnp.ndarray,
                 lm_cache: Optional[Dict] = None):
    """Admit utterances into every slot with ``sel[s]`` True, all at once
    (fresh step/cache/output).  ``enc_new``/``mask_new`` are full [S, ...]
    arrays whose unselected rows are ignored — one encode call and ONE
    device round-trip admits a whole batch of streams."""
    s1 = sel[:, None]
    zero = lambda c: jnp.where(sel[:, None, None, None], 0.0, c)
    new = SlotState(
        enc=jnp.where(sel[:, None, None], enc_new, state.enc),
        enc_mask=jnp.where(s1, mask_new, state.enc_mask),
        caches=jax.tree_util.tree_map(zero, state.caches),
        step=jnp.where(sel, 0, state.step),
        last=jnp.where(s1, cfg.decoder_start_token_id, state.last),
        done=jnp.where(sel, False, state.done),
        out=jnp.where(s1, cfg.pad_token_id, state.out),
    )
    if lm_cache is None:
        return new
    return new, jax.tree_util.tree_map(zero, lm_cache)


def _run_chunk(cfg: SpeechT5Config, params: Dict, n_steps: int, max_len: int,
               state: SlotState, fusion=None, lm_cache: Optional[Dict] = None):
    """``n_steps`` greedy decode steps over all slots (done slots inert).
    With ``fusion`` (a FusionLM whose params ride in fusion.params), the LM
    scores each step at the slot's own offset (vector cache_index)."""
    s = state.step.shape[0]
    rows = jnp.arange(s)
    # cross-attention K/V once per chunk (loop-invariant; recomputing the
    # encoder projections per STEP dominates at long Tenc)
    cross = st5.asr_cross_cache(params, cfg, state.enc)

    def body(_, carry):
        st, lmc = carry
        logits, caches = st5.asr_decode_step(
            params, cfg, st.last, st.step, st.enc, st.enc_mask, st.caches,
            cross_caches=cross)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if fusion is not None:
            lm_logp, lmc = fusion.step(st.last, st.step, lmc)
            logp = logp + lm_logp
        nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        nxt = jnp.where(st.done, cfg.pad_token_id, nxt)
        pos = jnp.minimum(st.step, max_len - 1)
        cur = st.out[rows, pos]
        out = st.out.at[rows, pos].set(jnp.where(st.done, cur, nxt))
        done = st.done | (nxt == cfg.eos_token_id)
        step = jnp.where(st.done, st.step, st.step + 1)
        done = done | (step >= max_len)
        return (SlotState(st.enc, st.enc_mask, caches, step,
                          nxt[:, None], done, out), lmc)

    state, lm_cache = jax.lax.fori_loop(0, n_steps, body, (state, lm_cache))
    return (state, lm_cache) if fusion is not None else state


class BeamSlotState(NamedTuple):
    """Fixed-shape device state for S beam-decode slots of K beams each.
    enc/enc_mask/caches are beam-flat ([S*K, ...]); bookkeeping is [S, K]."""
    enc: jnp.ndarray        # [S*K, Tf, H]
    enc_mask: jnp.ndarray   # [S*K, Tf]
    caches: Dict            # [S*K, H, max_len+1, hd] per layer
    step: jnp.ndarray       # [S] per-slot decode position
    tokens: jnp.ndarray     # [S, K, max_len]
    scores: jnp.ndarray     # [S, K] raw log-prob sums
    lengths: jnp.ndarray    # [S, K] tokens emitted incl. eos
    done: jnp.ndarray       # [S, K]
    last: jnp.ndarray       # [S, K] last emitted token


NEG_INF = -1.0e9


def _beam_init_slots(cfg: SpeechT5Config, slots: int, k: int, enc_frames: int,
                     max_len: int, dtype=jnp.float32) -> BeamSlotState:
    return BeamSlotState(
        enc=jnp.zeros((slots * k, enc_frames, cfg.hidden_size), dtype),
        enc_mask=jnp.zeros((slots * k, enc_frames), jnp.int32),
        caches=dec.init_decode_cache(cfg, slots * k, max_len + 1, dtype),
        step=jnp.zeros((slots,), jnp.int32),
        tokens=jnp.full((slots, k, max_len), cfg.pad_token_id, jnp.int32),
        scores=jnp.tile(jnp.asarray([0.0] + [NEG_INF] * (k - 1),
                                    jnp.float32)[None], (slots, 1)),
        lengths=jnp.zeros((slots, k), jnp.int32),
        done=jnp.ones((slots, k), bool),
        last=jnp.full((slots, k), cfg.decoder_start_token_id, jnp.int32),
    )


def _beam_insert_many(cfg: SpeechT5Config, k: int, state: BeamSlotState,
                      sel: jnp.ndarray, enc_new: jnp.ndarray,
                      mask_new: jnp.ndarray, lm_cache: Optional[Dict] = None):
    """Admit new utterances into the selected slots (sel: [S] bool;
    enc_new/mask_new are [S, ...], tiled over the slot's K beams)."""
    s = sel.shape[0]
    sel_flat = jnp.repeat(sel, k)                    # [S*K]
    enc_t = jnp.repeat(enc_new, k, axis=0)
    mask_t = jnp.repeat(mask_new, k, axis=0)
    zero = lambda c: jnp.where(sel_flat[:, None, None, None], 0.0, c)
    init_scores = jnp.tile(jnp.asarray([0.0] + [NEG_INF] * (k - 1),
                                       jnp.float32)[None], (s, 1))
    s1, s2 = sel[:, None], sel[:, None, None]
    if lm_cache is not None:
        lm_cache = jax.tree_util.tree_map(zero, lm_cache)
    new = BeamSlotState(
        enc=jnp.where(sel_flat[:, None, None], enc_t, state.enc),
        enc_mask=jnp.where(sel_flat[:, None], mask_t, state.enc_mask),
        caches=jax.tree_util.tree_map(zero, state.caches),
        step=jnp.where(sel, 0, state.step),
        tokens=jnp.where(s2, cfg.pad_token_id, state.tokens),
        scores=jnp.where(s1, init_scores, state.scores),
        lengths=jnp.where(s1, 0, state.lengths),
        done=jnp.where(s1, False, state.done),
        last=jnp.where(s1, cfg.decoder_start_token_id, state.last),
    )
    if lm_cache is None:
        return new
    return new, lm_cache


def _beam_run_chunk(cfg: SpeechT5Config, params: Dict, k: int, n_steps: int,
                    max_len: int, state: BeamSlotState, fusion=None,
                    lm_cache: Optional[Dict] = None):
    """``n_steps`` beam steps over all slots (all-done slots inert) —
    the per-step math of decode/beam.beam_search with per-slot offsets.
    With ``fusion``, the LM cache is beam-flat ([S*K, ...]) and reordered
    by parent beam each step, exactly as static beam_search does."""
    s = state.step.shape[0]
    v = cfg.vocab_size
    pad_onehot = jnp.full((v,), NEG_INF).at[cfg.pad_token_id].set(0.0)
    rows, cols = jnp.arange(s), jnp.arange(k)
    cross = st5.asr_cross_cache(params, cfg, state.enc)  # loop-invariant

    def body(_, carry):
        st, lmc = carry
        slot_done = jnp.all(st.done, axis=1)                       # [S]
        step_flat = jnp.repeat(st.step, k)                         # [S*K]
        logits, caches = st5.asr_decode_step(
            params, cfg, st.last.reshape(s * k, 1), step_flat,
            st.enc, st.enc_mask, st.caches, cross_caches=cross)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        if fusion is not None:
            lm_logp, lmc = fusion.step(st.last.reshape(s * k, 1),
                                       step_flat, lmc)
            logp = logp + lm_logp
        logp = logp.reshape(s, k, v)
        logp = jnp.where(st.done[..., None], pad_onehot[None, None], logp)

        cand = st.scores[..., None] + logp
        top_scores, top_idx = jax.lax.top_k(cand.reshape(s, k * v), k)
        parent = top_idx // v
        tok = (top_idx % v).astype(jnp.int32)

        gather = lambda x: jnp.take_along_axis(
            x, parent.reshape(parent.shape + (1,) * (x.ndim - 2)), axis=1)
        pos = jnp.minimum(st.step, max_len - 1)
        tokens = gather(st.tokens)
        cur = tokens[rows[:, None], cols[None, :], pos[:, None]]
        tokens = tokens.at[rows[:, None], cols[None, :], pos[:, None]].set(
            jnp.where(slot_done[:, None], cur, tok))
        done = gather(st.done)
        lengths = gather(st.lengths)
        lengths = jnp.where(done | slot_done[:, None], lengths, lengths + 1)
        done = done | (tok == cfg.eos_token_id)

        flat_idx = (rows[:, None] * k + parent).reshape(-1)
        reorder = lambda x: jnp.take(x, flat_idx, axis=0)
        caches = jax.tree_util.tree_map(reorder, caches)
        if fusion is not None:
            lmc = jax.tree_util.tree_map(reorder, lmc)

        step = jnp.where(slot_done, st.step, st.step + 1)
        done = done | (step >= max_len)[:, None]
        # frozen slots keep their pre-step state wholesale
        keep = lambda new, old: jnp.where(
            slot_done.reshape((s,) + (1,) * (new.ndim - 1)), old, new)
        keep_flat = lambda new, old: jnp.where(
            jnp.repeat(slot_done, k).reshape((s * k,) + (1,) * (new.ndim - 1)),
            old, new)
        if fusion is not None:
            lmc = jax.tree_util.tree_map(keep_flat, lmc, carry[1])
        return (BeamSlotState(
            st.enc, st.enc_mask,
            jax.tree_util.tree_map(keep_flat, caches, st.caches),
            step,
            keep(tokens, st.tokens), keep(top_scores, st.scores),
            keep(lengths, st.lengths), keep(done, st.done),
            keep(tok, st.last)), lmc)

    state, lm_cache = jax.lax.fori_loop(0, n_steps, body, (state, lm_cache))
    return (state, lm_cache) if fusion is not None else state


def _cfg_key(cfg: SpeechT5Config) -> tuple:
    """Hashable config fingerprint (lists -> tuples)."""
    return tuple(sorted(
        (k, tuple(v) if isinstance(v, (list, tuple)) else v)
        for k, v in dataclasses.asdict(cfg).items()))


@functools.lru_cache(maxsize=8)
def _beam_jit_fns(cfg_key: tuple, k: int, chunk_steps: int, max_len: int,
                  lm_key: Optional[tuple] = None, lm_weight: float = 0.3):
    from ..models.gpt2.model import GPT2Config
    from .fusion import FusionLM

    cfg = SpeechT5Config(**dict(cfg_key))
    if lm_key is None:
        insert = jax.jit(
            lambda state, sel, enc_new, mask_new: _beam_insert_many(
                cfg, k, state, sel, enc_new, mask_new), donate_argnums=(0,))
        chunk = jax.jit(
            lambda params, state: _beam_run_chunk(cfg, params, k, chunk_steps,
                                                  max_len, state),
            donate_argnums=(1,))
        return insert, chunk
    lm_cfg = GPT2Config(**dict(lm_key))
    insert = jax.jit(
        lambda state, sel, enc_new, mask_new, lm_cache: _beam_insert_many(
            cfg, k, state, sel, enc_new, mask_new, lm_cache),
        donate_argnums=(0, 4))
    chunk = jax.jit(
        lambda params, lm_params, state, lm_cache: _beam_run_chunk(
            cfg, params, k, chunk_steps, max_len, state,
            fusion=FusionLM(lm_params, lm_cfg, weight=lm_weight),
            lm_cache=lm_cache),
        donate_argnums=(2, 3))
    return insert, chunk


def decode_continuous_beam(
    params: Dict, cfg: SpeechT5Config,
    utterances: Iterable[Tuple[str, np.ndarray]],
    *, slots: int = 4, beam_size: int = 5, chunk_steps: int = 32,
    max_len: int = 100, length_penalty: float = 1.0,
    audio_samples: Optional[int] = None,
    encode_fn: Optional[Callable] = None,
    fusion=None,
) -> Dict[str, Tuple[np.ndarray, int]]:
    """Beam-search with continuous batching: like :func:`decode_continuous`
    but each slot runs ``beam_size`` beams; a slot is refilled once ALL its
    beams finish.  Static ``beam_search`` always runs the full ``max_len``
    fori_loop, so slot retirement wins even more here than for greedy.

    Returns {utt_id: (tokens, length)} of the length-penalty-best
    hypothesis — same tokens as per-utterance ``beam_search``.
    """
    from .beam import _length_penalty

    utts: List[Tuple[str, np.ndarray]] = list(utterances)
    if not utts:
        return {}
    if audio_samples is None:
        audio_samples = max(len(w) for _, w in utts)
    for uid, w in utts:
        if len(w) > audio_samples:
            raise ValueError(f"{uid}: {len(w)} samples > bucket "
                             f"{audio_samples}")
    if encode_fn is None:
        encode_fn = jax.jit(lambda p, w, m: st5.encode_speech(p, cfg, w, m))
    if fusion is None:
        insert_fn, chunk_fn = _beam_jit_fns(_cfg_key(cfg), beam_size,
                                            chunk_steps, max_len)
    else:
        insert_fn, chunk_fn = _beam_jit_fns(_cfg_key(cfg), beam_size,
                                            chunk_steps, max_len,
                                            _cfg_key(fusion.cfg),
                                            fusion.weight)

    slot_owner: List[Optional[str]] = [None] * slots
    results: Dict[str, Tuple[np.ndarray, int]] = {}
    queue = list(reversed(utts))
    state: Optional[BeamSlotState] = None
    lm_cache: Optional[Dict] = None

    def admit(state, lm_cache):
        free = [i for i in range(slots) if slot_owner[i] is None]
        take = min(len(free), len(queue))
        if take == 0:
            return state, lm_cache
        w = np.zeros((slots, audio_samples), np.float32)
        m = np.zeros((slots, audio_samples), np.int32)
        sel = np.zeros((slots,), bool)
        for slot in free[:take]:
            uid, wav = queue.pop()
            w[slot, : len(wav)] = wav
            m[slot, : len(wav)] = 1
            sel[slot] = True
            slot_owner[slot] = uid
        enc, enc_mask = encode_fn(params, jnp.asarray(w), jnp.asarray(m))
        if state is None:
            state = _beam_init_slots(cfg, slots, beam_size, enc.shape[1],
                                     max_len, enc.dtype)
            if fusion is not None:
                lm_cache = fusion.init_cache(slots * beam_size, max_len + 1)
        if fusion is None:
            return insert_fn(state, jnp.asarray(sel), enc, enc_mask), None
        return insert_fn(state, jnp.asarray(sel), enc, enc_mask, lm_cache)

    state, lm_cache = admit(state, lm_cache)
    while any(o is not None for o in slot_owner):
        if fusion is None:
            state = chunk_fn(params, state)
        else:
            state, lm_cache = chunk_fn(params, fusion.params, state, lm_cache)
        done = np.asarray(state.done)                # one host sync per chunk
        slot_done = done.all(axis=1)
        if any(slot_done[i] for i in range(slots)
               if slot_owner[i] is not None):
            tokens = np.asarray(state.tokens)
            scores = np.asarray(state.scores)
            lengths = np.asarray(state.lengths)
            for i in range(slots):
                if slot_owner[i] is None or not slot_done[i]:
                    continue
                norm = scores[i] / np.asarray(_length_penalty(
                    jnp.maximum(jnp.asarray(lengths[i]), 1), length_penalty))
                best = int(np.argmax(norm))
                toks = tokens[i, best]
                results[slot_owner[i]] = (toks, int(lengths[i, best]))
                slot_owner[i] = None
            state, lm_cache = admit(state, lm_cache)
    return results


@functools.lru_cache(maxsize=8)
def _jit_fns(cfg_key: tuple, chunk_steps: int, max_len: int,
             lm_key: Optional[tuple] = None, lm_weight: float = 0.3):
    """Cached jit'd insert/chunk programs — cfg is an unhashable dataclass,
    so the cache key is its value fingerprint.  Caching here (instead of
    per-call lambdas) is what makes repeated decode_continuous calls reuse
    their compilations; params/lm_params ride as arguments for the same
    reason."""
    from ..models.gpt2.model import GPT2Config
    from .fusion import FusionLM

    cfg = SpeechT5Config(**dict(cfg_key))
    if lm_key is None:
        insert = jax.jit(
            lambda state, sel, enc_new, mask_new: _insert_many(
                cfg, state, sel, enc_new, mask_new), donate_argnums=(0,))
        chunk = jax.jit(
            lambda params, state: _run_chunk(cfg, params, chunk_steps,
                                             max_len, state),
            donate_argnums=(1,))
        return insert, chunk
    lm_cfg = GPT2Config(**dict(lm_key))
    insert = jax.jit(
        lambda state, sel, enc_new, mask_new, lm_cache: _insert_many(
            cfg, state, sel, enc_new, mask_new, lm_cache),
        donate_argnums=(0, 4))
    chunk = jax.jit(
        lambda params, lm_params, state, lm_cache: _run_chunk(
            cfg, params, chunk_steps, max_len, state,
            fusion=FusionLM(lm_params, lm_cfg, weight=lm_weight),
            lm_cache=lm_cache),
        donate_argnums=(2, 3))
    return insert, chunk


def decode_continuous(
    params: Dict, cfg: SpeechT5Config,
    utterances: Iterable[Tuple[str, np.ndarray]],
    *, slots: int = 8, chunk_steps: int = 32, max_len: int = 100,
    audio_samples: Optional[int] = None,
    encode_fn: Optional[Callable] = None,
    fusion=None,
) -> Dict[str, Tuple[np.ndarray, int]]:
    """Greedy-decode a stream of utterances with continuous batching.
    With ``fusion`` (a decode.fusion.FusionLM), each step adds the
    weighted LM log-prob — the LM cache rides per-slot at the slot's own
    offset and is reset on admission.

    Args:
      utterances: iterable of (utt_id, waveform [T] float32).  Waveforms
        are right-padded to ``audio_samples`` (default: longest seen in the
        first pull; longer ones are an error, so pass the bucket size).
      slots: device decode slots (the fixed batch dimension).
      chunk_steps: decode steps per host round-trip.
      encode_fn: optional (params, wav [S, T], mask) -> (enc, enc_mask) to
        override the standard encoder (e.g. a sharded one).  Admissions
        are encoded in full [slots, T] batches (one call per admission
        round), so this shares its compilation with static decoding at
        the same batch size.

    Returns {utt_id: (tokens [<=max_len], length)} — same tokens as
    per-utterance ``greedy_decode``.
    """
    utts: List[Tuple[str, np.ndarray]] = list(utterances)
    if not utts:
        return {}
    if audio_samples is None:
        audio_samples = max(len(w) for _, w in utts)
    for uid, w in utts:
        if len(w) > audio_samples:
            raise ValueError(f"{uid}: {len(w)} samples > bucket "
                             f"{audio_samples}")

    if encode_fn is None:
        encode_fn = jax.jit(lambda p, w, m: st5.encode_speech(p, cfg, w, m))
    if fusion is None:
        insert_fn, chunk_fn = _jit_fns(_cfg_key(cfg), chunk_steps, max_len)
    else:
        insert_fn, chunk_fn = _jit_fns(_cfg_key(cfg), chunk_steps, max_len,
                                       _cfg_key(fusion.cfg), fusion.weight)

    slot_owner: List[Optional[str]] = [None] * slots
    results: Dict[str, Tuple[np.ndarray, int]] = {}
    queue = list(reversed(utts))          # pop() yields arrival order
    state: Optional[SlotState] = None     # sized from the first encode
    lm_cache: Optional[Dict] = None

    def admit(state, lm_cache):
        free = [i for i in range(slots) if slot_owner[i] is None]
        take = min(len(free), len(queue))
        if take == 0:
            return state, lm_cache
        # one [slots, T] encode + ONE vectorized insert per admission round
        w = np.zeros((slots, audio_samples), np.float32)
        m = np.zeros((slots, audio_samples), np.int32)
        sel = np.zeros((slots,), bool)
        for slot in free[:take]:
            uid, wav = queue.pop()
            w[slot, : len(wav)] = wav
            m[slot, : len(wav)] = 1
            sel[slot] = True
            slot_owner[slot] = uid
        enc, enc_mask = encode_fn(params, jnp.asarray(w), jnp.asarray(m))
        if state is None:
            state = init_slots(cfg, slots, enc.shape[1], max_len, enc.dtype)
            if fusion is not None:
                lm_cache = fusion.init_cache(slots, max_len + 1)
        if fusion is None:
            return insert_fn(state, jnp.asarray(sel), enc, enc_mask), None
        return insert_fn(state, jnp.asarray(sel), enc, enc_mask, lm_cache)

    state, lm_cache = admit(state, lm_cache)
    while any(o is not None for o in slot_owner):
        if fusion is None:
            state = chunk_fn(params, state)
        else:
            state, lm_cache = chunk_fn(params, fusion.params, state, lm_cache)
        done = np.asarray(state.done)                 # ONE host sync per chunk
        if done.all() or any(done[i] for i in range(slots)
                             if slot_owner[i] is not None):
            out = np.asarray(state.out)
            for i in range(slots):
                if slot_owner[i] is not None and done[i]:
                    toks = out[i]
                    length = int((toks != cfg.pad_token_id).sum())
                    results[slot_owner[i]] = (toks, length)
                    slot_owner[i] = None
            state, lm_cache = admit(state, lm_cache)
    return results
