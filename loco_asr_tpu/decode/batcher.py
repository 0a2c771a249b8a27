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
                 enc_new: jnp.ndarray, mask_new: jnp.ndarray) -> SlotState:
    """Admit utterances into every slot with ``sel[s]`` True, all at once
    (fresh step/cache/output).  ``enc_new``/``mask_new`` are full [S, ...]
    arrays whose unselected rows are ignored — one encode call and ONE
    device round-trip admits a whole batch of streams."""
    s1 = sel[:, None]
    zero = lambda c: jnp.where(sel[:, None, None, None], 0.0, c)
    return SlotState(
        enc=jnp.where(sel[:, None, None], enc_new, state.enc),
        enc_mask=jnp.where(s1, mask_new, state.enc_mask),
        caches=jax.tree_util.tree_map(zero, state.caches),
        step=jnp.where(sel, 0, state.step),
        last=jnp.where(s1, cfg.decoder_start_token_id, state.last),
        done=jnp.where(sel, False, state.done),
        out=jnp.where(s1, cfg.pad_token_id, state.out),
    )


def _run_chunk(cfg: SpeechT5Config, params: Dict, n_steps: int, max_len: int,
               state: SlotState) -> SlotState:
    """``n_steps`` greedy decode steps over all slots (done slots inert)."""
    s = state.step.shape[0]
    rows = jnp.arange(s)

    def body(_, st: SlotState) -> SlotState:
        logits, caches = st5.asr_decode_step(
            params, cfg, st.last, st.step, st.enc, st.enc_mask, st.caches)
        nxt = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
        nxt = jnp.where(st.done, cfg.pad_token_id, nxt)
        pos = jnp.minimum(st.step, max_len - 1)
        cur = st.out[rows, pos]
        out = st.out.at[rows, pos].set(jnp.where(st.done, cur, nxt))
        done = st.done | (nxt == cfg.eos_token_id)
        step = jnp.where(st.done, st.step, st.step + 1)
        done = done | (step >= max_len)
        return SlotState(st.enc, st.enc_mask, caches, step,
                         nxt[:, None], done, out)

    return jax.lax.fori_loop(0, n_steps, body, state)


def _cfg_key(cfg: SpeechT5Config) -> tuple:
    """Hashable config fingerprint (lists -> tuples)."""
    return tuple(sorted(
        (k, tuple(v) if isinstance(v, (list, tuple)) else v)
        for k, v in dataclasses.asdict(cfg).items()))


@functools.lru_cache(maxsize=8)
def _jit_fns(cfg_key: tuple, chunk_steps: int, max_len: int):
    """Cached jit'd insert/chunk programs — cfg is an unhashable dataclass,
    so the cache key is its value fingerprint.  Caching here (instead of
    per-call lambdas) is what makes repeated decode_continuous calls reuse
    their compilations; params rides as an argument for the same reason."""
    cfg = SpeechT5Config(**dict(cfg_key))
    insert = jax.jit(
        lambda state, sel, enc_new, mask_new: _insert_many(
            cfg, state, sel, enc_new, mask_new), donate_argnums=(0,))
    chunk = jax.jit(
        lambda params, state: _run_chunk(cfg, params, chunk_steps, max_len,
                                         state), donate_argnums=(1,))
    return insert, chunk


def decode_continuous(
    params: Dict, cfg: SpeechT5Config,
    utterances: Iterable[Tuple[str, np.ndarray]],
    *, slots: int = 8, chunk_steps: int = 32, max_len: int = 100,
    audio_samples: Optional[int] = None,
    encode_fn: Optional[Callable] = None,
) -> Dict[str, Tuple[np.ndarray, int]]:
    """Greedy-decode a stream of utterances with continuous batching.

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
    insert_fn, chunk_fn = _jit_fns(_cfg_key(cfg), chunk_steps, max_len)

    slot_owner: List[Optional[str]] = [None] * slots
    results: Dict[str, Tuple[np.ndarray, int]] = {}
    queue = list(reversed(utts))          # pop() yields arrival order
    state: Optional[SlotState] = None     # sized from the first encode

    def admit(state: Optional[SlotState]) -> Optional[SlotState]:
        free = [i for i in range(slots) if slot_owner[i] is None]
        take = min(len(free), len(queue))
        if take == 0:
            return state
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
        return insert_fn(state, jnp.asarray(sel), enc, enc_mask)

    state = admit(state)
    while any(o is not None for o in slot_owner):
        state = chunk_fn(params, state)
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
            state = admit(state)
    return results
