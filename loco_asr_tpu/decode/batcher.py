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

from .beam import NEG_INF, beam_init_scores
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
                 lm_cache: Optional[Dict] = None,
                 keep_lm: Optional[jnp.ndarray] = None):
    """Admit utterances into every slot with ``sel[s]`` True, all at once
    (fresh step/cache/output).  ``enc_new``/``mask_new`` are full [S, ...]
    arrays whose unselected rows are ignored — one encode call and ONE
    device round-trip admits a whole batch of streams.

    ``keep_lm`` [S] bool: slots whose LM cache survives the admission
    (conversation carry-over — the stream's next utterance conditions on
    its accumulated history; decode/context.py semantics).  Decoder caches
    always reset (each utterance decodes from scratch)."""
    s1 = sel[:, None]
    # rank-generic: cache leaves are [S, ...] of any rank
    zero = lambda c: jnp.where(sel.reshape((-1,) + (1,) * (c.ndim - 1)), 0.0, c)
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
    lm_sel = sel if keep_lm is None else (sel & ~keep_lm)
    zero_lm = lambda c: jnp.where(
        lm_sel.reshape((-1,) + (1,) * (c.ndim - 1)), 0.0, c)
    return new, jax.tree_util.tree_map(zero_lm, lm_cache)


def _run_chunk(cfg: SpeechT5Config, params: Dict, n_steps: int, max_len: int,
               state: SlotState, fusion=None, lm_cache: Optional[Dict] = None,
               lm_off: Optional[jnp.ndarray] = None, freeze_lm: bool = False):
    """``n_steps`` greedy decode steps over all slots (done slots inert).
    With ``fusion`` (a FusionLM whose params ride in fusion.params), the LM
    scores each step at the slot's own offset (vector cache_index).

    ``lm_off`` [S]: per-slot LM history offsets (conversation carry-over);
    LM positions become ``lm_off + step``.  ``freeze_lm``: discard the LM
    cache update of slots already done at the top of a step — required for
    carry-over, where a post-EOS write would pollute the position the
    NEXT utterance's first token must land on (greedy_decode's while_loop
    exits before any such write in the B=1 sequential reference)."""
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
            pos = st.step if lm_off is None else lm_off + st.step
            lm_logp, lmc_new = fusion.step(st.last, pos, lmc)
            if freeze_lm:
                was_done = st.done
                lmc_new = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(
                        was_done.reshape((s,) + (1,) * (n.ndim - 1)), o, n),
                    lmc_new, lmc)
            lmc = lmc_new
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


def _beam_init_slots(cfg: SpeechT5Config, slots: int, k: int, enc_frames: int,
                     max_len: int, dtype=jnp.float32) -> BeamSlotState:
    return BeamSlotState(
        enc=jnp.zeros((slots * k, enc_frames, cfg.hidden_size), dtype),
        enc_mask=jnp.zeros((slots * k, enc_frames), jnp.int32),
        caches=dec.init_decode_cache(cfg, slots * k, max_len + 1, dtype),
        step=jnp.zeros((slots,), jnp.int32),
        tokens=jnp.full((slots, k, max_len), cfg.pad_token_id, jnp.int32),
        scores=beam_init_scores(slots, k),
        lengths=jnp.zeros((slots, k), jnp.int32),
        done=jnp.ones((slots, k), bool),
        last=jnp.full((slots, k), cfg.decoder_start_token_id, jnp.int32),
    )


def _beam_insert_many(cfg: SpeechT5Config, k: int, state: BeamSlotState,
                      sel: jnp.ndarray, enc_new: jnp.ndarray,
                      mask_new: jnp.ndarray, lm_cache: Optional[Dict] = None,
                      keep_lm: Optional[jnp.ndarray] = None):
    """Admit new utterances into the selected slots (sel: [S] bool;
    enc_new/mask_new are [S, ...], tiled over the slot's K beams).

    ``keep_lm`` [S] bool: slots whose LM cache rows survive the admission
    (beam conversation carry-over — the stream's next utterance's beams
    all condition on the accumulated history).  Decoder caches always
    reset (each utterance decodes from scratch)."""
    s = sel.shape[0]
    sel_flat = jnp.repeat(sel, k)                    # [S*K]
    enc_t = jnp.repeat(enc_new, k, axis=0)
    mask_t = jnp.repeat(mask_new, k, axis=0)
    # rank-generic: cache leaves are [S*K, ...] of any rank
    zero = lambda c: jnp.where(
        sel_flat.reshape((-1,) + (1,) * (c.ndim - 1)), 0.0, c)
    init_scores = beam_init_scores(s, k)
    s1, s2 = sel[:, None], sel[:, None, None]
    if lm_cache is not None:
        lm_sel = (sel_flat if keep_lm is None
                  else sel_flat & ~jnp.repeat(keep_lm, k))
        zero_lm = lambda c: jnp.where(
            lm_sel.reshape((-1,) + (1,) * (c.ndim - 1)), 0.0, c)
        lm_cache = jax.tree_util.tree_map(zero_lm, lm_cache)
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
                    lm_cache: Optional[Dict] = None,
                    lm_off: Optional[jnp.ndarray] = None,
                    early_stop_lp: Optional[float] = None):
    """``n_steps`` beam steps over all slots (all-done slots inert) —
    the per-step math of decode/beam.beam_search with per-slot offsets.
    With ``fusion``, the LM cache is beam-flat ([S*K, ...]) and reordered
    by parent beam each step, exactly as static beam_search does.

    ``lm_off`` [S]: per-slot LM history offsets (beam conversation
    carry-over); LM positions become ``lm_off + step``.  Frozen
    (slot-done) slots' LM caches already revert wholesale each step, the
    beam counterpart of the greedy chunk's ``freeze_lm``.

    ``early_stop_lp``: when set (the decode's GNMT length_penalty), a slot
    retires as soon as NO live beam's best achievable normalized score can
    beat the best already-finished hypothesis — instead of stalling the
    slot on its slowest straggler beam.  Raw scores are non-increasing
    (log-probs <= 0), and the GNMT penalty q(L) = ((5+L)/6)^p is monotone
    in L, so a live beam with raw score s and length l is bounded by
    s / max(q(l), q(max_len)) over every future finish length; once the
    best finished normalized score strictly exceeds every live bound, the
    search outcome is decided and all beams freeze.  The returned best
    hypothesis is bit-identical to the full search (the host-side argmax
    still lands on the same finished row), only wasted straggler steps
    disappear — the per-beam slot-retirement fix (docs/BENCH.md r5)."""
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
            pos_flat = (step_flat if lm_off is None
                        else jnp.repeat(lm_off, k) + step_flat)
            lm_logp, lmc = fusion.step(st.last.reshape(s * k, 1),
                                       pos_flat, lmc)
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
        if early_stop_lp is not None:
            q = lambda L: ((5.0 + L) / 6.0) ** early_stop_lp
            lens_f = jnp.maximum(lengths.astype(jnp.float32), 1.0)
            fin_norm = jnp.max(
                jnp.where(done, top_scores / q(lens_f), NEG_INF), axis=1)
            bound_q = jnp.maximum(q(lens_f), q(jnp.float32(max_len)))
            live_bound = jnp.max(
                jnp.where(done, NEG_INF, top_scores / bound_q), axis=1)
            done = done | (fin_norm > live_bound)[:, None]
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


def _admission_bucket(n: int, slots: int) -> int:
    """Round the admission count up to a power of two (capped at
    ``slots``): encoding only the newly admitted rows instead of the full
    [slots, T] batch removes the dominant wasted-FLOPs term at high slot
    churn (refilling ONE slot used to re-encode all of them), while the
    pow-2 bucket keeps the compiled-program count at log2(slots)+1."""
    b = 1
    while b < n:
        b *= 2
    return min(b, slots)


def _encode_pending(encode_fn, params, pending, slots: int,
                    audio_samples: int):
    """Encode the admission round's utterances in a [bucket, T] batch and
    return (sel [S], inv_map [S], enc_small, mask_small).  ``pending`` is
    a list of (slot, waveform) pairs; ``inv_map[slot]`` indexes the row of
    enc_small carrying that slot's utterance (unselected slots point at
    row 0 and are masked off by ``sel`` inside the insert program)."""
    bucket = _admission_bucket(len(pending), slots)
    w = np.zeros((bucket, audio_samples), np.float32)
    m = np.zeros((bucket, audio_samples), np.int32)
    sel = np.zeros((slots,), bool)
    inv = np.zeros((slots,), np.int32)
    for r, (slot, wav) in enumerate(pending):
        w[r, : len(wav)] = wav
        m[r, : len(wav)] = 1
        sel[slot] = True
        inv[slot] = r
    enc, mask = encode_fn(params, jnp.asarray(w), jnp.asarray(m))
    return jnp.asarray(sel), jnp.asarray(inv), enc, mask


@functools.lru_cache(maxsize=8)
def _beam_jit_fns(cfg_key: tuple, k: int, chunk_steps: int, max_len: int,
                  lm_key: Optional[tuple] = None, lm_weight: float = 0.3,
                  length_penalty: Optional[float] = None):
    from ..models.gpt2.model import GPT2Config
    from .fusion import FusionLM

    cfg = SpeechT5Config(**dict(cfg_key))
    gather = lambda x, inv: jnp.take(x, inv, axis=0)   # [A,...] -> [S,...]
    if lm_key is None:
        insert = jax.jit(
            lambda state, sel, inv, enc_s, mask_s: _beam_insert_many(
                cfg, k, state, sel, gather(enc_s, inv), gather(mask_s, inv)),
            donate_argnums=(0,))
        chunk = jax.jit(
            lambda params, state: _beam_run_chunk(cfg, params, k, chunk_steps,
                                                  max_len, state,
                                                  early_stop_lp=length_penalty),
            donate_argnums=(1,))
        return insert, chunk
    lm_cfg = GPT2Config(**dict(lm_key))
    insert = jax.jit(
        lambda state, sel, inv, enc_s, mask_s, lm_cache: _beam_insert_many(
            cfg, k, state, sel, gather(enc_s, inv), gather(mask_s, inv),
            lm_cache),
        donate_argnums=(0, 5))
    chunk = jax.jit(
        lambda params, lm_params, state, lm_cache: _beam_run_chunk(
            cfg, params, k, chunk_steps, max_len, state,
            fusion=FusionLM(lm_params, lm_cfg, weight=lm_weight),
            lm_cache=lm_cache, early_stop_lp=length_penalty),
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
    but each slot runs ``beam_size`` beams; a slot is refilled once its
    search is DECIDED — all beams finished, or the best finished
    hypothesis provably beats every live beam's achievable normalized
    score (the in-chunk early stop, ``_beam_run_chunk`` early_stop_lp).
    Static ``beam_search`` always runs the full ``max_len`` fori_loop, so
    slot retirement wins even more here than for greedy.

    Returns {utt_id: (tokens, length)} of the length-penalty-best
    hypothesis — same tokens as per-utterance ``beam_search``.
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
        insert_fn, chunk_fn = _beam_jit_fns(_cfg_key(cfg), beam_size,
                                            chunk_steps, max_len,
                                            length_penalty=length_penalty)
    else:
        insert_fn, chunk_fn = _beam_jit_fns(_cfg_key(cfg), beam_size,
                                            chunk_steps, max_len,
                                            _cfg_key(fusion.cfg),
                                            fusion.weight,
                                            length_penalty=length_penalty)

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
        pending = []
        for slot in free[:take]:
            uid, wav = queue.pop()
            slot_owner[slot] = uid
            pending.append((slot, wav))
        sel, inv, enc, enc_mask = _encode_pending(
            encode_fn, params, pending, slots, audio_samples)
        if state is None:
            state = _beam_init_slots(cfg, slots, beam_size, enc.shape[1],
                                     max_len, enc.dtype)
            if fusion is not None:
                lm_cache = fusion.init_cache(slots * beam_size, max_len + 1)
        if fusion is None:
            return insert_fn(state, sel, inv, enc, enc_mask), None
        return insert_fn(state, sel, inv, enc, enc_mask, lm_cache)

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
                # host numpy: the GNMT penalty on device would add eager
                # dispatches (~30 ms relay RTT each) per finished slot to
                # a loop built around one sync per chunk
                lens = np.maximum(lengths[i].astype(np.float32), 1.0)
                norm = scores[i] / ((5.0 + lens) / 6.0) ** length_penalty
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
    gather = lambda x, inv: jnp.take(x, inv, axis=0)   # [A,...] -> [S,...]
    if lm_key is None:
        insert = jax.jit(
            lambda state, sel, inv, enc_s, mask_s: _insert_many(
                cfg, state, sel, gather(enc_s, inv), gather(mask_s, inv)),
            donate_argnums=(0,))
        chunk = jax.jit(
            lambda params, state: _run_chunk(cfg, params, chunk_steps,
                                             max_len, state),
            donate_argnums=(1,))
        return insert, chunk
    lm_cfg = GPT2Config(**dict(lm_key))
    insert = jax.jit(
        lambda state, sel, inv, enc_s, mask_s, lm_cache: _insert_many(
            cfg, state, sel, gather(enc_s, inv), gather(mask_s, inv),
            lm_cache),
        donate_argnums=(0, 5))
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
      encode_fn: optional (params, wav [A, T], mask) -> (enc, enc_mask) to
        override the standard encoder (e.g. a sharded one).  Each
        admission round encodes ONLY the admitted utterances, with the
        batch dim rounded up to a power of two (<= slots) so at most
        log2(slots)+1 encoder programs ever compile.

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
        # encode ONLY the admitted rows (pow-2 bucket) + one vectorized
        # insert per admission round — refilling one slot no longer
        # re-encodes the whole [slots, T] batch
        pending = []
        for slot in free[:take]:
            uid, wav = queue.pop()
            slot_owner[slot] = uid
            pending.append((slot, wav))
        sel, inv, enc, enc_mask = _encode_pending(
            encode_fn, params, pending, slots, audio_samples)
        if state is None:
            state = init_slots(cfg, slots, enc.shape[1], max_len, enc.dtype)
            if fusion is not None:
                lm_cache = fusion.init_cache(slots, max_len + 1)
        if fusion is None:
            return insert_fn(state, sel, inv, enc, enc_mask), None
        return insert_fn(state, sel, inv, enc, enc_mask, lm_cache)

    state, lm_cache = admit(state, lm_cache)
    while any(o is not None for o in slot_owner):
        if fusion is None:
            state = chunk_fn(params, state)
        else:
            state, lm_cache = chunk_fn(params, fusion.params, state, lm_cache)
        done = np.asarray(state.done)                 # ONE host sync per chunk
        if any(done[i] for i in range(slots)
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


@functools.lru_cache(maxsize=8)
def _conv_jit_fns(cfg_key: tuple, chunk_steps: int, max_len: int,
                  lm_key: tuple, lm_weight: float):
    """jit'd insert/chunk/scatter programs for conversation carry-over:
    the chunk runs with per-slot LM offsets + done-slot LM freezing, the
    insert preserves LM rows of continuing streams, the scatter replaces
    one slot's LM cache row (rolling-window refresh)."""
    from ..models.gpt2.model import GPT2Config
    from .fusion import FusionLM

    cfg = SpeechT5Config(**dict(cfg_key))
    lm_cfg = GPT2Config(**dict(lm_key))
    gather = lambda x, inv: jnp.take(x, inv, axis=0)   # [A,...] -> [S,...]
    insert = jax.jit(
        lambda state, sel, inv, keep_lm, enc_s, mask_s, lm_cache:
        _insert_many(cfg, state, sel, gather(enc_s, inv),
                     gather(mask_s, inv), lm_cache, keep_lm=keep_lm),
        donate_argnums=(0, 6))
    chunk = jax.jit(
        lambda params, lm_params, state, lm_cache, lm_off: _run_chunk(
            cfg, params, chunk_steps, max_len, state,
            fusion=FusionLM(lm_params, lm_cfg, weight=lm_weight),
            lm_cache=lm_cache, lm_off=lm_off, freeze_lm=True),
        donate_argnums=(2, 3))
    scatter = jax.jit(
        lambda lm_cache, row, slot: jax.tree_util.tree_map(
            lambda c, r: jax.lax.dynamic_update_slice(
                c, r.astype(c.dtype), (slot,) + (0,) * (c.ndim - 1)),
            lm_cache, row),
        donate_argnums=(0,))
    return insert, chunk, scatter


@functools.lru_cache(maxsize=8)
def _conv_beam_jit_fns(cfg_key: tuple, k: int, chunk_steps: int,
                       max_len: int, lm_key: tuple, lm_weight: float,
                       length_penalty: Optional[float] = None):
    """jit'd insert/chunk/select/scatter programs for BEAM conversation
    carry-over: the chunk runs beam steps with per-slot LM offsets (done
    slots frozen wholesale), the insert preserves LM rows of continuing
    streams, ``select`` copies the finished slot's BEST hypothesis' LM
    row over all its beam rows (the next utterance's beams condition on
    the history actually emitted), and ``scatter`` replaces a slot's K
    LM rows with a freshly primed row (rolling-window refresh)."""
    from ..models.gpt2.model import GPT2Config
    from .fusion import FusionLM

    cfg = SpeechT5Config(**dict(cfg_key))
    lm_cfg = GPT2Config(**dict(lm_key))
    gather = lambda x, inv: jnp.take(x, inv, axis=0)   # [A,...] -> [S,...]
    insert = jax.jit(
        lambda state, sel, inv, keep_lm, enc_s, mask_s, lm_cache:
        _beam_insert_many(cfg, k, state, sel, gather(enc_s, inv),
                          gather(mask_s, inv), lm_cache, keep_lm=keep_lm),
        donate_argnums=(0, 6))
    chunk = jax.jit(
        lambda params, lm_params, state, lm_cache, lm_off: _beam_run_chunk(
            cfg, params, k, chunk_steps, max_len, state,
            fusion=FusionLM(lm_params, lm_cfg, weight=lm_weight),
            lm_cache=lm_cache, lm_off=lm_off,
            early_stop_lp=length_penalty),
        donate_argnums=(2, 3))

    def _select(lm_cache, slot, best):
        def upd(c):
            tail = (0,) * (c.ndim - 1)
            row = jax.lax.dynamic_slice(c, (slot * k + best,) + tail,
                                        (1,) + c.shape[1:])
            return jax.lax.dynamic_update_slice(
                c, jnp.broadcast_to(row, (k,) + c.shape[1:]),
                (slot * k,) + tail)
        return jax.tree_util.tree_map(upd, lm_cache)

    def _scatter(lm_cache, row, slot):
        def upd(c, r):
            tail = (0,) * (c.ndim - 1)
            r = jnp.broadcast_to(r.astype(c.dtype), (k,) + c.shape[1:])
            return jax.lax.dynamic_update_slice(c, r, (slot * k,) + tail)
        return jax.tree_util.tree_map(upd, lm_cache, row)

    select = jax.jit(_select, donate_argnums=(0,))
    scatter = jax.jit(_scatter, donate_argnums=(0,))
    return insert, chunk, select, scatter


def _decode_conversations_beam(
    params: Dict, cfg: SpeechT5Config,
    convs: List[Tuple[str, List[np.ndarray]]], empty: List[str],
    *, fusion, slots: int, beam_size: int, chunk_steps: int, max_len: int,
    length_penalty: float, audio_samples: int, encode_fn: Callable,
    max_positions: int, decode_reserve: int,
) -> Dict[str, List[Tuple[np.ndarray, int]]]:
    """Beam-search continuous batching over conversation streams (the
    BASELINE configs 4+5 combination: shallow-fusion beam decoding WITH
    cross-utterance LM carry-over).  Numerics contract
    (tests/test_conversation_batching.py): per conversation, tokens equal
    decode/context.beam_decode_with_context run sequentially."""
    k = beam_size
    insert_fn, chunk_fn, select_fn, scatter_fn = _conv_beam_jit_fns(
        _cfg_key(cfg), k, chunk_steps, max_len, _cfg_key(fusion.cfg),
        fusion.weight, length_penalty=length_penalty)

    queue = list(reversed(convs))              # pop() yields arrival order
    slot_conv: List[Optional[str]] = [None] * slots
    slot_wavs: List[Optional[list]] = [None] * slots
    slot_hist: List[list] = [[] for _ in range(slots)]
    lm_off = np.zeros((slots,), np.int32)
    results: Dict[str, List[Tuple[np.ndarray, int]]] = \
        {cid: [] for cid, _ in convs}
    for cid in empty:
        results[cid] = []
    state: Optional[BeamSlotState] = None
    lm_cache: Optional[Dict] = None

    def start_next_conversation(i, pending):
        if queue:
            cid, wavs = queue.pop()
            slot_conv[i] = cid
            slot_wavs[i] = list(reversed(wavs))
            slot_hist[i] = []
            lm_off[i] = 0
            pending.append((i, slot_wavs[i].pop(), False))

    def admit(state, lm_cache, pending):
        if not pending:
            return state, lm_cache
        keep = np.zeros((slots,), bool)
        for i, _, kp in pending:
            keep[i] = kp
        sel, inv, enc, enc_mask = _encode_pending(
            encode_fn, params, [(i, wav) for i, wav, _ in pending],
            slots, audio_samples)
        if state is None:
            state = _beam_init_slots(cfg, slots, k, enc.shape[1], max_len,
                                     enc.dtype)
            lm_cache = fusion.init_cache(slots * k, max_positions)
        return insert_fn(state, sel, inv, jnp.asarray(keep),
                         enc, enc_mask, lm_cache)

    def refresh_slot(i, lm_cache):
        """decode/context.py _refresh for one slot: drop the oldest half
        of the stream's history, prime the kept tail into a fresh row,
        tile it over the slot's K beam rows."""
        hist = (np.concatenate(slot_hist[i]) if slot_hist[i]
                else np.zeros((0,), np.int32))
        limit = max_positions - decode_reserve
        keep = max(0, min(len(hist) // 2, limit))
        tail = hist[len(hist) - keep:] if keep else hist[:0]
        slot_hist[i] = [tail]
        lm_off[i] = len(tail)
        row = fusion.init_cache(1, max_positions)
        if keep > 0:
            row, _ = fusion.prime(jnp.asarray(tail[None]), row,
                                  jnp.zeros((1,), jnp.int32))
        return scatter_fn(lm_cache, row, jnp.int32(i))

    pending: List[Tuple[int, np.ndarray, bool]] = []
    for i in range(slots):
        start_next_conversation(i, pending)
    state, lm_cache = admit(state, lm_cache, pending)

    while any(c is not None for c in slot_conv):
        state, lm_cache = chunk_fn(params, fusion.params, state, lm_cache,
                                   jnp.asarray(lm_off))
        done = np.asarray(state.done)             # one host sync per chunk
        slot_done = done.all(axis=1)
        finished = [i for i in range(slots)
                    if slot_conv[i] is not None and slot_done[i]]
        if not finished:
            continue
        tokens = np.asarray(state.tokens)
        scores = np.asarray(state.scores)
        lengths = np.asarray(state.lengths)
        pending = []
        for i in finished:
            # host-side GNMT ranking (see decode_continuous_beam)
            lens = np.maximum(lengths[i].astype(np.float32), 1.0)
            norm = scores[i] / ((5.0 + lens) / 6.0) ** length_penalty
            best = int(np.argmax(norm))
            toks = tokens[i, best]
            length = int(lengths[i, best])
            results[slot_conv[i]].append((toks.copy(), length))
            slot_hist[i].append(toks[:length].astype(np.int32).copy())
            # carry the BEST hypothesis' LM state into every beam row
            lm_cache = select_fn(lm_cache, jnp.int32(i), jnp.int32(best))
            lm_off[i] += length
            if int(lm_off[i]) > max_positions - decode_reserve:
                lm_cache = refresh_slot(i, lm_cache)
            if slot_wavs[i]:
                pending.append((i, slot_wavs[i].pop(), True))
            else:
                slot_conv[i] = None
                start_next_conversation(i, pending)
        state, lm_cache = admit(state, lm_cache, pending)
    return results


def decode_conversations(
    params: Dict, cfg: SpeechT5Config,
    conversations: Iterable[Tuple[str, List[np.ndarray]]],
    *, fusion, slots: int = 4, chunk_steps: int = 16, max_len: int = 100,
    beam_size: int = 1, length_penalty: float = 1.0,
    audio_samples: Optional[int] = None,
    encode_fn: Optional[Callable] = None,
    max_positions: Optional[int] = None,
    decode_reserve: int = 128,
) -> Dict[str, List[Tuple[np.ndarray, int]]]:
    """Continuous batching over CONVERSATION STREAMS with LM carry-over:
    slot = conversation; the fusion LM's KV cache persists across that
    stream's utterances, so utterance n is scored conditioned on
    utterances 1..n-1 (the serving form of the reference's
    conversation-stream semantics, lms/src/utils.py:108-139; BASELINE
    config 5).  Different conversations interleave across slots; a slot is
    pinned to its conversation until the last utterance finishes, then
    refilled with the next conversation (LM state fully reset).

    Rolling window: per-slot history beyond ``max_positions -
    decode_reserve`` triggers the decode/context.py refresh (drop the
    oldest half, re-prime the kept tail) on that slot alone.

    Numerics contract (tests/test_conversation_batching.py): per
    conversation, tokens are EXACTLY those of greedy_decode +
    ConversationContext(batch=1) run sequentially on that conversation.

    ``beam_size > 1`` runs BEAM search per slot (K beams per
    conversation, all conditioned on the stream's carried LM history; the
    best hypothesis' LM state carries forward) — the BASELINE configs
    4+5 combination; the sequential reference is
    decode/context.beam_decode_with_context.

    Returns {conv_id: [(tokens [max_len], length), ...] per utterance}.
    """
    if fusion is None:
        raise ValueError("conversation carry-over requires a fusion LM — "
                         "the carried state IS the LM context")
    convs = [(cid, list(wavs)) for cid, wavs in conversations]
    empty = [cid for cid, wavs in convs if not wavs]
    convs = [(cid, wavs) for cid, wavs in convs if wavs]
    if not convs:
        return {cid: [] for cid in empty}
    max_positions = max_positions or fusion.cfg.n_positions
    if decode_reserve < max_len + 1:
        raise ValueError(
            f"decode_reserve={decode_reserve} must be >= max_len+1="
            f"{max_len + 1}: an utterance admitted at the window edge "
            f"writes up to max_len LM positions past its offset")
    if max_len + 1 > max_positions:
        # a single utterance would write LM positions past the cache —
        # those one-hot KV writes are silently dropped and the decoded
        # tokens diverge from the sequential reference with no error
        raise ValueError(
            f"max_len={max_len} does not fit the LM context "
            f"(max_positions={max_positions}); lower max_len or use an "
            f"LM with a longer context")
    if audio_samples is None:
        audio_samples = max(len(w) for _, wavs in convs for w in wavs)
    for cid, wavs in convs:
        for w in wavs:
            if len(w) > audio_samples:
                raise ValueError(f"{cid}: {len(w)} samples > bucket "
                                 f"{audio_samples}")
    if encode_fn is None:
        encode_fn = jax.jit(lambda p, w, m: st5.encode_speech(p, cfg, w, m))
    if beam_size > 1:
        return _decode_conversations_beam(
            params, cfg, convs, empty, fusion=fusion, slots=slots,
            beam_size=beam_size, chunk_steps=chunk_steps, max_len=max_len,
            length_penalty=length_penalty, audio_samples=audio_samples,
            encode_fn=encode_fn, max_positions=max_positions,
            decode_reserve=decode_reserve)
    insert_fn, chunk_fn, scatter_fn = _conv_jit_fns(
        _cfg_key(cfg), chunk_steps, max_len, _cfg_key(fusion.cfg),
        fusion.weight)

    queue = list(reversed(convs))              # pop() yields arrival order
    slot_conv: List[Optional[str]] = [None] * slots
    slot_wavs: List[Optional[list]] = [None] * slots
    slot_hist: List[list] = [[] for _ in range(slots)]
    lm_off = np.zeros((slots,), np.int32)
    results: Dict[str, List[Tuple[np.ndarray, int]]] = \
        {cid: [] for cid, _ in convs}
    for cid in empty:                  # zero-utterance conversations
        results[cid] = []
    state: Optional[SlotState] = None
    lm_cache: Optional[Dict] = None

    def start_next_conversation(i, pending):
        if queue:
            cid, wavs = queue.pop()
            slot_conv[i] = cid
            slot_wavs[i] = list(reversed(wavs))
            slot_hist[i] = []
            lm_off[i] = 0
            pending.append((i, slot_wavs[i].pop(), False))

    def admit(state, lm_cache, pending):
        if not pending:
            return state, lm_cache
        keep = np.zeros((slots,), bool)
        for i, _, k in pending:
            keep[i] = k
        sel, inv, enc, enc_mask = _encode_pending(
            encode_fn, params, [(i, wav) for i, wav, _ in pending],
            slots, audio_samples)
        if state is None:
            state = init_slots(cfg, slots, enc.shape[1], max_len, enc.dtype)
            lm_cache = fusion.init_cache(slots, max_positions)
        return insert_fn(state, sel, inv, jnp.asarray(keep),
                         enc, enc_mask, lm_cache)

    def refresh_slot(i, lm_cache):
        """decode/context.py _refresh, scoped to one slot: drop the oldest
        half of the stream's history, re-prime the kept tail into a fresh
        cache row."""
        hist = (np.concatenate(slot_hist[i]) if slot_hist[i]
                else np.zeros((0,), np.int32))
        limit = max_positions - decode_reserve
        keep = max(0, min(len(hist) // 2, limit))
        tail = hist[len(hist) - keep:] if keep else hist[:0]
        slot_hist[i] = [tail]
        # len(tail), NOT keep: context.py._refresh sets offsets from the
        # kept tail, and when decode_reserve >= max_positions (degenerate
        # no-carry-over regime) keep clamps at 0 — a negative lm_off would
        # silently drop every later KV write for the slot
        lm_off[i] = len(tail)
        row = fusion.init_cache(1, max_positions)
        if keep > 0:
            row, _ = fusion.prime(jnp.asarray(tail[None]), row,
                                  jnp.zeros((1,), jnp.int32))
        return scatter_fn(lm_cache, row, jnp.int32(i))

    pending: List[Tuple[int, np.ndarray, bool]] = []
    for i in range(slots):
        start_next_conversation(i, pending)
    state, lm_cache = admit(state, lm_cache, pending)

    while any(c is not None for c in slot_conv):
        state, lm_cache = chunk_fn(params, fusion.params, state, lm_cache,
                                   jnp.asarray(lm_off))
        done = np.asarray(state.done)             # one host sync per chunk
        finished = [i for i in range(slots)
                    if slot_conv[i] is not None and done[i]]
        if not finished:
            continue
        out = np.asarray(state.out)
        pending = []
        for i in finished:
            toks = out[i]
            length = int((toks != cfg.pad_token_id).sum())
            results[slot_conv[i]].append((toks.copy(), length))
            slot_hist[i].append(toks[:length].astype(np.int32).copy())
            lm_off[i] += length
            # rolling refresh — ConversationContext.append trigger, per slot
            if int(lm_off[i]) > max_positions - decode_reserve:
                lm_cache = refresh_slot(i, lm_cache)
            if slot_wavs[i]:
                pending.append((i, slot_wavs[i].pop(), True))
            else:
                slot_conv[i] = None
                start_next_conversation(i, pending)
        state, lm_cache = admit(state, lm_cache, pending)
    return results
