"""Sharded training steps (DP/FSDP/TP via jit + NamedSharding).

One compiled program per step: loss -> grad -> optimizer update, with
parameters/optimizer state sharded by partition.TRANSFORMER_RULES and the
batch sharded over the combined data axes.  XLA inserts the all-gathers /
reduce-scatters (FSDP) and psums (TP/DP) from the sharding annotations —
the framework never writes a collective by hand here (SURVEY.md §2.3).
"""

from __future__ import annotations

from contextlib import nullcontext as _nullcontext
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..models.speecht5 import model as st5
from ..models.speecht5.config import SpeechT5Config
from ..ops.act_sharding import activation_mesh
from . import partition
from .mesh import AXES, data_sharding


def adamw(learning_rate: float = 1e-4, weight_decay: float = 0.01,
          warmup_steps: int = 0, total_steps: Optional[int] = None,
          clip_norm: Optional[float] = None,
          mu_dtype=None) -> optax.GradientTransformation:
    """AdamW with warmup-cosine schedule and optional global-norm
    gradient clipping (``clip_norm``; applied before the moment
    updates, the standard large-model recipe).

    ``mu_dtype`` (e.g. ``jnp.bfloat16``) stores Adam's FIRST moment in
    a narrower dtype — halves its HBM footprint + per-step traffic.
    The first moment is a smoothed gradient (bf16-robust); the second
    moment stays f32, whose wide dynamic range bf16 cannot hold.  This
    is what makes gpt2-large-class models trainable on one 16 GB chip
    (docs/BENCH.md GPT-2 family table)."""
    if warmup_steps or total_steps:
        total = total_steps or warmup_steps * 10
        # tiny smoke runs (--steps 3) must not trip the schedule: clamp
        # warmup under the total so decay_steps stays positive
        warmup = min(warmup_steps, max(total - 1, 0))
        sched = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup, total)
    else:
        sched = learning_rate
    tx = optax.adamw(sched, weight_decay=weight_decay, mu_dtype=mu_dtype)
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


def _decoupled_decay(weight_decay: float, sched) -> optax.GradientTransformation:
    """Schedule-scaled decoupled weight decay, chained AFTER an optimizer
    whose updates already carry the -lr sign: adds ``-lr_t * wd * p`` so
    decay tracks the (scheduled) learning rate exactly like optax.adamw's
    (which applies add_decayed_weights BEFORE scale_by_learning_rate).

    optax.adafactor's own ``weight_decay_rate`` is applied after its lr
    scaling — a RAW per-step shrink factor independent of lr/schedule
    (0.01/step decays weights by ~2e-44 over a 10k-step run), so it must
    stay None and this transform supplies the adamw-equivalent decay."""
    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("decoupled weight decay requires params")
        lr = sched(state.count) if callable(sched) else sched
        updates = jax.tree_util.tree_map(
            lambda u, p: u - (lr * weight_decay * p).astype(u.dtype),
            updates, params)
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def adafactor(learning_rate: float = 1e-3, weight_decay: float = 0.01,
              warmup_steps: int = 0, total_steps: Optional[int] = None,
              clip_norm: Optional[float] = None) -> optax.GradientTransformation:
    """Adafactor (Shazeer & Stern 2018): row/column-factored second
    moments, no first moment — optimizer state for an ``[a, b]`` matrix
    is ``a + b`` floats instead of AdamW's ``2*a*b``.  For gpt2-xl
    (1.5B params) that collapses 12.3 GB of f32 Adam state to ~6 MB,
    which is what fits the model on ONE 16 GB v5e chip together with
    buffer donation (docs/BENCH.md gpt2-xl row).

    ``multiply_by_parameter_scale=False`` so ``learning_rate`` has the
    same meaning as for :func:`adamw` (absolute, not relative) and the
    warmup-cosine schedule composes identically.  Weight decay is applied
    as adamw-equivalent decoupled decay (``-lr_t * wd * p``, see
    :func:`_decoupled_decay`) — optax.adafactor's built-in
    ``weight_decay_rate`` is deliberately NOT used (it is lr-independent
    and silently destroys long runs at adamw-style wd values)."""
    if warmup_steps or total_steps:
        total = total_steps or warmup_steps * 10
        warmup = min(warmup_steps, max(total - 1, 0))
        sched = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup, total)
    else:
        sched = learning_rate
    tx = optax.adafactor(
        learning_rate=sched, multiply_by_parameter_scale=False,
        momentum=None, weight_decay_rate=None)
    if weight_decay:
        tx = optax.chain(tx, _decoupled_decay(weight_decay, sched))
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


def reference_adam(learning_rate: float = 1e-3, weight_decay: float = 1e-4):
    """torch Adam(lr, weight_decay) parity: L2 added to grads before the
    moment updates (train_classifier.py:68)."""
    return optax.chain(optax.add_decayed_weights(weight_decay),
                       optax.scale_by_adam(), optax.scale(-learning_rate))


def _jit_step_pinned(step: Callable, mesh: Mesh, donate: bool) -> Callable:
    """jit ``step(params, opt_state, batch, rng)`` with out_shardings pinned
    to the INPUT shardings of params/opt_state (metrics replicated).

    Without the pin, GSPMD chooses its own output shardings and the first
    step's params come back laid out differently than they went in (e.g.
    a PartitionSpec(None) bias returned as PartitionSpec('tensor')), so
    the SECOND call recompiles the entire program — measured as a full
    extra compile in every trainer process (273 s on this CPU box, minutes
    of relay time on the TPU) — and the parameter layout silently drifts
    off partition.TRANSFORMER_RULES.  Pinning makes step's output sharding
    a fixed point of its input sharding: one compile, stable layout, and
    donated buffers are actually reusable.

    When called under an outer trace (the bench harness jits a chained
    loop around the step), tracers carry no committed sharding — the
    plain jit is used; it inlines into the outer program, which compiles
    once anyway.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    donate_argnums = (0, 1) if donate else ()
    plain = jax.jit(step, donate_argnums=donate_argnums)
    repl = NamedSharding(mesh, PartitionSpec())
    cache: Dict[str, Callable] = {}

    def _named(x):
        s = getattr(x, "sharding", None)
        return s if isinstance(s, NamedSharding) else repl

    def _canon(tree):
        # normalize stray single-device leaves (e.g. the optax count
        # scalar from tx.init) so call 1 and call 2 share a cache key
        return jax.tree_util.tree_map(
            lambda x: x if isinstance(getattr(x, "sharding", None),
                                      NamedSharding)
            else jax.device_put(x, repl), tree)

    def call(params, opt_state, batch, rng):
        leaves = jax.tree_util.tree_leaves((params, opt_state))
        if any(isinstance(l, jax.core.Tracer) for l in leaves):
            return plain(params, opt_state, batch, rng)
        params, opt_state = _canon(params), _canon(opt_state)
        if "fn" not in cache:
            outsh = (jax.tree_util.tree_map(_named, params),
                     jax.tree_util.tree_map(_named, opt_state),
                     repl)
            cache["fn"] = jax.jit(step, donate_argnums=donate_argnums,
                                  out_shardings=outsh)
        return cache["fn"](params, opt_state, batch, rng)

    return call


def _with_frozen_feature_encoder(params: Dict) -> Dict:
    """stop_gradient on the conv feature-extractor params.  Nothing
    upstream of the conv stack carries trainable parameters, so zero
    cotangents make the entire conv backward dead code — XLA drops it."""
    enc = params["encoder"]
    pre = enc["prenet"]
    frozen = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                    pre["feature_encoder"])
    return {**params,
            "encoder": {**enc, "prenet": {**pre, "feature_encoder": frozen}}}


def _zero_feature_encoder_updates(updates: Dict) -> Dict:
    """Zero the frozen subtree's optimizer updates.  stop_gradient already
    zeroes its grads, but AdamW's decoupled weight decay is applied to the
    *parameters* regardless of gradient — without this the frozen conv
    weights would still shrink every step."""
    enc = updates["encoder"]
    pre = enc["prenet"]
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, pre["feature_encoder"])
    return {**updates,
            "encoder": {**enc, "prenet": {**pre, "feature_encoder": zeroed}}}


def _cast_compute(params: Dict, batch: Dict, compute_dtype) -> tuple:
    """Mixed precision: cast float params + float batch entries to the
    compute dtype INSIDE the differentiated loss.  The ``astype`` VJP
    upcasts cotangents, so gradients come back in the master dtype (f32)
    and the optimizer state stays f32 — the standard scheme (bf16
    compute/activations, f32 master weights + Adam).  The win is HBM
    traffic: every residual saved for the backward is half-width, which
    is where the train-step bytes go (docs/BENCH.md cost analysis).
    Norm statistics, attention-kernel accumulators and the loss's
    log_softmax already reduce in f32 regardless of compute dtype."""
    from ..utils.pytree import cast_floating

    params = cast_floating(params, compute_dtype)
    batch = {k: (v.astype(compute_dtype)
                 if jnp.issubdtype(v.dtype, jnp.floating) else v)
             for k, v in batch.items()}
    return params, batch


def _accum_value_and_grad(loss_fn, params, batch, rng, accum: int):
    """Gradient accumulation over ``accum`` microbatches, EXACTLY
    equivalent to the full-batch step (dropout aside — each microbatch
    draws its own masks from a split of ``rng``).

    ``loss_fn(params, micro_batch, rng) -> (loss, aux)`` must report
    ``aux['nll_sum']``/``aux['ntokens']`` (both trainers' losses do).
    The accumulated quantity is the SUM-form loss: grads of nll_sum add
    across microbatches and one final division by the total token count
    reproduces the token-mean gradient — the microbatch mean would
    mis-weight ragged batches.  lax.scan keeps one microbatch of
    activations live at a time (the memory win)."""
    b = next(iter(batch.values())).shape[0]
    if b % accum:
        raise ValueError(f"batch size {b} not divisible by "
                         f"grad_accum {accum}")
    mb = b // accum
    # STRIDED split (microbatch j = rows j, j+accum, ...): under DP
    # sharding each device holds a contiguous B/dp block, so a contiguous
    # split would put whole microbatches on one device and GSPMD would
    # re-shard every scan step; the strided split keeps every microbatch
    # evenly spread.  Sum-form accumulation is permutation-invariant for
    # the dropout-FREE loss/grads; with dropout active each microbatch
    # draws its own masks (rngs[j]), so the row->microbatch assignment
    # picks which mask lands on which row — a different (equally valid)
    # trajectory than the contiguous split or the monolithic step, just
    # like any other accumulation scheme.
    micro = {k: v.reshape((mb, accum) + v.shape[1:]).swapaxes(0, 1)
             for k, v in batch.items()}
    rngs = jax.random.split(rng, accum)

    def sum_loss(p, mb_batch, r):
        loss, aux = loss_fn(p, mb_batch, r)
        return aux["nll_sum"].astype(jnp.float32), aux["ntokens"]

    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)

    def body(carry, xs):
        gacc, nll_acc, tok_acc = carry
        mb_batch, r = xs
        (nll, ntok), g = jax.value_and_grad(sum_loss, has_aux=True)(
            params, mb_batch, r)
        gacc = jax.tree_util.tree_map(jnp.add, gacc, g)
        return (gacc, nll_acc + nll, tok_acc + ntok.astype(jnp.float32)), None

    (gsum, nll_sum, ntok), _ = jax.lax.scan(
        body, (zeros, jnp.float32(0.0), jnp.float32(0.0)), (micro, rngs))
    n = jnp.maximum(ntok, 1.0)
    grads = jax.tree_util.tree_map(lambda g: (g / n).astype(g.dtype), gsum)
    loss = nll_sum / n
    return loss, {"ntokens": ntok, "nll_sum": nll_sum}, grads


def make_asr_train_step(
    cfg: SpeechT5Config,
    mesh: Mesh,
    tx: optax.GradientTransformation,
    *,
    donate: bool = True,
    remat=False,
    attn_impl: str = "dense",
    ring: Optional[tuple] = None,
    freeze_feature_encoder: bool = False,
    compute_dtype=None,
    grad_accum: int = 1,
    unroll_layers=True,
) -> Callable:
    """Returns jit'd step(params, opt_state, batch, rng) -> (params,
    opt_state, metrics); fully sharded (params: FSDP/TP, batch: DP).

    ``unroll_layers`` (default True): unroll the encoder's layer scan
    into straight-line XLA — measured −11% on the B=16 x 5 s step
    (65.4 -> 58.0 ms; inter-layer fusion, no stacked-residual
    dynamic-update-slices) at the cost of compile time.  Set False to
    keep the compact scan (e.g. exotic layer counts without a warm
    compilation cache).

    ``grad_accum``: split the batch into this many microbatches and
    accumulate sum-form gradients (_accum_value_and_grad) — exact
    token-mean equivalence to the full-batch step, at 1/N the
    activation memory (trains effective batches that OOM monolithic).

    ``attn_impl``: 'dense' | 'flash' | 'ring' | 'ulysses' routes encoder
    self-attention (models/speecht5/model.asr_loss) — flash+remat is what
    makes conversation-scale fine-tuning fit (dense OOMs at >=8k encoder
    frames, docs/BENCH.md).  The kernels have no attention-prob dropout,
    so attention_dropout is explicitly zeroed for them (all other dropouts
    keep their configured rates); without this the encoder path would
    silently fall back to dense under training dropout
    (ops/attention.py use_flash gate) and re-OOM.

    ``remat``: False/"none" | True/"full" | "dots" | "hybrid"
    (ops/remat.py).  "full" minimizes memory (recomputes each encoder
    layer); "dots"/"hybrid" target the HBM-bound backward — they skip
    storing the fat f32 intermediates while saving MXU dot outputs
    (+ dropout masks).  All exact; numerics match remat=False.

    ``freeze_feature_encoder``: the HF fine-tuning convention
    (``model.freeze_feature_encoder()``, standard for wav2vec2-family
    models incl. SpeechT5) — conv feature-extractor params get zero grads
    and zero updates (incl. weight decay), and XLA drops the conv-stack
    backward entirely.

    ``compute_dtype``: e.g. ``jnp.bfloat16`` for mixed-precision training
    (see _cast_compute) — master params/optimizer stay f32.
    """
    import dataclasses
    import warnings

    if attn_impl != "dense" and cfg.attention_dropout > 0.0:
        warnings.warn(
            f"attn_impl={attn_impl!r} carries no attention-prob dropout: "
            f"attention_dropout={cfg.attention_dropout} is zeroed for this "
            "run (all other dropout rates keep their configured values). "
            "Use attn_impl='dense' if attention dropout must be active.",
            UserWarning, stacklevel=2)
        cfg = dataclasses.replace(cfg, attention_dropout=0.0)

    # boundary activation-sharding constraints (models call
    # ops.act_sharding.constrain_batch at module seams) — pins the
    # batch-sharded megatron layout so GSPMD never propagates exotic
    # activation shardings through the composed fwd+bwd (see
    # act_sharding.py for the 3-axis-mesh miscompile this also guards).
    # Ring/Ulysses SP shard the SEQUENCE axis instead, so the batch-only
    # constraint must stay off there.
    use_act_mesh = attn_impl not in ("ring", "ulysses")

    def loss_fn(params, batch, rng):
        if freeze_feature_encoder:
            params = _with_frozen_feature_encoder(params)
        if compute_dtype is not None:
            params, batch = _cast_compute(params, batch, compute_dtype)
        with (activation_mesh(mesh, batch_axes=(AXES.data, AXES.fsdp))
              if use_act_mesh else _nullcontext()):
            loss, aux = st5.asr_loss(
                params, cfg, batch["input_values"], batch["attention_mask"],
                batch["labels"], deterministic=False, rng=rng, remat=remat,
                attn_impl=attn_impl, ring=ring, unroll_layers=unroll_layers)
        return loss, aux

    def step(params, opt_state, batch, rng):
        if grad_accum > 1:
            loss, aux, grads = _accum_value_and_grad(
                loss_fn, params, batch, rng, grad_accum)
        else:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        if freeze_feature_encoder:
            updates = _zero_feature_encoder_updates(updates)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm, **aux}

    return _jit_step_pinned(step, mesh, donate)


def make_lm_train_step(
    cfg, mesh: Mesh, tx: optax.GradientTransformation, *,
    donate: bool = True,
    attn_impl: str = "dense",
    ring: Optional[tuple] = None,
    remat=False,
    compute_dtype=None,
    loss_impl: str = "chunked",
    grad_accum: int = 1,
) -> Callable:
    """GPT-2 causal-LM training step: batch = {ids [B, L], lengths [B]};
    loss = mean NLL over tokens 1..len-1 (padding inert under causality).

    ``attn_impl``: 'dense' | 'flash' | 'ring' | 'ulysses' for long-context
    training (ring/ulysses need ``ring=(mesh, axis_name)`` and the batch's
    sequence axis sharded on that mesh axis).  attn_pdrop is zeroed for
    the non-dense kernels (they carry no attention-prob dropout; the
    model would otherwise refuse, models/gpt2/model.py).

    ``compute_dtype``: e.g. ``jnp.bfloat16`` for mixed-precision training
    (see _cast_compute) — master params/optimizer stay f32.

    ``loss_impl``: 'chunked' (default) computes the NLL straight from
    hidden states via the checkpointed chunked lm head — the [B, L, V]
    logits tensor (1.6 GB f32 at gpt2/B=8/L=1024) never exists in fwd OR
    bwd; 'dense' materializes logits (the naive form, kept for parity
    tests)."""
    import dataclasses
    import warnings

    from ..models.gpt2 import model as g

    if attn_impl != "dense" and cfg.attn_pdrop > 0.0:
        warnings.warn(
            f"attn_impl={attn_impl!r} carries no attention-prob dropout: "
            f"attn_pdrop={cfg.attn_pdrop} is zeroed for this run (all "
            "other dropout rates keep their configured values). Use "
            "attn_impl='dense' if attention dropout must be active.",
            UserWarning, stacklevel=2)
        cfg = dataclasses.replace(cfg, attn_pdrop=0.0)
    if loss_impl not in ("dense", "chunked"):
        raise ValueError(f"loss_impl must be 'dense' or 'chunked', "
                         f"got {loss_impl!r}")

    # see make_asr_train_step: batch-layout constraints stay off under SP
    use_act_mesh = attn_impl not in ("ring", "ulysses")

    def loss_fn(params, batch, rng):
        if compute_dtype is not None:
            params, batch = _cast_compute(params, batch, compute_dtype)
        with (activation_mesh(mesh, batch_axes=(AXES.data, AXES.fsdp))
              if use_act_mesh else _nullcontext()):
            if loss_impl == "chunked":
                hidden, _ = g.gpt2_forward(params, cfg, batch["ids"],
                                           deterministic=False,
                                           dropout_rng=rng,
                                           attn_impl=attn_impl, ring=ring,
                                           remat=remat)
                nll = g.token_nll_from_hidden(
                    params["wte"]["weight"], hidden, batch["ids"],
                    checkpoint_chunks=True)              # [B, L-1]
            else:
                logits, _ = g.gpt2_logits(params, cfg, batch["ids"],
                                          deterministic=False,
                                          dropout_rng=rng,
                                          attn_impl=attn_impl, ring=ring,
                                          remat=remat)
                nll = g.token_nll(logits, batch["ids"])  # [B, L-1]
        t = nll.shape[1]
        valid = (jnp.arange(t)[None, :] < (batch["lengths"] - 1)[:, None])
        n = jnp.maximum(jnp.sum(valid), 1)
        loss = jnp.sum(nll * valid) / n
        return loss, {"ntokens": n, "nll_sum": jnp.sum(nll * valid)}

    def step(params, opt_state, batch, rng):
        if grad_accum > 1:
            loss, aux, grads = _accum_value_and_grad(
                loss_fn, params, batch, rng, grad_accum)
        else:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss,
                                   "grad_norm": optax.global_norm(grads), **aux}

    return _jit_step_pinned(step, mesh, donate)


def pad_batch(batch: Dict[str, Any], multiple: int,
              label_pad_id: int = -100) -> Dict[str, Any]:
    """Pad the batch axis to a multiple of the DP width.  Padded rows carry
    zero attention mask and all-pad labels, so they contribute nothing to
    the loss."""
    b = next(iter(batch.values())).shape[0]
    pad = -b % multiple
    if pad == 0:
        return batch
    out = {}
    for k, v in batch.items():
        fill = label_pad_id if k == "labels" else 0
        widths = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
        out[k] = jnp.pad(jnp.asarray(v), widths, constant_values=fill)
    return out


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                grad_accum: int = 1) -> Dict[str, Any]:
    """Pad the batch to a multiple of the DP width (x ``grad_accum`` so
    the microbatch split divides evenly AND every microbatch stays a DP
    multiple — ragged epoch-final batches train instead of crashing;
    padded rows carry zero masks / all-pad labels and contribute zero
    valid tokens to the sum-form loss) and place it with data sharding."""
    dp = mesh.shape[AXES.data] * mesh.shape[AXES.fsdp]
    batch = pad_batch(batch, dp * max(grad_accum, 1))
    sh = data_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def init_sharded(init_fn: Callable, rng, cfg, mesh: Mesh,
                 rules=partition.TRANSFORMER_RULES) -> Dict:
    """Initialize parameters directly with their target shardings (avoids a
    host-memory replica of the full model: jit + out_shardings)."""
    abstract = jax.eval_shape(partial(init_fn, rng=rng, cfg=cfg))
    shardings = partition.sharding_tree(abstract, mesh, rules)
    return jax.jit(lambda r: init_fn(rng=r, cfg=cfg),
                   out_shardings=shardings)(rng)
