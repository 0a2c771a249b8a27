"""Full-scale real-checkpoint validation harness (VERDICT missing #1 /
next-round #10).

This container is egress-free and ships no model weights, so the headline
parities — <1e-3 embedding MAE vs the reference extraction pipeline,
86.72% SLURP intent accuracy, Fisher GPT-2 PPL — cannot be measured here.
This script is the complete, ready-to-run procedure for a machine that
HAS the weights; docs/VALIDATION.md records exactly what remains unproven
until it is run.

Usage (any subset; each section skips cleanly when its input is absent):

  python scripts/validate_real_weights.py \
      --speecht5_hf   /path/to/microsoft-speecht5_asr/     # HF dir \
      --speecht5_base /path/to/speecht5_base.pt            # fairseq ckpt \
      --gpt2_hf       /path/to/gpt2/                       # HF dir \
      --audio         /path/to/sample.wav ...              # >=1 real wavs \
      --slurp_embeddings /path/to/ref_embedding_dir        # ref pickle(s) \
      --out report.json

Checks, mirroring the reference pipelines they validate:

  1. speecht5-hf   : import microsoft/speecht5_asr through
                     models/speecht5/import_torch.load_hf_state_dict at
                     FULL size; run HF torch and our JAX encoder on the
                     same audio; report max|delta| and MAE
                     (ref: extract_speecht5_embeddings_slurp.py:60-108;
                     budget <1e-3 MAE per BASELINE.md).
  2. speecht5-base : graft speecht5_base.pt (fairseq) through the C5
                     rename mapper; forward-finite + stat ranges; if the
                     HF model is also given, cross-check the shared
                     encoder stack (ref: map_speecht5_hf.py:34-92).
  3. gpt2          : import GPT-2 at full size; our NLL vs HF torch NLL
                     on a fixed prompt set, max|delta| (ref:
                     eval_ppl_with_pretrained_lm.py:78-97).
  4. slurp-parity  : if reference-produced embedding pickles are given,
                     compare our extraction of the same records
                     (data/embedding_store.py compat layer) — MAE and
                     cosine per record.
  5. shorten-golden: decode a REAL LDC shorten-coded .sph against staged
                     sph2pipe output, sample-exact (the external oracle
                     tests/test_shorten.py cannot provide offline).

Every check writes {"check": ..., "status": "pass|fail|skipped", ...}
into the --out JSON; paste that file into docs/VALIDATION.md when run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EMBED_MAE_BUDGET = 1e-3    # BASELINE.md: embedding parity budget
NLL_TOL = 5e-3             # per-token NLL abs tolerance at full size


def _load_audio(paths, seconds=5.0, sr=16000):
    """Real wavs via our own decoder; deterministic noise fallback."""
    if paths:
        from loco_asr_tpu.ops.audio import load_audio
        return [load_audio(p, target_sr=sr) for p in paths]
    rng = np.random.default_rng(0)
    return [(rng.standard_normal(int(seconds * sr)).astype(np.float32) * 0.1,
             sr)]


def check_speecht5_hf(hf_dir, audio_paths, seconds: float = 5.0):
    import torch
    from transformers import SpeechT5ForSpeechToText, SpeechT5Processor

    import jax
    from loco_asr_tpu.models.speecht5 import model as st5
    from loco_asr_tpu.models.speecht5.config import SpeechT5Config
    from loco_asr_tpu.models.speecht5.import_torch import load_hf_state_dict

    hf = SpeechT5ForSpeechToText.from_pretrained(
        hf_dir, local_files_only=True).eval()
    params = load_hf_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()})
    cfg = SpeechT5Config(**{
        f: getattr(hf.config, f) for f in SpeechT5Config.__dataclass_fields__
        if hasattr(hf.config, f)})

    try:  # local_files_only: hub lookups hang on egress-free machines
        processor = SpeechT5Processor.from_pretrained(
            hf_dir, local_files_only=True)
    except Exception:
        processor = None

    maes, maxes = [], []
    for wav, sr in _load_audio(audio_paths, seconds=seconds):
        if processor is not None:
            feats = processor(audio=wav, sampling_rate=sr,
                              return_tensors="pt")
            t_in = feats["input_values"]
        else:
            t_in = torch.from_numpy(np.asarray(wav, np.float32))[None]
        with torch.no_grad():
            ref = hf.speecht5.encoder(t_in).last_hidden_state.numpy()
        ours = np.asarray(st5.encode_speech(
            params, cfg, jax.numpy.asarray(t_in.numpy()),
            jax.numpy.ones(t_in.shape, jax.numpy.int32))[0])
        maes.append(float(np.abs(ours - ref).mean()))
        maxes.append(float(np.abs(ours - ref).max()))
    mae = float(np.mean(maes))
    return {"check": "speecht5-hf-encoder-parity", "mae": mae,
            "max_abs": float(np.max(maxes)), "budget": EMBED_MAE_BUDGET,
            "status": "pass" if mae < EMBED_MAE_BUDGET else "fail"}


def check_speecht5_base(fairseq_ckpt, hf_dir=None, seconds: float = 5.0):
    import torch

    import jax
    import jax.numpy as jnp
    from loco_asr_tpu.models.speecht5 import model as st5
    from loco_asr_tpu.models.speecht5.config import SpeechT5Config
    from loco_asr_tpu.models.speecht5 import import_torch as it
    from loco_asr_tpu.utils.pytree import flatten_with_paths

    state = torch.load(fairseq_ckpt, map_location="cpu", weights_only=False)
    cfg = SpeechT5Config()
    params = st5.asr_init(jax.random.PRNGKey(0), cfg)
    grafted = it.graft_fairseq_into_asr(params, state)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal(
        (1, int(seconds * 16000))).astype(np.float32) * 0.1)
    out, _ = st5.encode_speech(grafted, cfg, wav,
                               jnp.ones(wav.shape, jnp.int32))
    out = np.asarray(out)
    finite = bool(np.isfinite(out).all())
    result = {"check": "speecht5-base-graft",
              "finite": finite, "out_std": float(out.std()),
              "status": "pass" if finite and 1e-3 < out.std() < 1e3 else "fail"}

    if hf_dir is not None:
        # cross-check the shared encoder stack structurally: every leaf the
        # graft produced must exist with the same shape in the HF-imported
        # tree (the reference's load_state_dict strict-key assertion,
        # map_speecht5_hf.py:94-99 / notebook 4)
        from transformers import SpeechT5ForSpeechToText

        hf = SpeechT5ForSpeechToText.from_pretrained(
            hf_dir, local_files_only=True).eval()
        hf_params = load_hf_state_dict_for_asr(hf)
        got = {k: v.shape for k, v in flatten_with_paths(
            grafted["encoder"]).items()}
        want = {k: v.shape for k, v in flatten_with_paths(
            hf_params["encoder"]).items()}
        missing = sorted(set(got) - set(want))
        mismatched = sorted(k for k in got if k in want
                            and tuple(got[k]) != tuple(want[k]))
        result["hf_cross_check"] = {
            "grafted_leaves": len(got), "hf_leaves": len(want),
            "keys_not_in_hf": missing[:20], "shape_mismatches": mismatched[:20]}
        if missing or mismatched:
            result["status"] = "fail"
    return result


def load_hf_state_dict_for_asr(hf):
    from loco_asr_tpu.models.speecht5.import_torch import load_hf_state_dict

    return load_hf_state_dict({k: v.numpy() for k, v in
                               hf.state_dict().items()})


def check_gpt2(hf_dir):
    import torch
    from transformers import GPT2LMHeadModel, GPT2TokenizerFast

    import jax.numpy as jnp
    from loco_asr_tpu.models.gpt2 import import_torch as git, model as g

    hf = GPT2LMHeadModel.from_pretrained(hf_dir, local_files_only=True).eval()
    params = git.load_hf_gpt2(
        {k: v.numpy() for k, v in hf.state_dict().items()})
    cfg = g.GPT2Config(vocab_size=hf.config.vocab_size,
                       n_positions=hf.config.n_positions,
                       n_embd=hf.config.n_embd, n_layer=hf.config.n_layer,
                       n_head=hf.config.n_head)
    try:
        tok = GPT2TokenizerFast.from_pretrained(hf_dir,
                                                local_files_only=True)
        prompts = ["so how have you been doing lately",
                   "i think the weather has been pretty good",
                   "yeah we talked about that last week"]
        ids_list = [tok(p)["input_ids"] for p in prompts]
    except Exception:
        rng = np.random.default_rng(0)
        ids_list = [rng.integers(0, cfg.vocab_size, 32).tolist()
                    for _ in range(3)]

    deltas = []
    for ids in ids_list:
        t = torch.tensor([ids])
        with torch.no_grad():
            logits = hf(t).logits[0, :-1]
            ref = torch.nn.functional.cross_entropy(
                logits, t[0, 1:], reduction="none").numpy()
        ours = np.asarray(g.token_nll(
            g.gpt2_logits(params, cfg, jnp.asarray([ids]))[0],
            jnp.asarray([ids])))[0]
        deltas.append(float(np.abs(ours - ref).max()))
    worst = float(np.max(deltas))
    return {"check": "gpt2-nll-parity", "max_abs_nll_delta": worst,
            "tol": NLL_TOL,
            "status": "pass" if worst < NLL_TOL else "fail"}


def check_shorten_golden(sph_file, ref_pcm_file):
    """Decode a REAL (LDC-produced) shorten-coded SPHERE file with our
    codec and compare sample-exactly against staged sph2pipe output.

    tests/test_shorten.py proves self-roundtrip + Python/C++
    cross-implementation parity only — every in-repo fixture was produced
    by our own encoder, so a shared misreading of the shorten 2.x spec
    (e.g. the ULAW/AU1/AU2 internal-sample conventions) would pass those
    tests and silently corrupt real corpus ingest.  This check is the
    missing external oracle: ``ref_pcm_file`` must be the output of
    ``sph2pipe -f wav <sph_file>`` (or -c 1/-c 2 variants, one file per
    channel, concatenated channel-major)."""
    from loco_asr_tpu.ops.audio import read_sphere, read_wav

    samples, sr = read_sphere(sph_file)
    ref_f, ref_sr = read_wav(ref_pcm_file)
    # both sides are int16/32768-exact floats; compare in the int16 domain
    ours = np.round(np.asarray(samples).reshape(-1) * 32768.0).astype(np.int32)
    ref = np.round(np.asarray(ref_f).reshape(-1) * 32768.0).astype(np.int32)
    n = min(len(ours), len(ref))
    exact = bool(n > 0 and np.array_equal(ours[:n], ref[:n]))
    return {"check": "shorten-sph2pipe-golden",
            "n_samples": int(n), "sample_rate": int(sr),
            "len_match": len(ours) == len(ref),
            "max_abs_delta": (int(np.abs(ours[:n].astype(np.int64)
                                         - ref[:n].astype(np.int64)).max())
                              if n else None),
            "status": "pass" if exact and len(ours) == len(ref) else "fail"}


def check_slurp_embeddings(ref_dir, hf_dir, audio_root):
    """Compare reference-produced embedding pickles against our extraction
    of the same records — needs the HF model AND the SLURP audio."""
    from loco_asr_tpu.data.embedding_store import read_reference_pickles

    recs = list(read_reference_pickles(ref_dir))
    if hf_dir is None or audio_root is None:
        return {"check": "slurp-embedding-parity",
                "n_reference_records": len(recs),
                "status": "skipped",
                "reason": "needs --speecht5_hf and --slurp_audio too"}
    # Full comparison intentionally delegates to the extraction pipeline so
    # the EXACT production path is what gets validated:
    return {"check": "slurp-embedding-parity", "status": "todo",
            "howto": "run pipelines/extract_embeddings with --version "
                     "finetuned on the same records, then compare the "
                     "stores record-by-record (read_reference_pickles on "
                     "both sides; MAE budget 1e-3)"}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--speecht5_hf", default=None)
    p.add_argument("--speecht5_base", default=None)
    p.add_argument("--gpt2_hf", default=None)
    p.add_argument("--audio", nargs="*", default=None)
    p.add_argument("--slurp_embeddings", default=None)
    p.add_argument("--slurp_audio", default=None)
    p.add_argument("--golden_sph", default=None,
                   help="real LDC shorten-coded .sph file")
    p.add_argument("--golden_wav", default=None,
                   help="sph2pipe -f wav output of --golden_sph")
    p.add_argument("--out", default="real_weight_report.json")
    args = p.parse_args(argv)

    results = []
    jobs = [
        (args.speecht5_hf, "speecht5-hf-encoder-parity",
         lambda: check_speecht5_hf(args.speecht5_hf, args.audio)),
        (args.speecht5_base, "speecht5-base-graft",
         lambda: check_speecht5_base(args.speecht5_base, args.speecht5_hf)),
        (args.gpt2_hf, "gpt2-nll-parity",
         lambda: check_gpt2(args.gpt2_hf)),
        (args.slurp_embeddings, "slurp-embedding-parity",
         lambda: check_slurp_embeddings(args.slurp_embeddings,
                                        args.speecht5_hf, args.slurp_audio)),
        (args.golden_sph, "shorten-sph2pipe-golden",
         lambda: check_shorten_golden(args.golden_sph, args.golden_wav)),
    ]
    for path, name, fn in jobs:
        if path is None:
            results.append({"check": name, "status": "skipped",
                            "reason": "input not provided"})
            continue
        try:
            results.append(fn())
        except Exception as e:  # keep going; report everything
            results.append({"check": name, "status": "error",
                            "error": f"{type(e).__name__}: {e}"})

    for r in results:
        print(json.dumps(r))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    bad = [r for r in results if r["status"] in ("fail", "error")]
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
