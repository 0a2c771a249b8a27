"""LoCo-ASR TPU: a TPU-native long-context speech framework.

A from-scratch rebuild of the capabilities of the LoCo-ASR research stack
(SLURP intent pipelines, SpeechT5-family speech/text encoders, GPT-2 LM
perplexity over Fisher conversations, long-context ASR decoding) designed
TPU-first: JAX/XLA for the compute path, Pallas kernels for the hot ops,
``jax.sharding`` meshes for scale-out, and a small C++ native layer for
host-side audio IO.

Layout:
  ops/        -- functional NN layers, attention, audio front-end, Pallas kernels
  models/     -- SpeechT5 encoder/decoder, GPT-2 LM, intent classifier heads
  parallel/   -- device mesh, partition rules, collective helpers
  data/       -- Kaldi-format ingest, SLURP/Fisher adapters, LM datasets
  decode/     -- greedy/beam decoding, LM shallow fusion, conversation context
  pipelines/  -- CLI entry points mirroring the reference argparse surfaces
  utils/      -- configs, pytree/torch interop, metrics, checkpointing
"""

__version__ = "0.1.0"
