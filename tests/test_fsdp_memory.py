"""Executable gpt2-xl FSDP memory proof (scripts/fsdp_memory.py).

docs/BENCH.md's claim that `--mesh 1,N,1` divides the gpt2-xl training
state across chips is checked here by eval_shape + the partition rules —
no hardware, no allocation.  Reference motivation: the reference
evaluates gpt2-xl (eval_ppl_with_pretrained_lm.py:199-205)."""

import sys

sys.path.insert(0, ".")

GB = 1024 ** 3


def test_gpt2_xl_fsdp8_fits_16gb():
    import jax.numpy as jnp  # noqa: F401  (jax initialized by conftest)

    from loco_asr_tpu.models.gpt2 import model as g
    from scripts.fsdp_memory import memory_report

    cfg = g.PRESETS["gpt2-xl"]
    rep = memory_report(cfg, {"data": 1, "fsdp": 8, "tensor": 1}, "adamw")
    # ~1.5B params -> ~6.2 GiB f32 + 2x Adam state
    assert rep["n_params"] > 1.4e9
    assert rep["total_bytes"] > 17 * GB          # does NOT fit one chip
    assert rep["per_device_bytes"] < 16 * GB     # fits under FSDP x8
    # the replicated residue (norms, biases) must be a sliver
    assert rep["replicated_bytes"] < 0.2 * GB
    # sharding is real: per-device is close to total/8 + residue
    assert rep["per_device_bytes"] < rep["total_bytes"] / 8 + 0.5 * GB


def test_single_device_equals_total():
    from loco_asr_tpu.models.gpt2 import model as g
    from scripts.fsdp_memory import memory_report

    cfg = g.tiny_gpt2_config()
    rep = memory_report(cfg, {"data": 1, "fsdp": 1, "tensor": 1}, "adamw")
    assert rep["per_device_bytes"] == rep["total_bytes"]


def test_adafactor_state_is_negligible():
    from loco_asr_tpu.models.gpt2 import model as g
    from scripts.fsdp_memory import memory_report

    cfg = g.PRESETS["gpt2-xl"]
    rep = memory_report(cfg, {"data": 1, "fsdp": 1, "tensor": 1},
                        "adafactor")
    # factored second moments: a+b floats per [a,b] matrix
    assert rep["opt_bytes"] < 0.05 * rep["params_bytes"]


def test_mu_bf16_halves_first_moment():
    import jax.numpy as jnp

    from loco_asr_tpu.models.gpt2 import model as g
    from scripts.fsdp_memory import memory_report

    cfg = g.PRESETS["gpt2"]
    f32 = memory_report(cfg, {"data": 1, "fsdp": 1, "tensor": 1}, "adamw")
    b16 = memory_report(cfg, {"data": 1, "fsdp": 1, "tensor": 1}, "adamw",
                        mu_dtype=jnp.bfloat16)
    # mu halves, nu stays: opt bytes drop by ~25%
    ratio = b16["opt_bytes"] / f32["opt_bytes"]
    assert 0.70 < ratio < 0.80, ratio


def test_cli_smoke(capsys):
    from scripts.fsdp_memory import main

    assert main(["--model", "gpt2-xl", "--mesh", "1,8,1",
                 "--budget_gb", "16"]) == 0
    out = capsys.readouterr().out
    assert "per-device" in out and "OK" in out
    # one chip must be reported as EXCEEDED
    assert main(["--model", "gpt2-xl", "--mesh", "1,1,1",
                 "--budget_gb", "16"]) == 1
