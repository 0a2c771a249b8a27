"""conv1d_nhc parity: both lowerings (TPU-native NHC conv, and the
channel-major fallback used off-TPU because XLA:CPU compiles NHC 1-D
convs pathologically slowly) must match the NCH reference kernel exactly
for every stride/padding/groups combination the prenets use
(models/speecht5/prenets.py:129,230)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from loco_asr_tpu.ops import layers


CASES = [
    dict(in_ch=16, out_ch=16, kernel=3, stride=2, padding=0, groups=1),
    dict(in_ch=16, out_ch=32, kernel=10, stride=5, padding=0, groups=1),
    dict(in_ch=32, out_ch=32, kernel=16, stride=1, padding=8, groups=4),
    dict(in_ch=8, out_ch=8, kernel=5, stride=1, padding=2, groups=8),
]


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("use_bias", [False, True])
def test_conv1d_nhc_matches_nch(case, use_bias):
    rng = np.random.default_rng(0)
    b, t = 2, 64
    x = jnp.asarray(rng.standard_normal((b, case["in_ch"], t)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(
        (case["out_ch"], case["in_ch"] // case["groups"], case["kernel"])
    ).astype(np.float32))
    bias = (jnp.asarray(rng.standard_normal(case["out_ch"]).astype(np.float32))
            if use_bias else None)

    params = {"weight": w}
    if use_bias:
        params["bias"] = bias
    want = layers.conv1d(params, x, stride=case["stride"],
                         padding=case["padding"], groups=case["groups"])

    got = layers.conv1d_nhc(jnp.transpose(x, (0, 2, 1)), w,
                            stride=case["stride"], padding=case["padding"],
                            groups=case["groups"], bias=bias)
    np.testing.assert_allclose(np.asarray(jnp.transpose(got, (0, 2, 1))),
                               np.asarray(want), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("case", CASES)
def test_conv1d_nhc_tpu_branch_matches(case, monkeypatch):
    """Exercise the NHC-native lowering (normally TPU-only) at tiny shapes —
    the layout branch must be numerics-invisible."""
    rng = np.random.default_rng(1)
    b, t = 2, 32
    x = jnp.asarray(rng.standard_normal((b, t, case["in_ch"])).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(
        (case["out_ch"], case["in_ch"] // case["groups"], case["kernel"])
    ).astype(np.float32))

    cpu_path = layers.conv1d_nhc(x, w, stride=case["stride"],
                                 padding=case["padding"], groups=case["groups"])
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    nhc_path = layers.conv1d_nhc(x, w, stride=case["stride"],
                                 padding=case["padding"], groups=case["groups"])
    np.testing.assert_allclose(np.asarray(nhc_path), np.asarray(cpu_path),
                               atol=1e-5, rtol=1e-5)
