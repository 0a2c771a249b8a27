"""Smoke-run the exploration examples (reference notebooks' script twins)
in-process on tiny configs."""

import importlib.util
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: full pipeline drives / virtual-mesh collectives


@pytest.fixture(scope="module")
def shared_space_mod():
    # examples/ has no __init__.py; load by path.
    spec = importlib.util.spec_from_file_location(
        "shared_space_mod", "examples/02_shared_embedding_space.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_example_02_analysis_outputs(shared_space_mod, tmp_path, monkeypatch,
                                     capsys):
    monkeypatch.setattr(sys, "argv",
                        ["x", "--tiny", "--plot_dir", str(tmp_path)])
    shared_space_mod.main()
    out = capsys.readouterr().out
    assert "cosine similarity" in out
    assert "per-frame PCA" in out
    assert "pooled PCA coordinates" in out
    assert "kmeans(k=2)" in out


def test_pca_kmeans_helpers(shared_space_mod):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((20, 8)) + 10
    b = rng.standard_normal((20, 8)) - 10
    x = np.concatenate([a, b])
    proj = shared_space_mod.pca(x, 3)
    assert proj.shape == (40, 3)
    # PCA is centered: projections have ~zero mean
    assert np.abs(proj.mean(0)).max() < 1e-8
    assign, _ = shared_space_mod.kmeans(x, k=2)
    # two well-separated blobs -> perfect clustering (up to label swap)
    lab = np.array([0] * 20 + [1] * 20)
    agree = max((assign == lab).mean(), (assign != lab).mean())
    assert agree == 1.0
