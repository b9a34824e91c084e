"""Smoke tests for the standalone scripts/ tools on synthetic data."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args, cwd=None):
    r = subprocess.run([sys.executable, os.path.join(_REPO, "scripts", script),
                        *args],
                       capture_output=True, text=True, cwd=cwd, timeout=300,
                       env={**os.environ, "JAX_PLATFORMS": "cpu",
                            "PYTHONPATH": _REPO})
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r


def test_scripts_accept_help():
    for script in ("visualise_dataset.py", "generate_patches.py",
                   "convert_wi19.py", "visualise_attentions.py",
                   "hisfrag_visualize_results.py"):
        _run(script, "--help")


def test_generate_patches(tmp_path):
    rng = np.random.default_rng(0)
    src = tmp_path / "imgs"
    os.makedirs(src)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (200, 200, 3), np.uint8)).save(
            str(src / f"im{i}.png"))
    out = tmp_path / "patches"
    _run("generate_patches.py", "--data-path", str(src),
         "--output-path", str(out), "--patch-size", "64")
    assert len(list(out.rglob("*"))) > 0


def test_convert_wi19(tmp_path):
    import pandas as pd

    names = ["w1_a", "w1_b", "w2_a", "w2_b"]
    sim = pd.DataFrame(np.random.default_rng(0).random((4, 4)),
                       index=names, columns=names)
    sim_csv = tmp_path / "sim.csv"
    sim.to_csv(sim_csv)
    _run("convert_wi19.py", "--similarity_file", str(sim_csv), cwd=str(tmp_path))
    gt = (tmp_path / "gt.csv").read_text().splitlines()
    assert gt[0] == "w1_a,w1"
    dm = pd.read_csv(tmp_path / "distance_matrix.csv", index_col=0)
    np.testing.assert_allclose(dm.values, 1.0 - sim.values)


def test_visualise_dataset(tmp_path):
    rng = np.random.default_rng(0)
    for p in range(2):
        d = (tmp_path / "mich" / f"pap{p}" / "front" / "detail"
             / f"pap{p}sub" / "papyrus" / "x")
        os.makedirs(d)
        for f in range(2):
            Image.fromarray(rng.integers(0, 255, (600, 600, 3), np.uint8)).save(
                str(d / f"f{f}.png"))
    out = tmp_path / "viz"
    _run("visualise_dataset.py", "--data-path", str(tmp_path / "mich"),
         "--output-path", str(out), "--n-samples", "2")
    assert len(list(out.glob("sample_*.png"))) == 2
