"""CLI driver end-to-end: every BASELINE config runs by name and reports
converged eigenpairs (SURVEY.md §2 C17, §5.6)."""

import json
import os

import pytest

from maxwell_tpu.cli import run as cli

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "..", "configs")


def run_cli(capsys, name, *extra):
    rc = cli.main([os.path.join(CONFIGS, name), *extra])
    assert rc == 0
    lines = [
        json.loads(l)
        for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    return lines[-1]  # final report


def test_config1(capsys):
    rep = run_cli(capsys, "config1.json", "--nev", "3")
    assert rep["converged"]
    assert max(rep["analytic_rel_err"]) < 3e-2


def test_config2(capsys):
    rep = run_cli(capsys, "config2.json", "--nev", "3", "--maxiter", "60")
    assert rep["converged"]
    assert max(rep["analytic_rel_err"]) < 1e-2


def test_config3(capsys):
    rep = run_cli(capsys, "config3.json")
    assert rep["converged"]
    assert min(rep["eigenvalues"]) > 30  # interior modes near sigma=45


def test_config4(capsys):
    rep = run_cli(capsys, "config4.json", "--maxiter", "40")
    assert rep["converged"]
    assert max(rep["analytic_rel_err"]) < 5e-2


def test_config5(capsys):
    rep = run_cli(capsys, "config5.json", "--nev", "8", "--maxiter", "80")
    assert rep["converged"]
    assert len(rep["eigenvalues"]) == 8


def test_config4_stencil(capsys):
    rep = run_cli(capsys, "config4_stencil.json", "--maxiter", "40")
    assert rep["converged"]
    assert max(rep["analytic_rel_err"]) < 5e-2


def test_eigenvector_export(capsys, tmp_path):
    import numpy as np

    out = str(tmp_path / "pairs.npz")
    rep = run_cli(
        capsys, "config1.json", "--nev", "2", "--save-eigenvectors", out
    )
    with np.load(out) as z:
        assert z["eigenvectors"].shape[1] == 2
        assert np.all(np.isfinite(z["eigenvalues"]))
