"""CLI smoke tests (SURVEY.md §2b C20) — run in-process on the CPU backend."""

import json

import pytest


def run_cli(argv, capsys):
    from raptor_tpu.cli import main

    main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_info(capsys):
    out = run_cli(["info"], capsys)
    assert out["backend"] == "cpu"
    assert len(out["devices"]) >= 1


def test_cli_solve_algebraic(capsys):
    out = run_cli(["solve", "--problem", "poisson2d", "--n", "16",
                   "--fp64"], capsys)
    assert out["relres"] <= 1e-8
    assert out["iterations"] <= 30


def test_cli_solve_structured(capsys):
    out = run_cli(["solve", "--problem", "poisson2d", "--n", "32",
                   "--method", "structured", "--fp64"], capsys)
    assert out["relres"] <= 1e-8
    assert out["true_relres"] <= 1e-7


def test_cli_bench_preset(capsys):
    out = run_cli(["bench", "--preset", "config1", "--n", "16"], capsys)
    assert out["relres"] <= 1e-6
    assert out["stats"]["operator_complexity"] > 1.0


def test_cli_solve_banded_layout(capsys):
    """--layout banded routes the algebraic solve through the banded
    (RCM + dynamic-gather) operator layout."""
    out = run_cli(["solve", "--problem", "poisson3d", "--n", "12",
                   "--layout", "banded", "--fp64"], capsys)
    assert out["relres"] <= 1e-8
