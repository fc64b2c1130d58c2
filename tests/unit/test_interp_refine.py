"""Jacobi interpolation refinement (setup/aggressive.jacobi_refine_p,
hypre's jacobi_interp; VERDICT r3 next #3): quality recovery for the
multipass interpolation of aggressive (distance-2) splittings."""

import dataclasses

import numpy as np
import scipy.sparse as sp

from raptor_tpu.api import setup, solve
from raptor_tpu.config import AmgConfig, SolveConfig, PRESETS
from raptor_tpu.gallery import anisotropic_2d
from raptor_tpu.setup.hierarchy import hierarchy_stats


def _run(A, cfg):
    b = np.ones(A.shape[0])
    h = setup(A, cfg)
    st = hierarchy_stats(h)
    x, info = solve(A, b, cfg, SolveConfig(tol=1e-8, refine=True), hier=h)
    a64 = sp.csr_matrix(A).astype(np.float64)
    true_rel = float(np.linalg.norm(b - a64 @ x) / np.linalg.norm(b))
    return info, st, true_rel


def test_refine_cuts_iterations():
    """The config-3 quality fix: 2 refinement sweeps nearly halve the PCG
    iteration count off a multipass P (measured 37 -> 18 at 48^2) at a few
    percent operator-complexity cost."""
    A = anisotropic_2d(48)
    cfg = PRESETS["config3"]
    info_r, st_r, tr_r = _run(A, cfg)
    info_0, st_0, _ = _run(
        A, dataclasses.replace(cfg, interp_refine=0, p_max_elements=4))
    assert tr_r <= 1e-8
    assert info_r["iterations"] <= 25  # calibrated: 18 at first green
    assert info_r["iterations"] < info_0["iterations"] - 5
    assert st_r["operator_complexity"] <= 1.3  # the VERDICT r3 #3 bar


def test_refine_device_matches_host_path():
    """The device aggressive branch (setup/hierarchy.py) and the host-NumPy
    tail (setup/host_setup.py) build the same refined hierarchy: identical
    level sizes and iteration counts (values differ only in fp accumulation
    order)."""
    A = anisotropic_2d(32, epsilon=1e-3, theta=np.pi / 6)
    cfg = PRESETS["config3"]
    info_h, st_h, tr_h = _run(A, cfg)  # n < threshold: host tail
    info_d, st_d, tr_d = _run(
        A, dataclasses.replace(cfg, host_setup_threshold=0))  # device
    assert st_h["sizes"] == st_d["sizes"]  # bit-identical splittings
    assert abs(info_h["iterations"] - info_d["iterations"]) <= 1
    assert tr_h <= 1e-8 and tr_d <= 1e-8


def test_ell_truncate_p_matches_numpy():
    """Device ell_truncate_p == host _np_truncate_p (same keeps, same
    +/- -separate rescale) on a random interpolation-like operator."""
    import importlib

    import jax.numpy as jnp

    from raptor_tpu.core.ell import ell_from_csr, ell_to_csr
    from raptor_tpu.setup.aggressive import ell_truncate_p

    hs = importlib.import_module("raptor_tpu.setup.host_setup")
    rng = np.random.default_rng(3)
    n, k = 96, 9
    rows = np.repeat(np.arange(n), k)
    cols = np.concatenate([rng.choice(n, k, replace=False) for _ in range(n)])
    vals = np.round(rng.standard_normal(n * k), 3)  # distinct |w| w.h.p.
    P = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    E = ell_from_csr(P, dtype=jnp.float32, row_pad_multiple=8,
                     identity_pad_rows=False)
    got = ell_to_csr(ell_truncate_p(E, 4))[:n, :n]
    want = hs._np_truncate_p(P, 4)
    assert abs(got - want.astype(np.float32)).max() < 1e-5
