"""Matrix/vector file I-O (utils/io.py) and the CLI --matrix surface."""

import json
import gzip

import numpy as np
import pytest
import scipy.sparse as sp

from raptor_tpu.gallery import convection_diffusion_2d, poisson_2d, default_rhs
from raptor_tpu.utils.io import (
    read_matrix,
    read_vector,
    write_matrix,
    write_vector,
)


def _rand_csr(n=40, density=0.1, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=density, random_state=rng,
                  format="csr", dtype=dtype)
    A.setdiag(np.abs(A).sum(1).A1 + 1.0)
    return A.tocsr()


@pytest.mark.parametrize("ext", ["mtx", "npz", "rbm"])
def test_matrix_round_trip(tmp_path, ext):
    A = _rand_csr()
    p = tmp_path / f"a.{ext}"
    write_matrix(p, A)
    B = read_matrix(p)
    assert B.shape == A.shape
    assert (B != A).nnz == 0


def test_matrix_round_trip_fp32_rbm(tmp_path):
    A = _rand_csr(dtype=np.float32)
    p = tmp_path / "a.rbm"
    write_matrix(p, A)
    B = read_matrix(p)
    assert B.dtype == np.float32
    assert (B != A).nnz == 0


def test_mtx_gz(tmp_path):
    A = poisson_2d(8)
    write_matrix(tmp_path / "a.mtx", A)
    raw = (tmp_path / "a.mtx").read_bytes()
    with gzip.open(tmp_path / "a.mtx.gz", "wb") as f:
        f.write(raw)
    B = read_matrix(tmp_path / "a.mtx.gz")
    assert (B != sp.csr_matrix(A)).nnz == 0


def test_read_matrix_canonicalizes(tmp_path):
    # duplicates and explicit zeros must be merged/dropped on read
    coo = sp.coo_matrix(([1.0, 2.0, 0.0], ([0, 0, 1], [1, 1, 0])),
                        shape=(3, 3))
    import scipy.io

    scipy.io.mmwrite(str(tmp_path / "d.mtx"), coo)
    A = read_matrix(tmp_path / "d.mtx")
    assert A.nnz == 1
    assert A[0, 1] == 3.0


def test_rbm_rejects_garbage(tmp_path):
    p = tmp_path / "x.rbm"
    p.write_bytes(b"NOTMAGIC" + b"\0" * 64)
    with pytest.raises(ValueError, match="magic"):
        read_matrix(p)


def test_rbm_rejects_truncation(tmp_path):
    A = _rand_csr()
    p = tmp_path / "a.rbm"
    write_matrix(p, A)
    p.write_bytes(p.read_bytes()[:-16])
    with pytest.raises(ValueError, match="truncated"):
        read_matrix(p)


def test_unknown_extension(tmp_path):
    with pytest.raises(ValueError, match="unsupported"):
        write_matrix(tmp_path / "a.xyz", _rand_csr())
    (tmp_path / "a.xyz").write_bytes(b"")
    with pytest.raises(ValueError, match="unsupported"):
        read_matrix(tmp_path / "a.xyz")


@pytest.mark.parametrize("ext", ["npy", "txt"])
def test_vector_round_trip(tmp_path, ext):
    v = np.random.default_rng(0).standard_normal(37)
    p = tmp_path / f"v.{ext}"
    write_vector(p, v)
    w = read_vector(p)
    assert np.allclose(v, w, atol=0, rtol=1e-15)


def test_cli_solve_from_file(tmp_path, capsys):
    """End-to-end user surface: write an operator + rhs to disk, solve via
    the CLI with --matrix/--rhs/--out, check the written solution."""
    from raptor_tpu.cli import main

    A = convection_diffusion_2d(16, epsilon=1e-2)
    b = default_rhs(A.shape[0])
    write_matrix(tmp_path / "A.mtx", A)
    write_vector(tmp_path / "b.npy", b)
    main(["solve", "--matrix", str(tmp_path / "A.mtx"),
          "--rhs", str(tmp_path / "b.npy"),
          "--out", str(tmp_path / "x.npy"),
          "--krylov", "gmres", "--tol", "1e-8"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["relres"] <= 1e-8
    x = read_vector(tmp_path / "x.npy")
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) <= 1e-7


def test_cli_rhs_length_mismatch(tmp_path):
    from raptor_tpu.cli import main

    A = poisson_2d(8)
    write_matrix(tmp_path / "A.npz", A)
    write_vector(tmp_path / "b.npy", np.ones(5))
    with pytest.raises(SystemExit, match="length"):
        main(["solve", "--matrix", str(tmp_path / "A.npz"),
              "--rhs", str(tmp_path / "b.npy")])
