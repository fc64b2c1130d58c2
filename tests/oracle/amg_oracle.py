"""Pure NumPy/SciPy fp64 oracle AMG — the executable convergence spec.

Deliberately simple and slow (SURVEY.md §4 "fixtures/fakes"): this stands in
for the missing reference implementation as ground truth for iteration
counts, hierarchies, and convergence factors.  The device library must match
these iteration counts (BASELINE.json:5 "same iteration count as reference
RAPtor", operationalized as this oracle — see BASELINE.md).

Textbook algorithms only: classical strength-of-connection, Ruge-Stüben
first-pass splitting, PMIS splitting (with the same deterministic tie-break
hash the device path uses), direct interpolation with ±-splitting, Galerkin
RAP, weighted-Jacobi / Gauss-Seidel smoothing, V-cycle, PCG.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

UNDECIDED, C_PT, F_PT = 0, 1, 2


def pmis_weights(lam: np.ndarray, seed: int = 0) -> np.ndarray:
    """PMIS weights w = min(|S^T_i|, 63) + perm_i/n with a deterministic
    random permutation as tie-break.  Uniqueness is by construction (the
    permutation is injective), so the device path can represent the same
    total order exactly in int32 as min(lam,63)*n + perm_i.  Must match
    raptor_tpu.setup.splitting."""
    n = lam.shape[0]
    perm = np.random.default_rng(seed).permutation(n)
    return np.minimum(lam, 63).astype(np.float64) + perm / n


def classical_strength(A: sp.csr_matrix, theta: float = 0.25) -> sp.csr_matrix:
    """S[i,j]=1 where -a_ij >= theta * max_k(-a_ik), j != i (classic, M-matrix
    oriented: only negative couplings can be strong)."""
    A = sp.csr_matrix(A)
    n = A.shape[0]
    D = A.diagonal()
    off = A - sp.diags(D)
    off.eliminate_zeros()
    neg = -off.toarray() if n <= 4000 else None
    rows, cols, vals = [], [], []
    indptr, indices, data = off.indptr, off.indices, off.data
    for i in range(n):
        s = slice(indptr[i], indptr[i + 1])
        v = -data[s]
        if v.size == 0:
            continue
        m = v.max()
        if m <= 0:
            continue
        strong = v >= theta * m
        rows.extend([i] * int(strong.sum()))
        cols.extend(indices[s][strong])
        vals.extend(np.ones(int(strong.sum())))
    S = sp.coo_matrix((vals, (rows, cols)), shape=A.shape).tocsr()
    return S


def rs_splitting(S: sp.csr_matrix) -> np.ndarray:
    """Classical Ruge-Stüben first-pass C/F splitting (bucket queue)."""
    n = S.shape[0]
    St = S.T.tocsr()
    lam = np.asarray(St.sum(axis=1)).ravel().astype(np.int64)  # |S^T_i|
    cf = np.full(n, UNDECIDED, dtype=np.int8)
    # isolated points (no strong connections either way) -> F immediately
    iso = (lam == 0) & (np.diff(S.indptr) == 0)
    cf[iso] = F_PT

    order = list(np.argsort(-lam, kind="stable"))
    lam_w = lam.astype(np.float64)
    import heapq

    heap = [(-lam_w[i], i) for i in range(n) if cf[i] == UNDECIDED]
    heapq.heapify(heap)
    while heap:
        negw, i = heapq.heappop(heap)
        if cf[i] != UNDECIDED or -negw != lam_w[i]:
            continue
        cf[i] = C_PT
        # points that strongly depend on i become F
        for j in St.indices[St.indptr[i]: St.indptr[i + 1]]:
            if cf[j] == UNDECIDED:
                cf[j] = F_PT
                # their strong influences get more attractive as C
                for k in S.indices[S.indptr[j]: S.indptr[j + 1]]:
                    if cf[k] == UNDECIDED:
                        lam_w[k] += 1
                        heapq.heappush(heap, (-lam_w[k], k))
    cf[cf == UNDECIDED] = F_PT
    return cf


def pmis_splitting(S: sp.csr_matrix, seed: int = 0) -> np.ndarray:
    """PMIS: parallel MIS on the symmetrized strength graph with weights
    from ``pmis_weights``.  Matches raptor_tpu.setup.splitting exactly."""
    n = S.shape[0]
    G = ((S + S.T) > 0).tocsr()
    lam = np.asarray(S.T.tocsr().sum(axis=1)).ravel()
    w = pmis_weights(lam, seed)
    cf = np.full(n, UNDECIDED, dtype=np.int8)
    iso = np.diff(G.indptr) == 0
    cf[iso] = F_PT
    while (cf == UNDECIDED).any():
        new_c = []
        for i in np.nonzero(cf == UNDECIDED)[0]:
            nbrs = G.indices[G.indptr[i]: G.indptr[i + 1]]
            und = nbrs[cf[nbrs] == UNDECIDED]
            if und.size == 0 or (w[i] > w[und]).all():
                new_c.append(i)
        cf[new_c] = C_PT
        for i in np.nonzero(cf == UNDECIDED)[0]:
            nbrs = G.indices[G.indptr[i]: G.indptr[i + 1]]
            if (cf[nbrs] == C_PT).any():
                cf[i] = F_PT
    return cf


def direct_interpolation(A: sp.csr_matrix, S: sp.csr_matrix, cf: np.ndarray):
    """Direct interpolation with ±-splitting (handles positive off-diagonals).

    For F point i with strong C set C_i:
      alpha = sum_{k in N_i} a_ik^- / sum_{j in C_i} a_ij^-
      beta  = sum_{k in N_i} a_ik^+ / sum_{j in C_i} a_ij^+
      w_ij  = -(alpha*a_ij^- + beta*a_ij^+) / a~_ii
    where a~_ii absorbs positive couplings when C_i has none.
    """
    A = sp.csr_matrix(A)
    n = A.shape[0]
    cmap = np.cumsum(cf == C_PT) - 1
    nc = int((cf == C_PT).sum())
    rows, cols, vals = [], [], []
    Sset = [set(S.indices[S.indptr[i]: S.indptr[i + 1]]) for i in range(n)]
    for i in range(n):
        if cf[i] == C_PT:
            rows.append(i)
            cols.append(cmap[i])
            vals.append(1.0)
            continue
        s = slice(A.indptr[i], A.indptr[i + 1])
        idx, av = A.indices[s], A.data[s]
        offd = idx != i
        dii = av[~offd].sum() if (~offd).any() else 0.0
        strongC = np.array(
            [j in Sset[i] and cf[j] == C_PT for j in idx], dtype=bool
        ) & offd
        if not strongC.any():
            continue  # F point with no strong C (isolated): zero row
        neg, pos = (av < 0) & offd, (av > 0) & offd
        num_neg, num_pos = av[neg].sum(), av[pos].sum()
        den_neg = av[strongC & (av < 0)].sum()
        den_pos = av[strongC & (av > 0)].sum()
        alpha = num_neg / den_neg if den_neg != 0 else 0.0
        if den_pos != 0:
            beta = num_pos / den_pos
        else:
            beta = 0.0
            dii += num_pos  # absorb positive couplings into the diagonal
        for j, a in zip(idx[strongC], av[strongC]):
            w = -(alpha * a if a < 0 else beta * a) / dii
            rows.append(i)
            cols.append(cmap[j])
            vals.append(w)
    return sp.coo_matrix((vals, (rows, cols)), shape=(n, nc)).tocsr()


def classical_interpolation(A: sp.csr_matrix, S: sp.csr_matrix, cf: np.ndarray):
    """Modified classical (Ruge-Stüben) interpolation: strong F-F
    connections are distributed through the common strong-C set,

      w_ij = -( a_ij + Σ_{k∈Fs_i} a_ik a_kj / Σ_{m∈Cs_i} a_km ) / ã_ii

    with weak couplings collapsed into the diagonal ã_ii, and F-F neighbors
    without common C handled by diagonal collapse as well."""
    A = sp.csr_matrix(A)
    n = A.shape[0]
    cmap = np.cumsum(cf == C_PT) - 1
    nc = int((cf == C_PT).sum())
    Sset = [set(S.indices[S.indptr[i]: S.indptr[i + 1]]) for i in range(n)]
    rows, cols, vals = [], [], []
    for i in range(n):
        if cf[i] == C_PT:
            rows.append(i); cols.append(cmap[i]); vals.append(1.0)
            continue
        s = slice(A.indptr[i], A.indptr[i + 1])
        idx, av = A.indices[s], A.data[s]
        Ci = {j for j in idx if j in Sset[i] and cf[j] == C_PT}
        if not Ci:
            continue  # isolated F: zero row
        dii = 0.0
        w = {j: 0.0 for j in Ci}
        for j, a in zip(idx, av):
            if j == i:
                dii += a
            elif j in Ci:
                w[j] += a
            elif j in Sset[i] and cf[j] == F_PT:
                # distribute a_ij over the common C set, weighted by a_jk
                sk = slice(A.indptr[j], A.indptr[j + 1])
                jdx, jav = A.indices[sk], A.data[sk]
                common = [(k, ak) for k, ak in zip(jdx, jav) if k in Ci]
                den = sum(ak for _, ak in common)
                if common and den != 0.0:
                    for k, ak in common:
                        w[k] += a * ak / den
                else:
                    dii += a  # no common C: collapse to diagonal
            else:
                dii += a  # weak connection: collapse to diagonal
        for j in Ci:
            rows.append(i); cols.append(cmap[j]); vals.append(-w[j] / dii)
    return sp.coo_matrix((vals, (rows, cols)), shape=(n, nc)).tocsr()


class Level:
    def __init__(self, A, P=None, R=None):
        self.A, self.P, self.R = sp.csr_matrix(A), P, R
        self.Dinv = 1.0 / self.A.diagonal()


def build_hierarchy(
    A,
    theta: float = 0.25,
    splitting: str = "rs",
    max_levels: int = 20,
    coarse_size: int = 40,
):
    levels = [Level(A)]
    while len(levels) < max_levels and levels[-1].A.shape[0] > coarse_size:
        Af = levels[-1].A
        S = classical_strength(Af, theta)
        cf = rs_splitting(S) if splitting == "rs" else pmis_splitting(S)
        nc = int((cf == C_PT).sum())
        if nc == 0 or nc == Af.shape[0]:
            break
        P = direct_interpolation(Af, S, cf)
        R = P.T.tocsr()
        Ac = (R @ Af @ P).tocsr()
        levels[-1].P, levels[-1].R = P, R
        levels.append(Level(Ac))
    return levels


def jacobi(A, Dinv, b, x, omega=2.0 / 3.0, sweeps=1):
    for _ in range(sweeps):
        x = x + omega * Dinv * (b - A @ x)
    return x


def vcycle(levels, k, b, x, omega=2.0 / 3.0, nu1=1, nu2=1):
    A = levels[k].A
    if k == len(levels) - 1:
        return spla.spsolve(A.tocsc(), b) if A.shape[0] > 1 else b / A[0, 0]
    x = jacobi(A, levels[k].Dinv, b, x, omega, nu1)
    r = b - A @ x
    rc = levels[k].R @ r
    ec = vcycle(levels, k + 1, rc, np.zeros_like(rc), omega, nu1, nu2)
    x = x + levels[k].P @ ec
    x = jacobi(A, levels[k].Dinv, b, x, omega, nu2)
    return x


def amg_pcg(A, b, levels=None, tol=1e-8, maxiter=200, **hier_kw):
    """PCG with one V(1,1) AMG cycle as the preconditioner.

    Returns (x, iterations, relative residual history)."""
    A = sp.csr_matrix(A)
    if levels is None:
        levels = build_hierarchy(A, **hier_kw)

    def M(r):
        return vcycle(levels, 0, r, np.zeros_like(r))

    x = np.zeros_like(b)
    r = b - A @ x
    z = M(r)
    p = z.copy()
    rz = r @ z
    bnorm = np.linalg.norm(b)
    hist = [np.linalg.norm(r) / bnorm]
    for it in range(1, maxiter + 1):
        Ap = A @ p
        alpha = rz / (p @ Ap)
        x += alpha * p
        r -= alpha * Ap
        res = np.linalg.norm(r) / bnorm
        hist.append(res)
        if res < tol:
            return x, it, hist
        z = M(r)
        rz_new = r @ z
        p = z + (rz_new / rz) * p
        rz = rz_new
    return x, maxiter, hist
