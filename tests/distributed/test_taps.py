"""TAPS two-level exchange == flat ring exchange (same extended-vector
layout: both ghost orderings are sorted-unique per shard)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from raptor_tpu.core import ell_from_csr
from raptor_tpu.gallery import poisson_3d
from raptor_tpu.parallel import distribute_matrix, halo_exchange
from raptor_tpu.parallel.taps import TapsPlan, build_taps_plan, taps_exchange

NDEV = 8
N_NODES, N_CHIPS = 2, 4

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < NDEV, reason="needs 8 (virtual) devices"
)


def test_taps_matches_flat_exchange():
    A = poisson_3d(8)
    E = ell_from_csr(A, dtype=np.float64, row_pad_multiple=8 * NDEV)
    n = E.n_rows_pad
    x = jnp.arange(n, dtype=jnp.float64) * 0.5 + 3.0

    # flat reference
    dm = distribute_matrix(E, NDEV)
    mesh1 = jax.make_mesh((NDEV,), ("x",), devices=jax.devices()[:NDEV])
    from raptor_tpu.parallel.dist import _dm_spec

    ext_flat = jax.jit(
        jax.shard_map(
            lambda dm, x: halo_exchange(x, dm.halo),
            mesh=mesh1, in_specs=(_dm_spec(dm), P("x")), out_specs=P("x"),
        )
    )(dm, x)

    # taps
    plan, _ = build_taps_plan(E, N_NODES, N_CHIPS)
    mesh2 = jax.make_mesh((N_NODES, N_CHIPS), ("node", "chip"),
                          devices=jax.devices()[:NDEV])
    spec_plan = TapsPlan(
        send_idx=tuple(P("node", "chip", None) for _ in plan.send_idx),
        recv_tgt=tuple(P("node", "chip", None) for _ in plan.recv_tgt),
        local_src=P("node", "chip", None), local_tgt=P("node", "chip", None),
        offsets=plan.offsets, n_local=plan.n_local, n_ext=plan.n_ext,
        n_nodes=plan.n_nodes, n_chips=plan.n_chips,
    )
    ext_taps = jax.jit(
        jax.shard_map(
            lambda pl_, x: taps_exchange(x, pl_),
            mesh=mesh2, in_specs=(spec_plan, P(("node", "chip"))),
            out_specs=P(("node", "chip")),
        )
    )(plan, x)

    nl = n // NDEV
    ef = np.asarray(ext_flat).reshape(NDEV, -1)
    et = np.asarray(ext_taps).reshape(NDEV, -1)
    # owned part identical
    assert np.array_equal(ef[:, :nl], et[:, :nl])
    assert ef.shape == et.shape  # same ghost ordering by construction
    # every ghost slot must hold the right global value in BOTH schemes
    cols = np.asarray(E.cols)
    nnz = np.asarray(E.row_nnz)
    K = E.K
    mask = np.arange(K)[:, None] < nnz[None, :]
    owner = cols // nl
    shard_of_row = np.repeat(np.arange(NDEV), nl)[None, :]
    for p in range(NDEV):
        sel = mask & (shard_of_row == p) & (owner != p)
        ghosts = np.unique(cols[sel])
        for rank, g in enumerate(ghosts):
            want = float(g) * 0.5 + 3.0
            assert ef[p, nl + rank] == want, ("flat", p, g)
            assert et[p, nl + rank] == want, ("taps", p, g)
