"""Hierarchy / solver-state checkpointing (SURVEY.md §5.4).

Setup is the expensive phase worth caching: hierarchies are pytrees, so they
serialize directly.  Uses orbax when available, with a plain ``numpy.savez``
fallback (no extra dependencies).  Solver state (x, r, p, iter) between jit
calls checkpoints the same way.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree", "save_hierarchy", "load_hierarchy"]


def _allowed_globals() -> set[tuple[str, str]]:
    """Exact (module, name) pairs a raptor_tpu treedef pickle can reference
    (ADVICE r2: prefix allowlists still admit exec gadgets — e.g.
    numpy.testing's runstring — and attribute-chain escapes via getattr;
    enumerate the legitimate closure instead).

    The set is: primitive containers, numpy array/dtype reconstructors, the
    PyTreeDef type itself (located dynamically so jaxlib renames don't break
    us), and the framework's registered pytree node / config classes.
    Checkpoints remain SEMI-trusted: the allowlist bounds code execution to
    these constructors, but a crafted file can still build arbitrary
    instances of them.
    """
    allowed = {
        ("builtins", "tuple"), ("builtins", "list"), ("builtins", "dict"),
        ("builtins", "set"), ("builtins", "frozenset"), ("builtins", "int"),
        ("builtins", "float"), ("builtins", "str"), ("builtins", "bool"),
        ("builtins", "bytes"), ("builtins", "complex"),
        ("builtins", "NoneType"), ("builtins", "slice"),
        ("collections", "OrderedDict"),
        ("numpy", "dtype"), ("numpy", "ndarray"),
        ("numpy._core.multiarray", "_reconstruct"),
        ("numpy.core.multiarray", "_reconstruct"),
        ("numpy._core.multiarray", "scalar"),
        ("numpy.core.multiarray", "scalar"),
        ("numpy", "int32"), ("numpy", "int64"),
        ("numpy", "float32"), ("numpy", "float64"), ("numpy", "bool_"),
    }
    import jax

    td = type(jax.tree_util.tree_structure((0,)))
    allowed.add((td.__module__, td.__qualname__))
    # PyTreeDef.__reduce__ closes over the default registry object
    allowed.add(("jax._src.tree_util", "default_registry"))

    from raptor_tpu.config import AmgConfig, SolveConfig
    from raptor_tpu.core.bell import BlockEllMatrix
    from raptor_tpu.core.ell import EllMatrix
    from raptor_tpu.core.hybrid import (
        BandedMatrix, FarBlock, HybridMatrix, RectBanded)
    from raptor_tpu.parallel.partition import DistMatrix, HaloPlan
    from raptor_tpu.setup.hierarchy import Hierarchy, Level
    from raptor_tpu.solve.krylov import KrylovInfo

    for cls in (AmgConfig, SolveConfig, BlockEllMatrix, EllMatrix,
                BandedMatrix, FarBlock, HybridMatrix, RectBanded, DistMatrix,
                HaloPlan, Hierarchy, Level, KrylovInfo):
        allowed.add((cls.__module__, cls.__qualname__))
    return allowed


class _RestrictedUnpickler(pickle.Unpickler):
    """Treedef unpickler restricted to an exact allowlist of globals.

    Treedefs hold static aux data (configs, shapes) of custom pytree nodes,
    so they cannot be flat JSON; plain ``pickle.load`` would however execute
    arbitrary callables from an untrusted file.  ``find_class`` admits only
    the exact (module, name) pairs from ``_allowed_globals`` — notably
    excluding ``builtins.getattr``, ``functools.partial``, and everything
    under numpy/jax beyond the array reconstructors.  See
    ``_allowed_globals`` for the trust model (semi-trusted, not arbitrary
    hostile input).
    """

    def find_class(self, module, name):
        if (module, name) not in _allowed_globals():
            raise pickle.UnpicklingError(
                f"checkpoint treedef references disallowed {module}.{name}"
            )
        return super().find_class(module, name)


def _load_treedef(path: str):
    with open(path, "rb") as f:
        return _RestrictedUnpickler(f).load()


def save_pytree(path: str, tree: Any) -> None:
    """Serialize a jax pytree: leaves to .npz, treedef (incl. static meta)
    via pickle of the structure with placeholder leaves."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(
        path + ".leaves.npz",
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )
    with open(path + ".treedef.pkl", "wb") as f:
        pickle.dump(treedef, f)


def load_pytree(path: str) -> Any:
    treedef = _load_treedef(path + ".treedef.pkl")
    z = np.load(path + ".leaves.npz")
    leaves = [jax.numpy.asarray(z[f"leaf_{i}"]) for i in range(len(z.files))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_hierarchy(path: str, hier) -> None:
    """Checkpoint a built AMG hierarchy (orbax if present, npz otherwise)."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        leaves, _ = jax.tree_util.tree_flatten(hier)
        ckptr.save(os.path.abspath(path) + ".orbax", leaves, force=True)
        # treedef still via pickle (holds static config/meta)
        _, treedef = jax.tree_util.tree_flatten(hier)
        with open(path + ".treedef.pkl", "wb") as f:
            pickle.dump(treedef, f)
    except Exception:
        save_pytree(path, hier)


def load_hierarchy(path: str):
    if os.path.exists(path + ".orbax"):
        import orbax.checkpoint as ocp

        treedef = _load_treedef(path + ".treedef.pkl")
        ckptr = ocp.PyTreeCheckpointer()
        leaves = ckptr.restore(os.path.abspath(path) + ".orbax")
        return jax.tree_util.tree_unflatten(treedef, leaves)
    return load_pytree(path)
