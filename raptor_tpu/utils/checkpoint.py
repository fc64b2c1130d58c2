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


class _RestrictedUnpickler(pickle.Unpickler):
    """Treedef unpickler restricted to pytree/framework types.

    Treedefs hold static aux data (configs, shapes) of custom pytree nodes,
    so they cannot be flat JSON; plain ``pickle.load`` would however execute
    arbitrary callables from an untrusted file (ADVICE r1). Restrict the
    loadable classes to the modules a raptor_tpu treedef can legitimately
    reference.
    """

    _ALLOWED_PREFIXES = (
        "raptor_tpu.",
        "jax.",
        "jaxlib.",
        "numpy",
        "builtins",
        "collections",
        "functools",
    )
    _DENIED = {
        ("builtins", "eval"), ("builtins", "exec"), ("builtins", "compile"),
        ("builtins", "open"), ("builtins", "__import__"),
        ("functools", "partial"),  # can smuggle arbitrary callables
    }

    def find_class(self, module, name):
        if (module, name) in self._DENIED or not any(
            module == p.rstrip(".") or module.startswith(p)
            for p in self._ALLOWED_PREFIXES
        ):
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
