"""Persistent XLA compile cache for non-CPU backends.

Remote-TPU compiles dominate every cold measurement (63 s for the
structured 128^3 setup, minutes for the banded refined solve through the
tunnel — docs/DESIGN.md §8), so both driver surfaces (``bench.py`` and the
``python -m raptor_tpu`` CLI) enable JAX's persistent compilation cache.
CPU stays off: XLA:CPU executable deserialization has segfaulted under
this jax pin (tests/conftest.py).
"""
from __future__ import annotations

import pathlib

_DEFAULT_DIR = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache_tpu"


def enable_persistent_cache(cache_dir: str | pathlib.Path | None = None,
                            min_compile_secs: float = 2.0) -> bool:
    """Point jax at an on-disk compile cache; returns True if enabled.

    No-op (returns False) on the CPU backend.  Safe to call more than
    once.  Call AFTER any jax_platforms override — reading
    ``jax.default_backend()`` initializes the backend.
    """
    import jax

    if jax.default_backend() == "cpu":
        return False
    cache = pathlib.Path(cache_dir) if cache_dir else _DEFAULT_DIR
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return True
