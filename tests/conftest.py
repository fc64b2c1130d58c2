"""Test configuration: CPU-only JAX with 8 virtual devices.

Must set env vars before jax initializes (SURVEY.md §4.3): the fake-device
trick lets every shard_map/ppermute/mesh code path run in CI with no TPU.
"""

import os

# XLA:CPU compiles the big one-jit setup programs on the MAIN thread with
# deeply recursive passes; under the default 8 MiB stack rlimit this can
# overflow and segfault mid-suite (observed deterministically ~60 tests in).
# Linux checks the rlimit at fault time, so raising the soft limit here
# protects every subsequent compile.
import resource

try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 512 << 20
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        _new = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
        resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))
except (ValueError, OSError):
    pass

# force CPU even when the ambient environment preselects a TPU platform.
# Set RAPTOR_TEST_PLATFORM=tpu to run the hardware-gated tests (e.g. the
# compiled-mode Pallas checks) on a real chip instead.
_PLATFORM = os.environ.get("RAPTOR_TEST_PLATFORM", "cpu")
if _PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    if "xla_backend_optimization_level" not in flags:
        # tests assert correctness, not CPU throughput: skipping XLA:CPU's
        # optimization passes cuts the compile-bound suite ~30% (measured
        # round 4: the worst single test 133 -> 93 s, result unchanged)
        flags = (flags + " --xla_backend_optimization_level=0").strip()
    os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

if _PLATFORM == "cpu":
    # The image's site hook forces jax_platforms="axon,cpu" regardless of the
    # env var — override via config so tests always run on the 8 CPU devices.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# NO persistent compilation cache for the CPU suite.  Round-trip
# serialization of large XLA:CPU executables is broken in this image:
# deserialization (compilation_cache.get_executable_and_time) SIGSEGVs on
# the AOT load path (cpu_aot_loader logs a compile/host machine-feature
# mismatch — the compile side records pseudo-features like
# +prefer-no-scatter that the host check rejects).  Every mid-suite
# segfault traced to exactly this frame; with the cache off the suite is
# stable.  (The TPU path is unaffected — only tests force CPU.)


# The kernel's vm.max_map_count (65530 default) is the suite's hard wall:
# every compiled executable + device buffer adds mappings, XLA:CPU never
# coalesces them, and when mmap starts failing the compiler SIGSEGVs
# (observed: the process dies at exactly 65530 maps, deterministically
# ~60 tests in).  Two defenses:
#   1. best-effort raise of the sysctl (root images),
#   2. drop compiled executables between test modules — per-module
#      clear_caches bounds accumulation with negligible recompile cost
#      (cross-module program sharing is small).
_MAP_COUNT_OK = False
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read()) < 1 << 20:
            _f.seek(0)
            _f.write(str(1 << 20))
            # machine-global, persistent kernel setting (ADVICE r2): say so
            # loudly so operators of shared machines know pytest did it
            import sys as _sys

            print(
                "[raptor_tpu conftest] raised system-wide vm.max_map_count "
                "to 1048576 (was below; XLA:CPU needs it — see comment "
                "above). This persists until reboot.",
                file=_sys.stderr,
            )
    _MAP_COUNT_OK = True
except OSError:
    pass

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_map_count():
    yield
    # only needed as a mapping-count defense where the sysctl raise failed
    # (non-root images): with 2^20 maps available, keeping the compiled
    # programs lets cross-module jits share (compile time dominates the
    # 1-core suite)
    if not _MAP_COUNT_OK:
        jax.clear_caches()
