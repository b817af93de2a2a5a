"""Test configuration: force an 8-device virtual CPU mesh.

Tests validate numerics and sharding on CPU (the TPU analogue of a fake
backend); the real chip is exercised by bench.py and the on-chip parity
suite (run `DMESH2_TPU_TESTS=1 python -m pytest tests/test_tpu_parity.py`
to keep the real backend and verify hardware lowering).

Note: under the axon TPU tunnel, the JAX_PLATFORMS env var is overridden at
interpreter start, so the platform must be forced programmatically via
jax.config (backends initialize lazily, so this works as long as it happens
before the first jax.devices()).
"""

import os

TPU_TESTS = os.environ.get("DMESH2_TPU_TESTS", "0") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not TPU_TESTS and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

if not TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent XLA compile cache: the fast suite is compile-dominated (the
# interpret-mode kernel graphs and the reference-compositor AD graphs take
# tens of seconds each to compile and never change between runs). Measured
# on this box: the worst single test drops 24.4s -> 7.6s once warm. The
# cache key is the optimized HLO, so code changes re-compile exactly the
# affected tests. CPU AOT loads print spurious machine-feature warnings
# (string-set comparison includes XLA preference pseudo-features); harmless.
if not TPU_TESTS:
    cache_dir = os.environ.get(
        "DMESH2_TEST_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_test_cache"),
    )
    if cache_dir != "0":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# Python GC tuning: a trace-heavy suite creates millions of short-lived
# containers; with default thresholds the gen-2 collector rescans the
# ever-growing live jaxpr graph (measured here: late-suite tests trace up
# to ~2x slower than in a fresh process). Raising the gen-0 threshold and
# gen-2 multiplier cuts full collections without disabling GC.
import gc  # noqa: E402

gc.set_threshold(200_000, 50, 50)
# Move everything already imported (jax, numpy, the package) into the
# permanent generation so full collections stop rescanning it.
gc.freeze()


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _gc_freeze_surviving_objects():
    """Freeze each module's survivors into the permanent generation.

    The module-level freeze above only covers import-time objects; the
    suite then accumulates live jaxprs / compiled executables in jax's
    in-memory caches, and gen-2 collections rescan that ever-growing heap
    (measured: late-suite tests run up to ~2.4x their solo time). After
    each test module, collect once and freeze the survivors -- they are
    cache entries that live to process exit anyway, so excluding them from
    future GC scans trades bounded memory (cyclic garbage created later is
    still collected) for O(1) instead of O(live-heap) collections.
    """
    yield
    import gc

    gc.collect()
    gc.freeze()
