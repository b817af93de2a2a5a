"""Shared bench-harness plumbing: outage probe + persistent compile cache.

Two failure modes have cost driver artifacts in past rounds:
  * axon tunnel outages hang `import jax; jax.devices()` indefinitely
    (observed 5h+, 2026-08-17) -- probe in a bounded subprocess first;
  * the 1M-scale pipeline recompiles from scratch every process (16-operand
    sorts alone are ~12 min AOT), which ate BENCH_r04's stage table and 4 of
    5 configs.  tests/conftest.py proved the fix (persistent XLA compile
    cache: 24.4 s -> 7.6 s warm on the worst test); this module applies the
    same technique to every bench entrypoint.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe_backend(timeout_s: float = 300.0, artifact: dict | None = None) -> None:
    """Fail fast (with a parseable artifact) when the TPU tunnel is down.

    Runs `import jax; jax.devices()` in a subprocess with a hard timeout.
    On timeout, prints `artifact` (plus an explanatory "error" field) as one
    JSON line and exits 0 so the line survives a driver timeout.
    """
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return  # init completed (any backend; CPU hosts return instantly)
    except subprocess.TimeoutExpired:
        line = dict(artifact or {})
        line["error"] = (
            f"jax backend init hung > {timeout_s:.0f}s "
            "(axon TPU tunnel outage); no measurement possible"
        )
        print(json.dumps(line), flush=True)
        raise SystemExit(0)


def enable_compile_cache(subdir: str = ".jax_bench_cache") -> str:
    """Point JAX at a persistent on-disk compilation cache under the repo.

    Call after `import jax` and before the first compile.  The cache key is
    the optimized HLO + platform, so kernel edits re-compile exactly the
    affected programs; warm driver runs skip the multi-minute AOT sorts.
    """
    import jax

    cache_dir = os.environ.get(
        "DMESH2_BENCH_CACHE", os.path.join(_REPO, subdir))
    if cache_dir != "0":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
