"""Sweep the gradient-sort split granularity and the tail-gather lowering.

Round-5 left two named glue targets unexecuted (docs/DESIGN.md, scatter
decomposition): s1 (118.8 ms, two 16-operand payload sorts at R=4.19M) and
s3 (58.8 ms, two narrow segment-tail row gathers at r2=2.1M -> 1M). Both
implementations were adopted from SINGLE measured points; neither knob was
ever swept:

  s1: `sort_rows_by_key(max_payloads=15)` splits 29 columns into 2 sorts.
      Every split re-sorts the key, so the optimum balances per-sort fixed
      cost (key movement) against per-operand cost. Sweep P in {5,8,10,15}.
  s3: `segment_tails` gathers each <=15-wide piece separately on the
      round-2 "narrow beats wide" rule -- but v3 in micro_scatter_stages
      measured ONE (3M,7) ROW gather at 20.9 ms vs 172.5 for column
      gathers, suggesting row-major wide gathers are the fast lowering.
      Compare: per-piece (current), one (r2,29) concat row gather, and one
      lane-aligned (r2,32) padded row gather.

Timing discipline per DESIGN.md "VPU calibration" traps: scalar-readback
fence (block_until_ready returns early through the axon tunnel), steady
state from a multi-iteration window.

Run (chip must be free): python benchmarks/micro_sort_split.py
CPU shape check:         python benchmarks/micro_sort_split.py --cpu-smoke
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.common import enable_compile_cache, probe_backend

if "--cpu-smoke" not in sys.argv:
    probe_backend()

import jax

if "--cpu-smoke" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
# Multi-operand sorts at R=4.19M are multi-minute AOT compiles; reuse the
# persistent bench cache so repeat sweeps are warm (benchmarks/common.py).
enable_compile_cache()
import jax.numpy as jnp

from dmesh2_renderer_tpu.utils.segments import (
    segment_tails,
    segmented_prefix_sum,
    sort_rows_by_key,
)

_LEDGER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "micro_sort_split.jsonl")


def _force(out):
    return float(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def timeit(name, fn, *args, iters=5):
    fn_j = jax.jit(fn)
    t0 = time.perf_counter()
    _force(fn_j(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn_j(*args)
    _force(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:56s} {ms:8.1f} ms   (compile {compile_s:.1f} s)", flush=True)
    try:
        with open(_LEDGER, "a") as f:
            f.write(json.dumps({
                "micro": "sort_split", "name": name, "ms": round(ms, 1),
                "compile_s": round(compile_s, 1),
                "backend": jax.default_backend(),
                "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }) + "\n")
    except OSError:
        pass
    return ms


def main():
    smoke = "--cpu-smoke" in sys.argv
    r = (32 * (1 << 17)) if not smoke else (1 << 13)   # headline capacity
    r2 = (1 << 21) if not smoke else (1 << 12)         # grad_compact_capacity
    f = 1_000_000 if not smoke else 4096
    bf = f
    kt = 16

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    entry_bf = jax.random.randint(ks[0], (r,), 0, bf, jnp.int32)
    keep = jax.random.uniform(ks[1], (r,)) < (float(r2) * 0.5 / r)
    blocked = jax.random.normal(ks[2], (r // 128, 32, 128), jnp.float32)
    entry_bf, keep, blocked = jax.block_until_ready((entry_bf, keep, blocked))

    def s1_split(p):
        def fn(blocked, entry_bf, keep):
            k = jnp.where(keep, entry_bf, bf)
            cols = [blocked[:, i, :].reshape(r) for i in range(29)]
            return sort_rows_by_key(k, cols, max_payloads=p)
        return fn

    results = {}
    for p in (15, 10, 8, 5):
        nsorts = -(-29 // p)
        results[f"s1 P={p}"] = timeit(
            f"s1 sort split P={p} ({nsorts} sorts x <= {p + 1} operands)",
            s1_split(p), blocked, entry_bf, keep)

    # --- s3 variants need the sorted/compacted/scanned state as inputs ---
    sbf, pieces = jax.jit(s1_split(15))(blocked, entry_bf, keep)
    sbf2 = sbf[:r2]
    pieces2 = [p[:r2] for p in pieces]

    def scan(sbf2, pieces2):
        mask = (sbf2 < bf)[:, None]
        return [segmented_prefix_sum(jnp.where(mask, p, 0.0), sbf2, kt)
                for p in pieces2]

    accs = jax.block_until_ready(jax.jit(scan)(sbf2, pieces2))
    sbf2 = jax.block_until_ready(sbf2)

    def s3_pieces(accs, sbf2):
        return segment_tails(accs, sbf2, bf)[:, :29]

    def s3_wide(accs, sbf2):
        return segment_tails(jnp.concatenate(accs, axis=1), sbf2, bf)[:, :29]

    def s3_pad32(accs, sbf2):
        wide = jnp.concatenate(accs, axis=1)
        wide = jnp.pad(wide, ((0, 0), (0, 32 - wide.shape[1])))
        return segment_tails(wide, sbf2, bf)[:, :29]

    results["s3 pieces"] = timeit(
        "s3 tails, per-piece gathers (current)", s3_pieces, accs, sbf2)
    results["s3 wide"] = timeit(
        "s3 tails, one (r2,30) row gather", s3_wide, accs, sbf2)
    results["s3 pad32"] = timeit(
        "s3 tails, one lane-aligned (r2,32) row gather", s3_pad32, accs, sbf2)

    # Numerical identity of the s3 variants (permutation-invariant sums).
    a = jax.jit(s3_pieces)(accs, sbf2)
    b = jax.jit(s3_wide)(accs, sbf2)
    c = jax.jit(s3_pad32)(accs, sbf2)
    print("s3 variants identical:",
          bool(jnp.all(a == b)) and bool(jnp.all(a == c)), flush=True)
    print(json.dumps({k: round(v, 1) for k, v in results.items()}),
          flush=True)


if __name__ == "__main__":
    main()
