"""Micro-benchmark: strategies for the backward residual compaction map.

compact_tile_entries (ops/binning.py) keeps each tile's contributing prefix.
First implementation mapped output position -> source with a searchsorted
over the compacted edges (R2 queries into T+1 edges) plus three small-table
gathers; measured 350 ms at R2 = 2.1M inside profile_render -- far above the
movement cost of the data. Candidates timed here on the real chip:

  a) searchsorted map (current)
  b) scatter-flag + cumsum keep mask, then stable 2-operand sort by
     (1 - keep) carrying entry_bf as payload (sort does the compaction)
  c) parts of (a) isolated (searchsorted alone, gathers alone)

Run: python benchmarks/micro_compact.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=5):
    fn_j = jax.jit(fn)
    t0 = time.perf_counter()
    out = fn_j(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    # scalar readback forces completion through the tunnel
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {ms:8.1f} ms   (compile {compile_s:.0f} s)", flush=True)
    return ms


def main():
    r = 5_250_000 // 128 * 128
    t_total = 8160
    cap2 = 1 << 21
    bf = 1_000_000
    key = jax.random.PRNGKey(0)
    # Synthetic tile structure approximating the 1080p headline scene.
    counts = jax.random.randint(key, (t_total,), 400, 900, jnp.int32)
    counts = (counts * (r / float(jnp.sum(counts)))).astype(jnp.int32)
    edges = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             jnp.cumsum(counts, dtype=jnp.int32)])
    starts = edges[:-1]
    counts = jnp.minimum(counts, r - starts)
    nc = (counts.astype(jnp.float32) * 0.27).astype(jnp.int32)
    entry_bf = jax.random.randint(jax.random.PRNGKey(1), (r,), 0, bf, jnp.int32)

    def searchsorted_map(entry_bf, starts, counts, nc):
        counts2 = jnp.minimum(counts, jnp.maximum(nc, 0))
        edges2 = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  jnp.cumsum(counts2, dtype=jnp.int32)])
        total2 = edges2[-1]
        starts2 = jnp.minimum(edges2[:-1], cap2)
        counts2 = jnp.minimum(counts2, cap2 - starts2)
        j = jnp.arange(cap2, dtype=jnp.int32)
        tile_of = jnp.searchsorted(edges2, j, side="right").astype(jnp.int32) - 1
        tile_of = jnp.clip(tile_of, 0, t_total - 1)
        src = starts[tile_of] + (j - edges2[:-1][tile_of])
        valid = j < jnp.minimum(total2, cap2)
        e2 = jnp.where(valid, entry_bf[jnp.where(valid, src, 0)], bf)
        return e2, starts2, counts2

    def flag_sort(entry_bf, starts, counts, nc):
        counts2 = jnp.minimum(counts, jnp.maximum(nc, 0))
        edges2 = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  jnp.cumsum(counts2, dtype=jnp.int32)])
        starts2 = jnp.minimum(edges2[:-1], cap2)
        counts2c = jnp.minimum(counts2, cap2 - starts2)
        # keep-region marking: +1 at each tile start, -1 at its cut point.
        delta = jnp.zeros((r + 1,), jnp.int32)
        delta = delta.at[starts].add(1)
        delta = delta.at[starts + counts2].add(-1)
        keep = jnp.cumsum(delta[:r], dtype=jnp.int32)  # 1 inside prefixes
        drop_key = 1 - keep
        _, e2 = jax.lax.sort((drop_key, entry_bf), num_keys=1, is_stable=True)
        return e2[:cap2], starts2, counts2c

    def searchsorted_only(starts):
        j = jnp.arange(cap2, dtype=jnp.int32)
        edges2 = jnp.concatenate([starts, jnp.full((1,), r, jnp.int32)])
        return jnp.searchsorted(edges2, j, side="right").astype(jnp.int32)

    def gathers_only(entry_bf, starts):
        j = jnp.arange(cap2, dtype=jnp.int32)
        tile_of = jnp.clip(j // 260, 0, t_total - 1)
        src = starts[tile_of] + (j - starts[tile_of])
        return entry_bf[src]

    timeit("a) searchsorted map + entry gather", searchsorted_map,
           entry_bf, starts, counts, nc)
    timeit("b) flag-scatter + cumsum + 2-op payload sort", flag_sort,
           entry_bf, starts, counts, nc)
    timeit("c1) searchsorted alone (cap2 queries)", searchsorted_only, starts)
    timeit("c2) small-table gathers + entry gather", gathers_only,
           entry_bf, starts)


if __name__ == "__main__":
    main()
