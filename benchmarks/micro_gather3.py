"""Third micro pass: the exact candidate patterns for pack + scatter.

Decides between design alternatives with end-shape measurements:
  * pack: split-table gathers at (16,4,9) / (16,13) / (16,8,5) + blocking
  * perm reduction: sort+2x16 gather vs sort carrying all 29 payloads
  * gather lowering hints (unique_indices / promise_in_bounds)
  * segment tails: scatter-max vs searchsorted(sort) vs unique row scatter
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
from jax import lax

ITERS = int(os.environ.get("MICRO_ITERS", "5"))
BF = 1_000_000
R = 6 * (1 << 20)


def timeit(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn_j(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:58s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (R,), 0, BF, dtype=jnp.int32)
    print(f"== micro3, backend {jax.default_backend()} ==")

    # --- pack variants: gather split tables, concat, block-transpose ---
    def mk(w, seed):
        return jax.random.normal(jax.random.PRNGKey(seed), (BF, w), jnp.float32)

    def pack(tables, i):
        rows = jnp.concatenate([t[i] for t in tables], axis=1)
        pad = jnp.zeros((R, 32 - rows.shape[1]), rows.dtype)
        rows = jnp.concatenate([rows, pad], axis=1)
        return rows.reshape(R // 128, 128, 32).transpose(0, 2, 1)

    for ws in ([] if "--skip-pack" in os.sys.argv
               else [(16, 4, 9), (16, 13), (16, 8, 5), (8, 8, 8, 5), (29,)]):
        tables = tuple(mk(w, 10 + j) for j, w in enumerate(ws))
        timeit(f"pack gather {ws} + block", lambda *a: pack(a[:-1], a[-1]),
               *tables, idx)

    # --- permutation reduction variants (R-sized source) ---
    grads = jax.random.normal(key, (R, 32), jnp.float32)
    ebf = jax.random.randint(key, (R,), 0, BF, dtype=jnp.int32)

    def perm_gather(g, e):
        sbf, perm = lax.sort((e, jnp.arange(R, dtype=jnp.int32)), num_keys=1,
                             is_stable=True)
        halves = lax.optimization_barrier((g[:, :16], g[:, 16:]))
        return sbf, jnp.concatenate([h[perm] for h in halves], axis=1)[:, :29]
    timeit("perm: sort + 2x16 barrier gather", perm_gather, grads, ebf)

    def perm_gather_hint(g, e):
        sbf, perm = lax.sort((e, jnp.arange(R, dtype=jnp.int32)), num_keys=1,
                             is_stable=True)
        halves = lax.optimization_barrier((g[:, :16], g[:, 16:]))
        out = [h.at[perm].get(unique_indices=True, indices_are_sorted=False,
                              mode="promise_in_bounds")
               for h in halves]
        return sbf, jnp.concatenate(out, axis=1)[:, :29]
    timeit("perm: sort + 2x16 gather (unique/in-bounds)", perm_gather_hint,
           grads, ebf)

    def perm_sort_payload(g, e):
        cols = tuple(g[:, j] for j in range(29))
        out = lax.sort((e,) + cols, num_keys=1, is_stable=True)
        return out[0], jnp.stack(out[1:], axis=1)
    timeit("perm: sort carrying 29 payload columns", perm_sort_payload,
           grads, ebf)

    # --- segment tails variants (acc (R, 16) x2, sorted keys) ---
    keys6 = jnp.sort(ebf)
    acc = jax.random.normal(key, (R, 16), jnp.float32)

    def tails_scatter_max(a, k):
        pos = jnp.arange(R, dtype=jnp.int32)
        last = jnp.full((BF,), -1, jnp.int32).at[jnp.minimum(k, BF)].max(
            pos, mode="drop")
        safe = jnp.maximum(last, 0)
        return jnp.where((last >= 0)[:, None], a[safe], 0.0)
    timeit("tails: scatter-max + row gather", tails_scatter_max, acc, keys6)

    def tails_search_sort(a, k):
        ids = jnp.arange(BF, dtype=jnp.int32)
        last = jnp.searchsorted(k, ids, side="right",
                                method="sort").astype(jnp.int32) - 1
        safe = jnp.maximum(last, 0)
        valid = (last >= 0) & (k[safe] == ids)
        return jnp.where(valid[:, None], a[safe], 0.0)
    timeit("tails: searchsorted(sort) + row gather", tails_search_sort,
           acc, keys6)

    def tails_row_scatter(a, k):
        nxt = jnp.concatenate([k[1:], jnp.full((1,), -1, k.dtype)])
        dest = jnp.where((k != nxt) & (k < BF), k, BF)
        return jnp.zeros((BF + 1, a.shape[1]), a.dtype).at[dest].set(
            a, mode="drop", unique_indices=True)[:BF]
    timeit("tails: unique row scatter at boundaries", tails_row_scatter,
           acc, keys6)

    # --- binning-sized sorts for the tiered emission decision ---
    k8 = jax.random.randint(key, (8 * BF,), 0, 1 << 30, dtype=jnp.int32)
    p8 = jnp.arange(8 * BF, dtype=jnp.int32)
    timeit("sort 9.5M (key + 1 payload)",
           lambda k, p: lax.sort((k[: int(9.5e6)], p[: int(9.5e6)]),
                                 num_keys=1, is_stable=True), k8, p8)


if __name__ == "__main__":
    main()
