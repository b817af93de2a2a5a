"""Micro-benchmark: permutation gather vs carrying payload columns in lax.sort.

The gradient reduction (ops/pallas_bwd.scatter_entry_grads) groups R ~29-wide
grad records by face id. Round-1/2 implementation: sort (key, iota) then apply
the permutation with narrow row gathers (~250-300 ms at R ~ 5-6M, the single
largest stage after the pack gather). Hypothesis from the measured sort
scaling (+~3.5 ms/payload at 16M): carrying the 29 columns as sort payloads
directly -- possibly split across a few sorts sharing the same key to bound
compile time -- beats the gather.

Run on the real chip: python benchmarks/micro_sortcarry.py
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
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:48s} {ms:8.1f} ms   (compile {compile_s:.0f} s)")
    return ms


def main():
    r = 5_250_000
    bf = 1_000_000
    w = 29

    # Generate ON DEVICE: host->device of the (R, 29) array through the
    # remote tunnel takes minutes and dominates everything.
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    n_real = int(r * 0.95)
    # Realistic keys: each face id appears ~R/BF times, scattered, plus a
    # sentinel tail (~5% here).
    keys = jnp.where(
        jnp.arange(r) < n_real,
        jax.random.randint(k0, (r,), 0, bf, dtype=jnp.int32),
        jnp.int32(bf),
    )
    rec = jax.random.normal(k1, (r, w), jnp.float32)
    keys, rec = jax.block_until_ready((keys, rec))
    iota = jnp.arange(r, dtype=jnp.int32)

    def baseline(keys, rec):
        sbf, perm = jax.lax.sort((keys, iota), num_keys=1, is_stable=True)
        halves = jax.lax.optimization_barrier(
            (rec[:, :16], rec[:, 16:])
        )
        return sbf, jnp.concatenate([h[perm] for h in halves], axis=1)

    timeit("sort(key,iota) + 16/13 split gather [current]", baseline, keys, rec)

    def carry_all(keys, rec):
        cols = [rec[:, i] for i in range(w)]
        out = jax.lax.sort((keys, *cols), num_keys=1, is_stable=True)
        return out[0], jnp.stack(out[1:], axis=1)

    def make_carry_split(n_sorts):
        per = -(-w // n_sorts)

        def f(keys, rec):
            outs = []
            sk = None
            for s in range(n_sorts):
                cols = [rec[:, i] for i in range(s * per, min((s + 1) * per, w))]
                o = jax.lax.sort((keys, *cols), num_keys=1, is_stable=True)
                sk = o[0]
                outs.extend(o[1:])
            return sk, jnp.stack(outs, axis=1)
        return f

    timeit("sort carrying 29 payloads, 2 sorts x ~15", make_carry_split(2),
           keys, rec)
    timeit("sort carrying 29 payloads, 4 sorts x ~8", make_carry_split(4),
           keys, rec)
    t0 = time.time()
    try:
        timeit("sort carrying 29 payloads, 1 sort", carry_all, keys, rec,
               iters=3)
    except Exception as e:  # compile blow-up guard
        print(f"1-sort variant failed after {time.time()-t0:.0f}s: {e}")


if __name__ == "__main__":
    main()
