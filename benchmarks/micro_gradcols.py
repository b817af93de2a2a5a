"""Sort-operand prep: strided columns of (R, 32) vs rows of the blocked form.

scatter_entry_grads feeds 29 column slices of grad_records (R, 32) --
itself unblock_stream's transpose of the kernel's (NB, 32, 128) output --
into the payload-carry sorts. Hypothesis: slicing the BLOCKED output
directly ((NB, 32, 128)[:, i, :].reshape(R)) avoids materializing the
(R, 32) transpose and any strided column extraction.
"""

import time

import jax
import jax.numpy as jnp

from dmesh2_renderer_tpu.utils.segments import sort_rows_by_key


def _force(out):
    return float(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def timeit(name, fn, *args, iters=5):
    fn_j = jax.jit(fn)
    _force(fn_j(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn_j(*args)
    _force(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {ms:8.1f} ms", flush=True)
    return ms


def main():
    r = 40 * (1 << 17)
    bf = 1_000_000
    nb = r // 128
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    blocked = jax.random.normal(k0, (nb, 32, 128), jnp.float32)
    keys = jnp.where(
        jnp.arange(r) < int(r * 0.96),
        jax.random.randint(k1, (r,), 0, bf, dtype=jnp.int32),
        jnp.int32(bf),
    )
    blocked, keys = jax.block_until_ready((blocked, keys))

    def via_unblock(blocked, keys):
        rec = blocked.transpose(0, 2, 1).reshape(r, 32)
        sk, pieces = sort_rows_by_key(keys, [rec[:, i] for i in range(29)])
        return sk, pieces

    def via_blocked_rows(blocked, keys):
        sk, pieces = sort_rows_by_key(
            keys, [blocked[:, i, :].reshape(r) for i in range(29)]
        )
        return sk, pieces

    timeit("sorts from unblocked (R,32) column slices", via_unblock,
           blocked, keys)
    timeit("sorts from blocked (NB,32,128) row slices", via_blocked_rows,
           blocked, keys)


if __name__ == "__main__":
    main()
