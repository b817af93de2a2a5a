"""Try the single 30-operand sort (key + 29 payloads) at bench scale.

Two 16-operand sorts sharing the key cost ~176 ms; a single sort would do
one key pass (~125 ms est.) but round 1 found a 30-operand sort "did not
finish compiling in 8 min". The AOT cache is permanent, so ONE successful
compile (however slow) makes this usable. Run with a generous timeout.
"""

import time

import jax
import jax.numpy as jnp


def _force(out):
    return float(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def main():
    r = 40 * (1 << 17)
    bf = 1_000_000
    w = 29
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    keys = jnp.where(
        jnp.arange(r) < int(r * 0.96),
        jax.random.randint(k0, (r,), 0, bf, dtype=jnp.int32),
        jnp.int32(bf),
    )
    rec = jax.random.normal(k1, (r, w), jnp.float32)
    keys, rec = jax.block_until_ready((keys, rec))

    def carry_all(keys, rec):
        out = jax.lax.sort(
            (keys, *[rec[:, i] for i in range(w)]), num_keys=1,
            is_stable=True,
        )
        return out[0], list(out[1:])

    fn = jax.jit(carry_all)
    t0 = time.perf_counter()
    _force(fn(keys, rec))
    print(f"compiled+ran in {time.perf_counter() - t0:.0f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(keys, rec)
    _force(out)
    print(f"single 30-operand sort: {(time.perf_counter() - t0) / 5 * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
