"""Microbench: chunked vs monolithic entry-grad reduction.

The permutation row-gather in scatter_entry_grads costs ~300 ms because its
SOURCE table has R ~ 6M rows (XLA TPU gather cost grows superlinearly with
table size: 16-wide x 6M reads is 47 ms from a 1M-row table but 149 ms from
a 6M-row one). Chunking R into 1M-row blocks, reducing each block to dense
per-face partials, and summing the partials replaces one 6M-table gather
with 6 small-table gathers.

Usage: python benchmarks/micro_scatter.py
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
KT = 16
W = 29


def timeit(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn_j(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:52s} {dt:9.2f} ms", flush=True)
    return out, dt


def _scan(rec, keys, max_run):
    acc = rec
    s = 1
    while s < max_run:
        pad = jnp.zeros((s,) + acc.shape[1:], acc.dtype)
        shifted = jnp.concatenate([pad, acc[:-s]], axis=0)
        kpad = jnp.full((s,), -1, keys.dtype)
        same = jnp.concatenate([kpad, keys[:-s]]) == keys
        acc = acc + jnp.where(same[:, None], shifted, 0.0)
        s *= 2
    return acc


def _tails(acc_list, keys, n_out):
    r = keys.shape[0]
    pos = jnp.arange(r, dtype=jnp.int32)
    last = jnp.full((n_out,), -1, jnp.int32).at[
        jnp.minimum(keys, n_out)
    ].max(pos, mode="drop")
    safe = jnp.maximum(last, 0)
    valid = last >= 0
    return jnp.concatenate(
        [jnp.where(valid[:, None], a[safe], 0.0) for a in acc_list], axis=1
    )


def reduce_mono(gr, ebf):
    sbf, perm = lax.sort((ebf, jnp.arange(R, dtype=jnp.int32)), num_keys=1,
                         is_stable=True)
    mask = (sbf < BF)[:, None]
    pieces = [jnp.where(mask, h[perm], 0.0) for h in (gr[:, :16], gr[:, 16:])]
    accs = [_scan(p, sbf, KT) for p in pieces]
    return _tails(accs, sbf, BF)[:, :W]


def reduce_chunked(gr, ebf, n_chunks):
    cr = R // n_chunks
    total = jnp.zeros((BF, 32), jnp.float32)
    for k in range(n_chunks):
        e = lax.dynamic_slice_in_dim(ebf, k * cr, cr)
        g = lax.dynamic_slice_in_dim(gr, k * cr, cr)
        sbf, perm = lax.sort((e, jnp.arange(cr, dtype=jnp.int32)), num_keys=1,
                             is_stable=True)
        mask = (sbf < BF)[:, None]
        pieces = [jnp.where(mask, h[perm], 0.0)
                  for h in (g[:, :16], g[:, 16:])]
        accs = [_scan(p, sbf, KT) for p in pieces]
        total = total + _tails(accs, sbf, BF)
    return total[:, :W]


def main():
    key = jax.random.PRNGKey(0)
    gr = jax.random.normal(key, (R, 32), jnp.float32)
    # entries: each face appears <= KT times, tile-sorted order approximated
    # by a random shuffle of a (BF x KT // something) grid
    ebf = jax.random.permutation(
        key, jnp.tile(jnp.arange(BF, dtype=jnp.int32), R // BF + 1)[:R])
    print(f"== micro_scatter, backend {jax.default_backend()} ==")
    ref, _ = timeit("monolithic sort+gather+scan+tails", reduce_mono, gr, ebf)
    for n in (4, 6, 8, 12):
        out, _ = timeit(f"chunked x{n}",
                        lambda g, e, n=n: reduce_chunked(g, e, n), gr, ebf)
    err = float(jnp.abs(ref - out).max())
    print(f"max |mono - chunked| = {err:.2e}")

    # --- pack-pattern gathers with a BINNING-REALISTIC index vector:
    # ~5M live entries (random face ids with ~5x repeats) followed by a
    # sentinel tail clamped to one row, as gather_stream sees it.
    live = int(5.02e6)
    idx_real = jnp.concatenate([
        ebf[:live], jnp.full((R - live,), BF - 1, jnp.int32)])
    t16 = jax.random.normal(key, (BF, 16), jnp.float32)
    t8 = jax.random.normal(key, (BF, 8), jnp.float32)
    t5 = jax.random.normal(key, (BF, 5), jnp.float32)

    def pack1685(a, b, c, i):
        rows = jnp.concatenate([a[i], b[i], c[i],
                                jnp.zeros((R, 3), jnp.float32)], axis=1)
        return rows.reshape(R // 128, 128, 32).transpose(0, 2, 1)
    timeit("pack (16,8,5) realistic idx", pack1685, t16, t8, t5, idx_real)

    def pack1685_chunked(a, b, c, i, n):
        cr = R // n
        outs = []
        for k in range(n):
            ik = lax.dynamic_slice_in_dim(i, k * cr, cr)
            rows = jnp.concatenate(
                [a[ik], b[ik], c[ik], jnp.zeros((cr, 3), jnp.float32)],
                axis=1)
            outs.append(rows.reshape(cr // 128, 128, 32).transpose(0, 2, 1))
        return jnp.concatenate(outs, axis=0)
    timeit("pack (16,8,5) realistic idx, 6 output chunks",
           lambda a, b, c, i: pack1685_chunked(a, b, c, i, 6),
           t16, t8, t5, idx_real)

    t32 = jax.random.normal(key, (BF, 32), jnp.float32)

    def pack2x16(t, i):
        rows = jnp.concatenate([t[:, :16][i], t[:, 16:][i]], axis=1)
        return rows.reshape(R // 128, 128, 32).transpose(0, 2, 1)
    timeit("pack 2x16 in-jit slices realistic idx", pack2x16, t32, idx_real)


if __name__ == "__main__":
    main()
