"""Microbenchmarks for the R-sized data movements that dominate config 4.

Measures, on the current backend:
  * row gathers from a (BF, W) table by 6M random indices, for several
    widths and split strategies (XLA TPU gather throughput is wildly
    non-monotonic in row width -- see docs/DESIGN.md "XLA gather anomalies");
  * lax.sort at the binning emission-grid size (16M) vs compacted sizes;
  * the cost of carrying extra payload operands through a sort.

Usage: python benchmarks/micro_gather.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

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
    print(f"{name:56s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (R,), 0, BF, dtype=jnp.int32)
    idx_sorted = jnp.sort(idx)
    table32 = jax.random.normal(jax.random.PRNGKey(1), (BF, 32), jnp.float32)

    print(f"== micro: table ({BF}, W), {R} reads, backend "
          f"{jax.default_backend()} ==")

    if "--extra" in os.sys.argv:
        return extra(idx, table32)

    # --- gather widths ---
    for w in (1, 2, 4, 8, 16, 32):
        t = table32[:, :w]
        timeit(f"gather width {w:2d} (random idx)", lambda t, i: t[i], t, idx)
    timeit("gather width 32 (sorted idx)",
           lambda t, i: t[i], table32, idx_sorted)

    # --- split strategies for a 32-wide row ---
    def split(k):
        w = 32 // k
        def f(t, i):
            return jnp.concatenate([t[:, j * w:(j + 1) * w][i] for j in range(k)],
                                   axis=1)
        return f
    for k in (2, 4, 8):
        timeit(f"gather 32 as {k} x {32 // k}", split(k), table32, idx)

    # 1D gathers, one per column (width-1 x 32)
    def cols(t, i):
        return jnp.stack([t[:, j][i] for j in range(32)], axis=1)
    timeit("gather 32 as 32 x 1-D", cols, table32, idx)

    # take along flattened (computed flat indices)
    def flat20(t, i):
        tf = t[:, :20].reshape(-1)
        base = i[:, None] * 20 + jnp.arange(20, dtype=jnp.int32)[None, :]
        return jnp.take(tf, base, axis=0)
    timeit("gather 20 via flat take", flat20, table32, idx)

    # --- sorts at binning scale ---
    k16 = jax.random.randint(key, (16 * BF,), 0, 1 << 30, dtype=jnp.int32)
    p16 = jnp.arange(16 * BF, dtype=jnp.int32)
    timeit("sort 16M (key + 1 payload)",
           lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=True),
           k16, p16)
    k8, p8 = k16[: 8 * BF], p16[: 8 * BF]
    timeit("sort 8M (key + 1 payload)",
           lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=True),
           k8, p8)
    k6, p6 = k16[:R], p16[:R]
    timeit("sort 6M (key + 1 payload)",
           lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=True),
           k6, p6)
    timeit("sort 6M (key + 4 payloads)",
           lambda k, p: jax.lax.sort((k, p, p, p, p), num_keys=1,
                                     is_stable=True), k6, p6)
    timeit("sort 1M (key + 1 payload)",
           lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=True),
           k16[:BF], p16[:BF])

    # searchsorted at tile-range scale (R queries into 1M boundaries)
    off = jnp.sort(jax.random.randint(key, (BF,), 0, R, dtype=jnp.int32))
    timeit("searchsorted 6M queries into 1M",
           lambda o, q: jnp.searchsorted(o, q), off, jnp.arange(R, dtype=jnp.int32))

    # cumsum at BF scale
    timeit("cumsum 16M int32", lambda x: jnp.cumsum(x), p16)

    # tile_pack-ish transpose at 1080p scale: (1, 1088, 1920) -> tiles
    img = jax.random.normal(key, (1, 1088, 1920, 8), jnp.float32)
    def pack(x):
        t = x.reshape(1, 68, 16, 120, 16, 8)
        return t.transpose(0, 1, 3, 5, 2, 4).reshape(68 * 120, 8, 256)
    timeit("tile_pack 1080p x 8 planes", pack, img)
    tp = pack(img)
    def unpack(t):
        x = t.reshape(1, 68, 120, 8, 16, 16)
        return x.transpose(0, 1, 4, 2, 5, 3)
    timeit("untile 1080p x 8 planes", unpack, tp)


def extra(idx, table32):
    """Round-2 follow-ups: key layouts found by the first sweep.

    Gathers from SEPARATE CONTIGUOUS narrow tables are ~5x faster per byte
    than wide or strided-view gathers; this pass finds the best split.
    """
    key = jax.random.PRNGKey(2)
    for w in (10, 12, 20, 24):
        t = jnp.asarray(jax.random.normal(key, (BF, w), jnp.float32))
        timeit(f"gather contiguous width {w:2d}", lambda t, i: t[i], t, idx)

    t16a = jnp.asarray(table32[:, :16])
    t16b = jnp.asarray(table32[:, 16:])
    timeit("gather 32 as 2 separate contiguous 16s",
           lambda a, b, i: (a[i], b[i]), t16a, t16b, idx)
    t8s = [jnp.asarray(table32[:, 8 * j:8 * (j + 1)]) for j in range(4)]
    timeit("gather 32 as 4 separate contiguous 8s",
           lambda a, b, c, d, i: (a[i], b[i], c[i], d[i]), *t8s, idx)
    t4 = jnp.asarray(table32[:, :4])
    timeit("gather 20 as contiguous 16 + 4",
           lambda a, b, i: (a[i], b[i]), t16a, t4, idx)

    # R-row source (the permutation gather in scatter_entry_grads): same
    # widths, table size R instead of BF.
    big16 = jax.random.normal(key, (R, 16), jnp.float32)
    perm = jax.random.permutation(key, R).astype(jnp.int32)
    timeit("perm-gather (R,16) contiguous", lambda t, i: t[i], big16, perm)

    # segmented-scan pass cost at (R, 16) scale
    keys6 = jnp.sort(jax.random.randint(key, (R,), 0, BF, dtype=jnp.int32))
    def scan4(rec, k):
        acc = rec
        for s in (1, 2, 4, 8):
            pad = jnp.full((s,) + acc.shape[1:], 0.0, acc.dtype)
            shifted = jnp.concatenate([pad, acc[:-s]], axis=0)
            kpad = jnp.full((s,), -1, k.dtype)
            same = jnp.concatenate([kpad, k[:-s]]) == k
            acc = acc + jnp.where(same[:, None], shifted, 0.0)
        return acc
    timeit("segmented scan 4 passes (R,16)", scan4, big16, keys6)

    # searchsorted alternatives at segment-tail scale (BF queries into R)
    ids = jnp.arange(BF, dtype=jnp.int32)
    timeit("searchsorted BF into R (sort method)",
           lambda k, q: jnp.searchsorted(k, q, side="right", method="sort"),
           keys6, ids)
    # tail extraction via scatter-max (the old way) for comparison
    def tails_scatter(k):
        pos = jnp.arange(R, dtype=jnp.int32)
        return jnp.full((BF,), -1, jnp.int32).at[jnp.minimum(k, BF)].max(
            pos, mode="drop")
    timeit("segment tails via scatter-max (R->BF)", tails_scatter, keys6)

    # one-hot batch-matrix gather for (R,16) mvp rows, B=8
    mvp = jax.random.normal(key, (8, 16), jnp.float32)
    bidx = idx % 8
    timeit("mvp rows via tiny-table gather (R,16 from 8)",
           lambda m, b: m[b], mvp, bidx)

    # projection append cost: (R,3,3) verts -> z + aa via two matvecs
    v9 = jax.random.normal(key, (R, 9), jnp.float32)
    m1 = jax.random.normal(key, (4, 4), jnp.float32)
    def project(v9, mv, pr):
        r = v9.shape[0]
        pts = v9.reshape(r * 3, 3)
        view = pts @ mv[:, :3].T + mv[:, 3]
        clip = view @ pr.T
        w = clip[:, 3:4]
        w = jnp.where((w >= 0) & (w < 1e-4), 1e-4, w)
        w = jnp.where((w < 0) & (w > -1e-4), -1e-4, w)
        ndc = clip[:, :3] / w
        img = (ndc[:, :2] + 1.0) * 0.5 * 960.0
        z = ndc[:, 2].reshape(r, 3)
        xy = img.reshape(r, 3, 2)
        a2 = ((xy[:, 1, 0] - xy[:, 0, 0]) * (xy[:, 2, 1] - xy[:, 0, 1])
              - (xy[:, 2, 0] - xy[:, 0, 0]) * (xy[:, 1, 1] - xy[:, 0, 1]))
        neg = (a2 < 0)[:, None]
        q1 = jnp.where(neg, xy[:, 2], xy[:, 1])
        q2 = jnp.where(neg, xy[:, 1], xy[:, 2])
        aa = jnp.concatenate([xy[:, 0], q1, q2], axis=1)
        return z, aa
    timeit("projection append (R entries, z+aa)", project, v9, m1, m1)


if __name__ == "__main__":
    main()
