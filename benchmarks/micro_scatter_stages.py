"""Decompose scatter_entry_grads' ~330 ms into its internal stages.

The scatter is the headline's largest stage (docs/DESIGN.md ledger). It is
sort (R x 30 payload-carry) -> face segmented scan + tails (at the compacted
r2) -> giant ladder -> vertex contrib build -> vertex sort (3F x 8) -> vertex
scan + tails. This micro times each piece at the headline's shapes so the
optimization effort lands on the real cost, not the assumed one
(tpu-xla-gather-sort-pathologies: every site must be measured).

Also times two candidate replacements for the VERTEX stage, whose sort key
(the face->corner vertex ids) is STATIC at trace time:
  v2) precomputed argsort permutation as a compile-time constant + 7 narrow
      column gathers (no runtime sort)
  v3) same, but gathering one (3F, 8)-wide matrix instead of 7 columns

Run: python benchmarks/micro_scatter_stages.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu-smoke" in sys.argv:  # correctness/shape check without the chip
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from dmesh2_renderer_tpu.utils.segments import (
    segment_tails,
    segmented_prefix_sum,
    sort_rows_by_key,
)


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
    print(f"{name:56s} {ms:8.1f} ms   (compile {compile_s:.0f} s)", flush=True)
    return ms


def main():
    smoke = "--cpu-smoke" in sys.argv
    r = (32 * (1 << 17)) if not smoke else (1 << 13)  # headline capacity
    r2 = (1 << 21) if not smoke else (1 << 12)        # grad_compact_capacity
    f = 1_000_000 if not smoke else 4096
    bf = f                      # B = 1
    kt = 16
    n_verts = 3 * f             # triangle soup: 3 verts per face
    n_batch = 1

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    # Sorted-by-tile entry stream approximated by random face ids with a
    # ~25% contributing prefix per tile (compaction keep mask).
    entry_bf = jax.random.randint(ks[0], (r,), 0, bf, jnp.int32)
    keep = jax.random.uniform(ks[1], (r,)) < (float(r2) * 0.5 / r)
    blocked = jax.random.normal(ks[2], (r // 128, 32, 128), jnp.float32)
    faces_np = np.random.default_rng(0).integers(
        0, n_verts, (f, 3)).astype(np.int32)
    faces = jnp.asarray(faces_np)
    giant_ids = jnp.concatenate([
        jax.random.randint(ks[3], (4096,), 0, bf, jnp.int32),
        jnp.full((4096,), bf, jnp.int32),
    ])
    entry_bf, keep, blocked, faces, giant_ids = jax.block_until_ready(
        (entry_bf, keep, blocked, faces, giant_ids))

    def s1_mask_sort(blocked, entry_bf, keep):
        key = jnp.where(keep, entry_bf, bf)
        cols = [blocked[:, i, :].reshape(r) for i in range(29)]
        sbf, pieces = sort_rows_by_key(key, cols)
        return sbf, pieces

    sbf, pieces = jax.jit(s1_mask_sort)(blocked, entry_bf, keep)
    sbf2 = sbf[:r2]
    pieces2 = [p[:r2] for p in pieces]
    sbf2, pieces2 = jax.block_until_ready((sbf2, pieces2))

    def s2_face_scan(sbf2, pieces2):
        mask = (sbf2 < bf)[:, None]
        ps = [jnp.where(mask, p, 0.0) for p in pieces2]
        return [segmented_prefix_sum(p, sbf2, kt) for p in ps]

    accs = jax.block_until_ready(jax.jit(s2_face_scan)(sbf2, pieces2))

    def s3_face_tails(accs, sbf2):
        return segment_tails(accs, sbf2, bf)[:, :29]

    d_face = jax.block_until_ready(jax.jit(s3_face_tails)(accs, sbf2))

    def s4_ladder(accs, sbf2, d_face, giant_ids):
        m2 = giant_ids.shape[0]
        valid_g = giant_ids < bf
        safe_g = jnp.where(valid_g, giant_ids, 0)
        first = jnp.searchsorted(sbf2, safe_g, side="left").astype(jnp.int32)
        last = jnp.searchsorted(sbf2, safe_g, side="right").astype(jnp.int32) - 1
        win = kt
        nlad = -(-(kt + 32) // win)
        pos = last[:, None] - win * jnp.arange(nlad, dtype=jnp.int32)[None, :]
        ok = (pos >= first[:, None]) & valid_g[:, None]
        posc = jnp.maximum(pos, 0).reshape(-1)
        seg = jnp.concatenate([a[posc] for a in accs], axis=1)[:, :29]
        seg = jnp.where(ok.reshape(-1)[:, None], seg, 0.0)
        tot = seg.reshape(m2, nlad, 29).sum(axis=1)
        idx = jnp.where(valid_g, safe_g, bf)
        return d_face.at[idx].set(tot, mode="drop", unique_indices=True)

    def s5_contrib(d_face):
        d_face = d_face.reshape(n_batch, f, 29)
        d_fsum = d_face.sum(axis=0)
        return jnp.concatenate([
            jnp.concatenate([
                d_fsum[:, 9 + 3 * k:12 + 3 * k],
                d_fsum[:, 18 + 3 * k:21 + 3 * k],
                d_face[:, :, k].T,
            ], axis=1)
            for k in range(3)
        ], axis=0)

    contrib = jax.block_until_ready(jax.jit(s5_contrib)(d_face))
    vids = jnp.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])

    def s6_vertex_sort(vids, contrib):
        return sort_rows_by_key(
            vids, [contrib[:, i] for i in range(6 + n_batch)])

    sv, cps = jax.block_until_ready(jax.jit(s6_vertex_sort)(vids, contrib))

    def s7_vertex_scan_tails(sv, cps):
        vaccs = [segmented_prefix_sum(p, sv, 256) for p in cps]
        return segment_tails(vaccs, sv, n_verts)

    # ---- static-permutation replacements for s6 ----
    perm_np = np.argsort(np.concatenate(
        [faces_np[:, 0], faces_np[:, 1], faces_np[:, 2]]), kind="stable")
    perm = jnp.asarray(perm_np.astype(np.int32))
    sv_const = jnp.asarray(np.sort(np.concatenate(
        [faces_np[:, 0], faces_np[:, 1], faces_np[:, 2]])).astype(np.int32))

    def v2_perm_cols(contrib):
        return sv_const, [contrib[perm, i] for i in range(6 + n_batch)]

    def v3_perm_rows(contrib):
        return sv_const, contrib[perm]

    def s3m_tails_materialized(accs, sbf2):
        # Candidate: force the scanned acc pieces into opaque contiguous
        # tables (binning.materialize) before the tails gather -- the same
        # trick that cut the pack gather 148 -> 104 ms. Decides whether
        # XLA's gather from the scan's computed output is already at the
        # parameter-table floor or still decomposed.
        from dmesh2_renderer_tpu.ops.binning import materialize

        return segment_tails([materialize(a) for a in accs], sbf2, bf)[:, :29]

    def s1b_iota_sort_gather(blocked, entry_bf, keep):
        # Round-2 rejected sort(key, iota) + full-R 29-col gather (261 vs
        # 176 ms). Compaction changes the math: the gather only needs the
        # contributing prefix (r2 rows), so re-measure.
        key = jnp.where(keep, entry_bf, bf)
        sbf, pos = jax.lax.sort(
            (key, jnp.arange(r, dtype=jnp.int32)), num_keys=1, is_stable=True)
        pos2 = pos[:r2]
        cols2 = [blocked[:, i, :].reshape(r)[pos2] for i in range(29)]
        return sbf[:r2], cols2

    timeit("s1 keep-mask + 30-operand payload sort (R=4.19M)",
           s1_mask_sort, blocked, entry_bf, keep)
    timeit("s2 face segmented scan x29 (r2=2.1M, 4 steps)",
           s2_face_scan, sbf2, pieces2)
    timeit("s3 face segment tails (2.1M -> 1M x 29)",
           s3_face_tails, accs, sbf2)
    timeit("s3m tails from materialized acc tables",
           s3m_tails_materialized, accs, sbf2)
    timeit("s4 giant ladder (8192 faces)",
           s4_ladder, accs, sbf2, d_face, giant_ids)
    timeit("s5 vertex contrib build (F -> 3F x 7)", s5_contrib, d_face)
    timeit("s6 vertex 8-operand payload sort (3M)",
           s6_vertex_sort, vids, contrib)
    timeit("s7 vertex scan(256) + tails (3M -> 3M x 7)",
           s7_vertex_scan_tails, sv, cps)
    timeit("v2 STATIC perm, 7 column gathers (3M)", v2_perm_cols, contrib)
    timeit("v3 STATIC perm, one (3M, 7) row gather", v3_perm_rows, contrib)
    timeit("s1b 2-op sort + r2-prefix 29-col gather",
           s1b_iota_sort_gather, blocked, entry_bf, keep)


if __name__ == "__main__":
    main()
