"""Decompose pack_face_stream cost: gather vs pad-concat vs block transpose.

The pack stage (binning.gather_stream) measured ~288 ms at R=6.29M while the
isolated 29-wide gather floor for realistic binning indices is ~190 ms
(docs/DESIGN.md gather study) -- this isolates where the difference lives:
the row gathers themselves, the 32-pad concat, or the (R, 32) ->
(R/128, 32, 128) field-major block transpose.

Run on the real chip: python benchmarks/micro_packparts.py
"""

import time

import jax
import jax.numpy as jnp

from dmesh2_renderer_tpu.ops.binning import _TABLE_SPLITS, STREAM_BLOCK
from dmesh2_renderer_tpu.utils.config import FACE_RECORD_WIDTH


def _force(out):
    # Scalar host readback: block_until_ready is unreliable through the
    # remote tunnel (see benchmarks/profile_stages.py).
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
    r = 40 * (1 << 17)          # 5.24M, the bench capacity
    bf = 1_000_000
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))

    # Realistic stream indices: sorted-by-tile entries hit each face ~5x at
    # scattered positions; sentinel tail reads row 0. Random uniform indices
    # + tail reproduce the measured distribution cost.
    n_real = int(r * 0.96)
    entry = jnp.where(
        jnp.arange(r) < n_real,
        jax.random.randint(k0, (r,), 0, bf, dtype=jnp.int32),
        jnp.int32(bf),
    )
    tables = tuple(
        jax.random.normal(k1, (bf + 1, w), jnp.float32) for w in _TABLE_SPLITS
    )
    entry, tables = jax.block_until_ready((entry, tables))
    nb = r // STREAM_BLOCK

    def gather_only(entry, tables):
        safe = jnp.minimum(entry, bf)
        return tuple(t[safe] for t in tables)

    def gather_concat(entry, tables):
        parts = gather_only(entry, tables)
        pad = jnp.zeros((r, FACE_RECORD_WIDTH - 29), jnp.float32)
        return jnp.concatenate(parts + (pad,), axis=1)

    def full_pack(entry, tables):
        rows = gather_concat(entry, tables)
        return rows.reshape(nb, STREAM_BLOCK, FACE_RECORD_WIDTH).transpose(0, 2, 1)

    def transpose_only(rows):
        return rows.reshape(nb, STREAM_BLOCK, FACE_RECORD_WIDTH).transpose(0, 2, 1)

    t_g = timeit("gather 16+8+5 splits only", gather_only, entry, tables)
    t_gc = timeit("gather + pad-concat to 32", gather_concat, entry, tables)
    rows = jax.jit(gather_concat)(entry, tables)
    rows = jax.block_until_ready(rows)
    t_t = timeit("block transpose only (R,32)->(NB,32,128)",
                 transpose_only, rows)
    t_f = timeit("full pack (gather+concat+transpose)", full_pack,
                 entry, tables)
    print(f"concat overhead ~{t_gc - t_g:.1f} ms, transpose ~{t_t:.1f} ms, "
          f"fusion vs sum {t_f - (t_gc + t_t):+.1f} ms")

    # ---- discriminate the real-pipeline slowdown (~240 ms vs the above):
    # (a) tables built IN-JIT behind the optimization_barrier (as
    #     build_face_table does) instead of passed in as parameters;
    # (b) the REAL tile-sorted entry_bf index distribution.
    base = jax.random.normal(jax.random.PRNGKey(2), (bf + 1, 32), jnp.float32)

    def pack_tables_injit(entry, base):
        cols, pos = [], 0
        for w in _TABLE_SPLITS:
            cols.append(base[:, pos:pos + w] * 2.0)
            pos += w
        tables_j = jax.lax.optimization_barrier(tuple(cols))
        rows = jnp.concatenate(
            [t[jnp.minimum(entry, bf)] for t in tables_j]
            + [jnp.zeros((entry.shape[0], FACE_RECORD_WIDTH - 29),
                         jnp.float32)],
            axis=1,
        )
        return rows.reshape(-1, STREAM_BLOCK, FACE_RECORD_WIDTH).transpose(0, 2, 1)

    timeit("full pack, tables built in-jit + barrier", pack_tables_injit,
           entry, base)

    from dmesh2_renderer_tpu.ops.binning import bin_faces
    from dmesh2_renderer_tpu.ops import reference as ref_ops
    from dmesh2_renderer_tpu import geometry as G
    from dmesh2_renderer_tpu.utils.meshes import orbit_cameras, triangle_soup

    verts_np, faces_np = triangle_soup(1_000_000, size=0.02)
    mv, proj = orbit_cameras(1, radius=3.0)
    faces = jnp.asarray(faces_np)
    verts = jnp.asarray(verts_np)
    mv, proj = jnp.asarray(mv), jnp.asarray(proj)

    @jax.jit
    def real_entries(verts):
        verts_ndc, verts_image = G.compute_verts_ndc_image(
            verts, mv, proj, 1920, 1080)
        aa_verts = G.face_aa_verts_ccw(verts_image, faces)
        depth01, _, _, alive = ref_ops.face_depth01(verts_ndc, faces)
        pm = jnp.zeros((1, 2), jnp.int32)
        return bin_faces(aa_verts, depth01, alive, pm, 1920, 1080, r, 16,
                         num_giant_faces=8192, giant_tiles=32).entry_bf

    entry_real = jax.block_until_ready(real_entries(verts))
    timeit("full pack, REAL tile-sorted entry_bf", full_pack,
           entry_real, tables)
    timeit("full pack, real entries + in-jit tables", pack_tables_injit,
           entry_real, base)

    # (c) in-jit tables forced through an opaque Pallas copy: XLA cannot
    # trace the gather operand back to slices/concats, so the narrow
    # contiguous split tables are truly materialized.
    from dmesh2_renderer_tpu.ops.binning import materialize

    def pack_tables_pallas(entry, base):
        cols, pos = [], 0
        for w in _TABLE_SPLITS:
            cols.append(materialize(base[:, pos:pos + w] * 2.0))
            pos += w
        rows = jnp.concatenate(
            [t[jnp.minimum(entry, bf)] for t in cols]
            + [jnp.zeros((entry.shape[0], FACE_RECORD_WIDTH - 29),
                         jnp.float32)],
            axis=1,
        )
        return rows.reshape(-1, STREAM_BLOCK, FACE_RECORD_WIDTH).transpose(0, 2, 1)

    timeit("full pack, real entries + pallas-materialized",
           pack_tables_pallas, entry_real, base)


if __name__ == "__main__":
    main()
