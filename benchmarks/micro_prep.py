"""Decompose the geometry-preprocess stage (~87 ms at 1M faces, 1 view).

prep = project (two (P,4)@(4,4) einsums) + face corner gathers
(verts_image[:, faces] for AA, verts_ndc[:, faces, 2] for depth01) + CCW
reorder + depth stats. The einsums are MXU-trivial; hypothesis: the two
separate 3F-row gathers from (B, P, .) tables dominate (the same XLA gather
pathology as the pack stage). Candidates:

  p3) one combined gather from a (P, 5) table (image xy + ndc xyz), split
      after -- halves gather count if XLA keeps it whole
  p4) p3 from a materialize()-pinned table (known per-site coin flip:
      won 2x on the 1M-row face tables, LOST 2x on the 3M-row vertex table)

Run: python benchmarks/micro_prep.py [--cpu-smoke]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu-smoke" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from dmesh2_renderer_tpu import geometry as G
from dmesh2_renderer_tpu.ops.binning import materialize
from dmesh2_renderer_tpu.ops.reference import face_depth01, face_depth01_from_z
from dmesh2_renderer_tpu.utils.meshes import orbit_cameras, triangle_soup


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
    f = 1_000_000 if not smoke else 4096
    width, height = (1920, 1080) if not smoke else (128, 128)
    verts_np, faces_np = triangle_soup(f, size=0.02)
    mv, proj = orbit_cameras(1, radius=3.0)
    verts = jnp.asarray(verts_np)
    faces = jnp.asarray(faces_np)
    mvj, projj = jnp.asarray(mv), jnp.asarray(proj)
    verts, faces = jax.block_until_ready((verts, faces))

    def p0_full(verts):
        verts_ndc, verts_image = G.compute_verts_ndc_image(
            verts, mvj, projj, width, height)
        aa_verts = G.face_aa_verts_ccw(verts_image, faces, 256)
        depth01, _, _, alive = face_depth01(verts_ndc, faces)
        return aa_verts, depth01, alive

    def p1_project(verts):
        return G.compute_verts_ndc_image(verts, mvj, projj, width, height)

    verts_ndc, verts_image = jax.block_until_ready(jax.jit(p1_project)(verts))

    def p2_gathers(verts_ndc, verts_image):
        aa = G.face_aa_verts_ccw(verts_image, faces, 256)
        d, _, _, al = face_depth01(verts_ndc, faces)
        return aa, d, al

    def p3_combined(verts_ndc, verts_image):
        tbl = jnp.concatenate([verts_image, verts_ndc], axis=-1)  # (B, P, 5)
        fv = tbl[:, faces]                                        # (B,F,3,5)
        img = fv[..., :2]
        z = fv[..., 4]
        p0, p1, p2 = img[..., 0, :], img[..., 1, :], img[..., 2, :]
        neg = G.tri_area2(p0, p1, p2) < 0.0
        q1 = jnp.where(neg[..., None], p2, p1)
        q2 = jnp.where(neg[..., None], p1, p2)
        aa = jnp.stack([p0, q1, q2], axis=-2)
        d, _, _, al = face_depth01_from_z(z)
        return aa, d, al

    def p4_combined_mat(verts_ndc, verts_image):
        tbl = jnp.concatenate([verts_image, verts_ndc], axis=-1)
        b, p, w5 = tbl.shape
        tbl = materialize(tbl.reshape(b * p, w5),
                          interpret=smoke).reshape(b, p, w5)
        fv = tbl[:, faces]
        img = fv[..., :2]
        z = fv[..., 4]
        p0, p1, p2 = img[..., 0, :], img[..., 1, :], img[..., 2, :]
        neg = G.tri_area2(p0, p1, p2) < 0.0
        q1 = jnp.where(neg[..., None], p2, p1)
        q2 = jnp.where(neg[..., None], p1, p2)
        aa = jnp.stack([p0, q1, q2], axis=-2)
        d, _, _, al = face_depth01_from_z(z)
        return aa, d, al

    timeit("p0 full prep (project + gathers + ccw + depth)", p0_full, verts)
    timeit("p1 project only (2 einsums + divide)", p1_project, verts)
    timeit("p2 gathers+ccw+depth from projected", p2_gathers,
           verts_ndc, verts_image)
    timeit("p3 ONE combined (P,5) gather, split after", p3_combined,
           verts_ndc, verts_image)
    timeit("p4 p3 with materialize()-pinned table", p4_combined_mat,
           verts_ndc, verts_image)


if __name__ == "__main__":
    main()
