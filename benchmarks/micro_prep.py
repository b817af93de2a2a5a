"""Time geometry-preprocess gather variants on the bench scene.

The round-2 consolidation of the three corner gathers (AA verts, depth z,
record corners) into ONE materialized (P, 6+3B) vtab gather REGRESSED prep
81 -> 164 ms: the face tables are BF=1M rows where materialize wins, but
vtab is P=3M rows, where XLA's decomposed narrow gathers (fused with their
broadcast producers) were already fast. This micro discriminates: single
materialized gather vs single plain gather vs per-piece gathers.
"""

import time

import jax
import jax.numpy as jnp

from dmesh2_renderer_tpu import geometry as G
from dmesh2_renderer_tpu.ops.binning import materialize
from dmesh2_renderer_tpu.utils.meshes import orbit_cameras, triangle_soup


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
    verts_np, faces_np = triangle_soup(1_000_000, size=0.02)
    mv, proj = orbit_cameras(1, radius=3.0)
    verts = jnp.asarray(verts_np)
    faces = jnp.asarray(faces_np)
    vc = jnp.abs(verts) % 1.0
    mv, proj = jnp.asarray(mv), jnp.asarray(proj)
    w, h = 1920, 1080

    def ndc(verts):
        return G.compute_verts_ndc_image(verts, mv, proj, w, h)

    timeit("projection only", ndc, verts)

    def prep_materialized(verts):
        verts_ndc, verts_image = ndc(verts)
        return G.face_corner_data(verts, vc, verts_image, verts_ndc, faces,
                                  False)

    timeit("consolidated gather, materialized vtab", prep_materialized, verts)

    def prep_plain_concat(verts):
        verts_ndc, verts_image = ndc(verts)
        b, p = verts_image.shape[:2]
        f = faces.shape[0]
        imgcols = jnp.swapaxes(verts_image, 0, 1).reshape(p, 2 * b)
        zcols = jnp.swapaxes(verts_ndc[..., 2], 0, 1)
        vtab = jnp.concatenate([verts, vc, imgcols, zcols], axis=1)
        fvt = vtab[faces.reshape(-1)].reshape(f, 3, 6 + 3 * b)
        return fvt

    timeit("consolidated gather, plain concat vtab", prep_plain_concat, verts)

    def prep_pieces(verts):
        verts_ndc, verts_image = ndc(verts)
        vid = faces.reshape(-1)
        f = faces.shape[0]
        fv = verts[vid].reshape(f, 3, 3)
        fc = vc[vid].reshape(f, 3, 3)
        fimg = verts_image[:, faces]
        fz = verts_ndc[:, faces, 2]
        return fv, fc, fimg, fz

    timeit("four separate piece gathers (old style)", prep_pieces, verts)

    def prep_old(verts):
        verts_ndc, verts_image = ndc(verts)
        aa = G.face_aa_verts_ccw(verts_image, faces)
        from dmesh2_renderer_tpu.ops.binning import gather_face_corners
        v9, c9, z = gather_face_corners(verts, vc, verts_ndc, faces)
        return aa, v9, c9, z

    timeit("round-1 structure (aa gather + corner gather)", prep_old, verts)


if __name__ == "__main__":
    main()
