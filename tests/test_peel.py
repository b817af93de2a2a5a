"""LayeredRenderer / peel kernel tests vs a brute-force numpy oracle.

The oracle intersects every existing face with every pixel ray in float32
(matching kernel arithmetic) and takes the first L hits by ray parameter --
exactly the output contract of the reference's tet-walk
(``generateRenderLayersCUDA``, forward.cu:744-1000) for well-posed rays.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dmesh2_renderer_tpu import geometry as G
from dmesh2_renderer_tpu.models.layered import LayeredRenderer
from dmesh2_renderer_tpu.utils.config import RasterConfig
from dmesh2_renderer_tpu.utils.meshes import orbit_cameras, tet_grid


def brute_force_layers(verts, faces, exist, ray_o, ray_d, num_layers):
    v = verts[faces].astype(np.float32)            # (F, 3, 3)
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    h, w, _ = ray_d.shape
    layers = np.full((h, w, num_layers), -1, np.int32)
    counts = np.zeros((h, w), np.int32)
    for y in range(h):
        for x in range(w):
            rd = ray_d[y, x]
            t0 = ray_o - v[:, 0]
            pv = np.cross(np.broadcast_to(rd, v[:, 0].shape), e2)
            qv = np.cross(t0, e1)
            den = (pv * e1).sum(1)
            ok = den != 0
            inv = np.where(ok, 1.0 / np.where(ok, den, 1.0), 0.0).astype(np.float32)
            tt = ((qv * e2).sum(1) * inv).astype(np.float32)
            u = ((pv * t0).sum(1) * inv).astype(np.float32)
            vv = ((qv * rd).sum(1) * inv).astype(np.float32)
            hit = ok & (tt >= 0) & (u >= 0) & (vv >= 0) & (u + vv <= 1) & (exist > 0)
            ids = np.nonzero(hit)[0]
            order = ids[np.argsort(tt[ids], kind="stable")][:num_layers]
            layers[y, x, : len(order)] = order
            counts[y, x] = len(order)
    return layers, counts


def test_rays_point_into_scene():
    """Regression: rays must have positive hit parameters toward the scene
    (an unprojection missing the perspective division flips them)."""
    mv, proj = orbit_cameras(2)
    ray_o, ray_d = G.init_rays(jnp.asarray(mv), jnp.asarray(proj), 16, 16)
    ro = np.asarray(ray_o)[0, 0, 0]
    rd = np.asarray(ray_d)[0, 8, 8]
    t_closest = -np.dot(ro, rd)
    assert t_closest > 0, "center ray points away from the origin"
    assert np.linalg.norm(ro + t_closest * rd) < 0.25


@pytest.mark.parametrize(
    "num_layers", [3, pytest.param(8, marks=pytest.mark.slow)]
)
def test_peel_matches_brute_force(num_layers):
    verts, tets, faces, face_tets, tet_faces = tet_grid(res=2)
    exist = np.ones(faces.shape[0], np.int32)
    exist[::3] = 0  # existence filter must drop these faces
    mv, proj = orbit_cameras(1)
    hw = 32

    cfg = RasterConfig(binning_capacity=1 << 13, interpret=True)
    lr = LayeredRenderer(mv, proj, hw, hw, config=cfg)
    layers, counts = lr.generate(
        jnp.array([0]), verts, faces, tets, face_tets, tet_faces, exist, num_layers
    )
    layers = np.asarray(layers)[0]
    counts = np.asarray(counts)[0]

    ray_o = np.asarray(lr.ray_o)[0, 0, 0]
    ray_d = np.asarray(lr.ray_d)[0]
    ref_layers, ref_counts = brute_force_layers(
        verts, faces, exist, ray_o, ray_d, num_layers
    )

    # Allow a sliver of pixels to differ where two faces meet at (near-)equal
    # t -- float ordering there is representation-dependent.
    mismatch = (layers != ref_layers).any(axis=-1) | (counts != ref_counts)
    assert mismatch.mean() < 0.01, f"{mismatch.sum()} / {mismatch.size} pixels differ"
    assert counts.max() > 0


def test_peel_capacity_truncation_keeps_nearest_layers():
    """Binning-capacity overflow contract (reference: the CUDA path never
    truncates, renderer.cu:603 resizes instead): entries are cut at the END
    of the tile-major, min-depth-sorted stream, so a partially-truncated
    tile keeps exactly its NEAREST entries (an exact layer prefix + an
    undercounted cnt), later tiles lose everything, and ``last_aux`` reports
    the drop. 122 full-frame quad-triangles x 4 tiles = 488 entries vs
    capacity 128: tile0 keeps all 122, tile1 keeps the 6 nearest faces
    (= the 3 nearest quads; a pixel ray hits one triangle per quad), tiles
    2-3 keep none."""
    nq = 61
    f = 2 * nq
    verts = np.zeros((4 * nq, 3), np.float32)
    faces = np.zeros((f, 3), np.int32)
    s = 2.0  # covers the frame from ~2.6 away at fov 45 without leaving the frustum
    for k in range(nq):
        x = 0.5 - k / nq  # quad 0 nearest to the camera at (+3, 0.9, 0)
        verts[4 * k:4 * k + 4] = [[x, -s, -s], [x, s, -s], [x, s, s], [x, -s, s]]
        faces[2 * k] = [4 * k, 4 * k + 1, 4 * k + 2]
        faces[2 * k + 1] = [4 * k, 4 * k + 2, 4 * k + 3]
    exist = np.ones(f, np.int32)
    dummy_tets = np.zeros((1, 4), np.int32)
    dummy_ft = np.zeros((f, 2), np.int32)
    dummy_tf = np.zeros((1, 4), np.int32)
    mv, proj = orbit_cameras(1)
    hw = 32  # 2x2 tile grid

    def run(capacity):
        cfg = RasterConfig(binning_capacity=capacity, max_tiles_per_face=4,
                           num_giant_faces=0, interpret=True)
        lr = LayeredRenderer(mv, proj, hw, hw, config=cfg)
        layers, counts = lr.generate(
            jnp.array([0]), verts, faces, dummy_tets, dummy_ft, dummy_tf,
            exist, 8,
        )
        return np.asarray(layers)[0], np.asarray(counts)[0], lr.last_aux

    ref_layers, ref_counts, ref_aux = run(2048)
    assert int(ref_aux[1]) == 0
    assert (ref_counts == 8).all()  # 61 quads ahead of every pixel

    layers, counts, aux = run(1)  # rounds up to one 128-entry block
    assert int(aux[1]) == 488 - 128

    t00 = np.s_[:16, :16]   # tile (ty=0, tx=0): fully kept
    t01 = np.s_[:16, 16:]   # tile (ty=0, tx=1): 6 nearest faces = 3 quads
    bot = np.s_[16:, :]     # tiles (1, 0) and (1, 1): fully dropped
    np.testing.assert_array_equal(layers[t00], ref_layers[t00])
    np.testing.assert_array_equal(counts[t00], ref_counts[t00])
    np.testing.assert_array_equal(counts[t01], 3)
    # Surviving layers are an exact NEAREST prefix of the reference's.
    np.testing.assert_array_equal(layers[t01][..., :3], ref_layers[t01][..., :3])
    assert (layers[t01][..., 3:] == -1).all()
    assert (counts[bot] == 0).all() and (layers[bot] == -1).all()


def _subgrid(verts, tets, faces, tet_faces, keep):
    """Restrict a tet grid to the kept tets, keeping ALL faces (the faces of
    dropped tets stay as geometry, exactly the 'delete tets, keep faces'
    construction of a non-convex/partial grid)."""
    tets2 = tets[keep]
    tet_faces2 = tet_faces[keep]
    face_tets2 = np.full((faces.shape[0], 2), -1, np.int32)
    fill = np.zeros(faces.shape[0], np.int32)
    for t_new in range(tets2.shape[0]):
        for f in tet_faces2[t_new]:
            face_tets2[f, fill[f]] = t_new
            fill[f] += 1
    return tets2, face_tets2, tet_faces2


def _walk_vs_peel(verts, tets, faces, face_tets, tet_faces, exist, hw, L):
    from tests._tet_walk_oracle import walk_layers

    mv, proj = orbit_cameras(1)
    cfg = RasterConfig(binning_capacity=1 << 14, interpret=True)
    lr = LayeredRenderer(mv, proj, hw, hw, config=cfg)
    peel_l, peel_c = lr.generate(
        jnp.array([0]), verts, faces, tets, face_tets, tet_faces, exist, L
    )
    peel_l, peel_c = np.asarray(peel_l)[0], np.asarray(peel_c)[0]
    ray_o = np.asarray(lr.ray_o)[0, 0, 0].astype(np.float32)
    ray_d = np.asarray(lr.ray_d)[0].astype(np.float32)
    walk_l, walk_c = walk_layers(verts, faces, tets, face_tets, tet_faces,
                                 exist, ray_o, ray_d, L)
    return walk_l, walk_c, peel_l, peel_c


def _prefix_ok(walk_l, walk_c, peel_l, peel_c):
    """Pixelwise: the walk's records are a leading prefix of the peel's."""
    h, w, L = walk_l.shape
    ok = np.ones((h, w), bool)
    for y in range(h):
        for x in range(w):
            c = walk_c[y, x]
            ok[y, x] = (c <= peel_c[y, x]
                        and (walk_l[y, x, :c] == peel_l[y, x, :c]).all())
    return ok


def test_peel_matches_tet_walk_oracle_convex():
    """On a CONVEX grid the reference tet walk (numpy oracle port of
    forward.cu:744-1000) and the MT-enumeration peel agree: a ray that
    enters a convex grid crosses every face between entry and exit in walk
    order = ascending ray parameter, so the records coincide (up to
    degenerate simplex-boundary rays the walk aborts via its numeric
    guards)."""
    verts, tets, faces, face_tets, tet_faces = tet_grid(res=2)
    exist = np.ones(faces.shape[0], np.int32)
    exist[::4] = 0
    walk_l, walk_c, peel_l, peel_c = _walk_vs_peel(
        verts, tets, faces, face_tets, tet_faces, exist, 24, 4)
    equal = (walk_l == peel_l).all(axis=-1) & (walk_c == peel_c)
    # Guard-aborted rays still yield a prefix; full equality holds broadly.
    assert equal.mean() > 0.95, f"{(~equal).sum()} / {equal.size} differ"
    assert _prefix_ok(walk_l, walk_c, peel_l, peel_c).mean() > 0.99


def test_peel_vs_tet_walk_nonconvex_divergence_is_prefix_only():
    """NON-CONVEX grid (middle-x tet layer deleted, faces kept): rays cross
    the gap, EXIT the grid and RE-ENTER. The reference walk stops at the
    boundary (forward.cu:983-989: neighbor tet -1) after recording the exit
    face; the peel keeps recording the re-entry hits. The divergence class
    (documented in ops/peel.py) is exactly: the walk's output is a LEADING
    PREFIX of the peel's, strictly shorter only for boundary-stopped rays.
    This test proves the divergence is confined there."""
    verts, tets, faces, face_tets, tet_faces = tet_grid(res=3)
    cent = verts[tets].mean(axis=1)
    ext = np.abs(verts[:, 0]).max()
    third = 2 * ext / 3
    keep = ~((cent[:, 0] > -ext + third) & (cent[:, 0] < ext - third))
    assert keep.sum() < keep.size
    tets2, face_tets2, tet_faces2 = _subgrid(verts, tets, faces, tet_faces, keep)
    exist = np.ones(faces.shape[0], np.int32)
    walk_l, walk_c, peel_l, peel_c = _walk_vs_peel(
        verts, tets2, faces, face_tets2, tet_faces2, exist, 24, 6)

    assert _prefix_ok(walk_l, walk_c, peel_l, peel_c).mean() > 0.99
    # The divergence must actually occur: a sizable set of rays re-enters.
    short = (walk_c < peel_c).mean()
    assert short > 0.2, f"only {short:.1%} boundary-stopped rays"
