"""Static-capacity binning vs brute-force tile assignment."""

import jax.numpy as jnp
import numpy as np

from dmesh2_renderer_tpu import geometry as G
from dmesh2_renderer_tpu.ops.binning import bin_faces, face_tile_rects, tile_grid_size
from dmesh2_renderer_tpu.ops.reference import face_depth01
from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras


def _setup(width=48, height=32, b=2):
    verts, faces = icosphere(1)
    mv, proj = orbit_cameras(b)
    mv, proj = jnp.asarray(mv), jnp.asarray(proj)
    verts_ndc, verts_image = G.compute_verts_ndc_image(jnp.asarray(verts), mv, proj, width, height)
    tris = G.face_aa_triangles(verts_image, jnp.asarray(faces))
    depth01, _, _, alive = face_depth01(verts_ndc, jnp.asarray(faces))
    return tris.verts, depth01, alive, verts_ndc


def test_binning_matches_bruteforce():
    width, height, b = 48, 32, 2
    aa_verts, depth01, alive, _ = _setup(width, height, b)
    pm = jnp.zeros((b, 2), jnp.int32)
    gx, gy = tile_grid_size(width, height)
    f = depth01.shape[1]

    binning = bin_faces(aa_verts, depth01, alive, pm, width, height,
                        capacity=4096, max_tiles_per_face=64)
    assert int(binning.num_truncated) == 0

    rx0, ry0, rw, rh = (np.asarray(x) for x in face_tile_rects(aa_verts, pm, gx, gy))
    d = np.asarray(depth01)
    al = np.asarray(alive)
    entry = np.asarray(binning.entry_bf)
    starts = np.asarray(binning.tile_starts)
    counts = np.asarray(binning.tile_counts)

    total = 0
    for bi in range(b):
        for ty in range(gy):
            for tx in range(gx):
                tid = bi * gx * gy + ty * gx + tx
                expected = [
                    fi for fi in range(f)
                    if al[bi, fi]
                    and rx0[bi, fi] <= tx < rx0[bi, fi] + rw[bi, fi]
                    and ry0[bi, fi] <= ty < ry0[bi, fi] + rh[bi, fi]
                ]
                expected.sort(key=lambda fi: d[bi, fi])
                got = [int(e) % f for e in entry[starts[tid]:starts[tid] + counts[tid]]]
                got_depths = [d[bi, fi] for fi in got]
                assert sorted(got) == sorted(expected), (bi, ty, tx)
                assert got_depths == sorted(got_depths)
                assert all(int(e) // f == bi for e in entry[starts[tid]:starts[tid] + counts[tid]])
                total += len(expected)
    assert total == int(binning.num_rendered)


def test_far_plane_depth_stays_in_its_tile():
    """depth01 == 1.0 must not overflow the quantized depth field into the
    tile bits of the packed sort key (small grids have bits_d >= 25, where
    float-domain clamping rounds up to 2^bits_d)."""
    # One 16x16 tile; a single face covering it, exactly at the far plane.
    aa = jnp.asarray([[[[2.0, 2.0], [14.0, 2.0], [8.0, 14.0]]]], jnp.float32)
    depth01 = jnp.ones((1, 1), jnp.float32)
    alive = jnp.ones((1, 1), bool)
    pm = jnp.zeros((1, 2), jnp.int32)
    binning = bin_faces(aa, depth01, alive, pm, 16, 16,
                        capacity=128, max_tiles_per_face=4)
    assert int(binning.tile_counts[0]) == 1
    assert int(binning.num_truncated) == 0


def test_tile_grid_key_limit_raises_value_error():
    import pytest

    aa = jnp.zeros((1, 1, 3, 2), jnp.float32)
    depth01 = jnp.zeros((1, 1), jnp.float32)
    alive = jnp.ones((1, 1), bool)
    pm = jnp.zeros((1, 2), jnp.int32)
    with pytest.raises(ValueError, match="shard views"):
        bin_faces(aa, depth01, alive, pm, 16 * 2048, 16 * 2048,
                  capacity=128, max_tiles_per_face=4)


def test_giant_face_fully_binned():
    """A camera-filling triangle must land in EVERY tile it touches via the
    giant tier, not be clipped to its first max_tiles_per_face tiles
    (reference contract: unbounded duplication, renderer.cu:415-465)."""
    width = height = 128  # 8x8 tile grid
    # One huge triangle spanning the frame + one small one (tier-1 path).
    aa = jnp.asarray(
        [[[[-50.0, -50.0], [300.0, -40.0], [60.0, 300.0]],
          [[2.0, 2.0], [10.0, 2.0], [6.0, 10.0]]]], jnp.float32)
    depth01 = jnp.asarray([[0.5, 0.25]], jnp.float32)
    alive = jnp.ones((1, 2), bool)
    pm = jnp.zeros((1, 2), jnp.int32)

    clipped = bin_faces(aa, depth01, alive, pm, width, height,
                        capacity=512, max_tiles_per_face=4, num_giant_faces=0)
    assert int(clipped.num_truncated) > 0

    full = bin_faces(aa, depth01, alive, pm, width, height,
                     capacity=512, max_tiles_per_face=4, num_giant_faces=4)
    assert int(full.num_truncated) == 0
    assert int(full.num_rendered) == int(jnp.sum(full.tile_counts))
    assert int(full.giant_ids[0]) == 0 and int(full.giant_ids[1]) == 2  # sentinel

    # Brute-force coverage of the giant face, with per-tile depth order.
    gx, gy = tile_grid_size(width, height)
    rx0, ry0, rw, rh = (np.asarray(x) for x in face_tile_rects(aa, pm, gx, gy))
    entry = np.asarray(full.entry_bf)
    starts = np.asarray(full.tile_starts)
    counts = np.asarray(full.tile_counts)
    for ty in range(gy):
        for tx in range(gx):
            tid = ty * gx + tx
            expected = sorted(
                fi for fi in range(2)
                if rx0[0, fi] <= tx < rx0[0, fi] + rw[0, fi]
                and ry0[0, fi] <= ty < ry0[0, fi] + rh[0, fi]
            )
            got = sorted(int(e) for e in entry[starts[tid]:starts[tid] + counts[tid]])
            assert got == expected, (ty, tx, got, expected)


import pytest


# kt=3 (non-pow2 ladder stride, the regression-prone path) stays in the
# fast set; kt=4 duplicates the pow2 scan path the compaction/golden
# tests already run at Kt=16.
@pytest.mark.parametrize("kt", [pytest.param(4, marks=pytest.mark.slow), 3])
def test_giant_face_render_and_grads_match_reference(kt):
    """End-to-end: a frame-spanning triangle renders and differentiates
    identically to the pure-XLA reference compositor (which has no tile
    capacity limits), exercising the giant gradient-reduction correction.

    kt=3 exercises the NON-power-of-two tile cap: the segmented scan's
    window is next_pow2(Kt), and the giant-ladder must stride by that
    window, not Kt (striding by a non-pow2 Kt double-counts rows)."""
    import jax

    from dmesh2_renderer_tpu.functional import render
    from dmesh2_renderer_tpu.ops.reference import render_reference
    from dmesh2_renderer_tpu.utils.config import RasterConfig

    width = height = 64
    # Face 0 spans ~52x55 px (~16 tiles > Kt=4 -> giant tier); coordinates
    # stay moderate: at frame-dwarfing sizes (~5x overhang) the ANALYTIC
    # gradient and AD-of-the-clipped-arithmetic legitimately diverge at
    # subgradient ties (f32 cancellation in the reference's clip chain),
    # which is not what this test pins.
    verts = np.asarray(
        [[-1.53, -1.71, 0.03], [1.62, -1.38, 0.21], [0.11, 1.83, -0.17],
         [-0.41, -0.32, 0.52], [0.43, -0.29, 0.51], [0.02, 0.53, 0.48]],
        np.float32)
    faces = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
    mv = np.eye(4, dtype=np.float32)[None]
    mv[0, 2, 3] = -3.0  # camera at z = +3 looking down -z
    proj = np.asarray(  # perspective, near=1 far=10
        [[1.5, 0, 0, 0], [0, 1.5, 0, 0],
         [0, 0, -11.0 / 9.0, -20.0 / 9.0], [0, 0, -1.0, 0]], np.float32)[None]
    vc = np.abs(verts) % 1.0
    op = np.asarray([0.6, 0.8], np.float32)
    it_ = np.ones((1, 2), np.float32)
    bg = np.asarray([0.1, 0.2, 0.3], np.float32)
    cfg = RasterConfig(binning_capacity=512, max_tiles_per_face=kt,
                       num_giant_faces=2, interpret=True)

    def loss_pallas(v, c, o):
        col, dep, aux = render(jnp.asarray(v), jnp.asarray(faces),
                               jnp.asarray(c), jnp.asarray(o),
                               jnp.asarray(it_), jnp.asarray(mv),
                               jnp.asarray(proj), jnp.asarray(bg),
                               width, height, 1.0, cfg)
        return jnp.sum(jnp.sin(col * 2.0)) + jnp.sum(dep), (col, aux)

    def loss_ref(v, c, o):
        vj = jnp.asarray(v)
        mvj, projj = jnp.asarray(mv), jnp.asarray(proj)
        ray_o, ray_d = G.init_rays(mvj, projj, width, height)
        verts_ndc, verts_image = G.compute_verts_ndc_image(
            vj, mvj, projj, width, height)
        tris = G.face_aa_triangles(verts_image, jnp.asarray(faces))
        col, dep, _ = render_reference(
            vj, jnp.asarray(faces), jnp.asarray(c), jnp.asarray(o),
            verts_ndc, jnp.asarray(it_), tris.verts, jnp.asarray(bg),
            jnp.zeros((1, 2), jnp.int32), ray_o, ray_d, 1.0)
        dep = 1.0 - (dep + 1.0) / 2.0
        return jnp.sum(jnp.sin(col * 2.0)) + jnp.sum(dep), col

    (_, (col, aux)) = jax.jit(lambda *a: loss_pallas(*a))(verts, vc, op)
    assert int(aux.num_truncated) == 0
    (_, col_ref) = jax.jit(lambda *a: loss_ref(*a))(verts, vc, op)
    np.testing.assert_allclose(np.asarray(col), np.asarray(col_ref), atol=5e-6)

    g = jax.jit(jax.grad(lambda *a: loss_pallas(*a)[0], argnums=(0, 1, 2)))(
        verts, vc, op)
    g_ref = jax.jit(jax.grad(lambda *a: loss_ref(*a)[0], argnums=(0, 1, 2)))(
        verts, vc, op)
    for got, want, name in zip(g, g_ref, ("dverts", "dcolor", "dop")):
        scale = max(np.abs(np.asarray(want)).max(), 1.0)
        err = np.abs(np.asarray(got) - np.asarray(want)).max()
        assert err < 1e-4 * scale, f"{name}: {err:.3e} vs scale {scale:.3e}"


def test_binning_overflow_reported():
    width, height, b = 48, 32, 1
    aa_verts, depth01, alive, _ = _setup(width, height, b)
    pm = jnp.zeros((b, 2), jnp.int32)
    small = bin_faces(aa_verts[:1], depth01[:1], alive[:1], pm, width, height,
                      capacity=16, max_tiles_per_face=2)
    assert int(small.num_truncated) > 0


def test_giant_tier_prefers_most_oversized():
    """When oversized faces outnumber the giant slots, the MOST-oversized
    faces win them (a camera-filling triangle must never lose its slot to a
    face that barely exceeds Kt; ties broken by ascending entry id)."""
    width = height = 128  # 8x8 tile grid
    # Face 0: barely oversized (~2x3 tiles). Face 1: frame-filling.
    # Face 2: mid-sized (~4x4 tiles).
    aa = jnp.asarray(
        [[[[2.0, 2.0], [44.0, 4.0], [20.0, 40.0]],
          [[-50.0, -50.0], [300.0, -40.0], [60.0, 300.0]],
          [[60.0, 60.0], [120.0, 62.0], [90.0, 120.0]]]], jnp.float32)
    depth01 = jnp.asarray([[0.5, 0.25, 0.75]], jnp.float32)
    alive = jnp.ones((1, 3), bool)
    pm = jnp.zeros((1, 2), jnp.int32)

    full = bin_faces(aa, depth01, alive, pm, width, height,
                     capacity=512, max_tiles_per_face=4, num_giant_faces=2)
    ids = sorted(int(i) for i in full.giant_ids)
    assert ids == [1, 2], ids  # faces 1 and 2, NOT (0, 1) by id order
    # Face 0 loses its tier slot; its overflow must be reported.
    assert int(full.num_truncated) > 0


def test_exact_tile_cull_drops_bbox_only_tiles():
    """A thin diagonal triangle's bbox rect spans a 4x4 tile block, but the
    triangle itself only crosses the diagonal band of tiles; the SAT cull
    must drop the empty corner tiles, not count them as truncation, and
    keep num_rendered at the reference's rect count."""
    width = height = 64  # 4x4 tiles
    aa = jnp.asarray(
        [[[[1.0, 1.0], [6.0, 2.0], [62.0, 62.0]]]], jnp.float32)
    depth01 = jnp.asarray([[0.5]], jnp.float32)
    alive = jnp.ones((1, 1), bool)
    pm = jnp.zeros((1, 2), jnp.int32)

    rect = bin_faces(aa, depth01, alive, pm, width, height,
                     capacity=128, max_tiles_per_face=16)
    culled = bin_faces(aa, depth01, alive, pm, width, height,
                       capacity=128, max_tiles_per_face=16,
                       exact_tile_cull=True)
    assert int(rect.num_rendered) == 16
    assert int(culled.num_rendered) == 16          # reference rect count
    assert int(rect.num_truncated) == 0
    assert int(culled.num_truncated) == 0          # culled != truncated
    n_rect = int((rect.entry_bf != 1).sum() == 0) * 0 + int(
        jnp.sum(rect.tile_counts))
    n_cull = int(jnp.sum(culled.tile_counts))
    assert n_rect == 16
    assert n_cull < n_rect
    # The band tiles (diagonal) must survive: tile (ty, tx) for ty == tx.
    counts = np.asarray(culled.tile_counts).reshape(4, 4)
    assert (counts.diagonal() == 1).all()
    # The far corners cannot intersect the band.
    assert counts[0, 3] == 0 and counts[3, 0] == 0


def test_exact_tile_cull_render_and_grads_unchanged():
    """With a scene fully in front of the camera, exact tile culling must
    not change the image or any gradient beyond chunk-reassociation ulp
    noise (dropped slots never pass the kernels' AA/inside tests)."""
    import jax

    from dmesh2_renderer_tpu.functional import render
    from dmesh2_renderer_tpu.utils.config import RasterConfig
    from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras

    verts_np, faces_np = icosphere(1)
    rng = np.random.default_rng(3)
    verts_np = verts_np + rng.normal(scale=1e-3, size=verts_np.shape).astype(
        np.float32)
    f = faces_np.shape[0]
    mv, proj = orbit_cameras(1)
    vc = jnp.asarray(rng.uniform(size=(verts_np.shape[0], 3)).astype(np.float32))
    fo = jnp.asarray(rng.uniform(0.3, 0.9, size=(f,)).astype(np.float32))
    fi = jnp.ones((1, f), jnp.float32)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)

    def loss(v, c, o, cfg):
        col, dep, _ = render(jnp.asarray(v), jnp.asarray(faces_np), c, o, fi,
                             jnp.asarray(mv), jnp.asarray(proj), bg,
                             32, 32, 1.0, cfg)
        return jnp.sum(col * 1.3) + jnp.sum(dep), (col, dep)

    out = {}
    for cull in (False, True):
        cfg = RasterConfig(binning_capacity=2048, interpret=True,
                           exact_tile_cull=cull)
        (l, (col, dep)), g = jax.value_and_grad(
            lambda v: loss(v, vc, fo, cfg), has_aux=True)(jnp.asarray(verts_np))
        out[cull] = (np.asarray(col), np.asarray(dep), np.asarray(g))
    # Dropped slots never blend, but their removal shifts chunk boundaries,
    # so the per-chunk blend reductions reassociate: equality to ulp noise.
    np.testing.assert_allclose(out[False][0], out[True][0],
                               rtol=3e-7, atol=3e-7)
    np.testing.assert_allclose(out[False][1], out[True][1],
                               rtol=3e-7, atol=3e-7)
    # Gradient reduction segments shrink too -- scan pairing reassociates.
    np.testing.assert_allclose(out[False][2], out[True][2],
                               rtol=5e-5, atol=1e-6)


def test_gather_face_corners_fused_matches_direct():
    """The fused corner gather's screen-space columns must equal the direct
    ``verts_image[:, faces]`` gather for every batch-width code path of
    gather_face_corners (one-table b<=3, z-in-table b<=10, chunked b>10)."""
    from dmesh2_renderer_tpu.ops.binning import gather_face_corners

    rng = np.random.default_rng(11)
    p, f = 37, 53
    faces = jnp.asarray(rng.integers(0, p, (f, 3)).astype(np.int32))
    verts = jnp.asarray(rng.normal(size=(p, 3)).astype(np.float32))
    vc = jnp.asarray(rng.uniform(size=(p, 3)).astype(np.float32))
    for b in (2, 6, 12):
        vndc = jnp.asarray(rng.normal(size=(b, p, 3)).astype(np.float32))
        vimg = jnp.asarray(rng.normal(size=(b, p, 2)).astype(np.float32))
        v9a, c9a, za = gather_face_corners(verts, vc, vndc, faces)
        v9b, c9b, zb, fv_img = gather_face_corners(verts, vc, vndc, faces,
                                                   verts_image=vimg)
        np.testing.assert_array_equal(np.asarray(v9a), np.asarray(v9b))
        np.testing.assert_array_equal(np.asarray(c9a), np.asarray(c9b))
        np.testing.assert_array_equal(np.asarray(za), np.asarray(zb))
        np.testing.assert_array_equal(np.asarray(fv_img),
                                      np.asarray(vimg[:, faces]))
