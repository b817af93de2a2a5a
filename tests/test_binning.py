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


def test_binning_overflow_reported():
    width, height, b = 48, 32, 1
    aa_verts, depth01, alive, _ = _setup(width, height, b)
    pm = jnp.zeros((b, 2), jnp.int32)
    small = bin_faces(aa_verts[:1], depth01[:1], alive[:1], pm, width, height,
                      capacity=16, max_tiles_per_face=2)
    assert int(small.num_truncated) > 0
