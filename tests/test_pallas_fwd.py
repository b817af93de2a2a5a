"""Pallas forward compositor vs pure-XLA reference (interpret mode on CPU)."""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from dmesh2_renderer_tpu import geometry as G
from dmesh2_renderer_tpu.ops.binning import bin_faces, pack_face_stream
from dmesh2_renderer_tpu.ops.pallas_fwd import composite_forward
from dmesh2_renderer_tpu.ops.reference import face_depth01, render_reference
from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras


@functools.lru_cache(maxsize=2)
def _scene(width=48, height=48, b=2, seed=0):
    verts_np, faces_np = icosphere(1)
    mv, proj = orbit_cameras(b)
    verts, faces = jnp.asarray(verts_np), jnp.asarray(faces_np)
    mvj, projj = jnp.asarray(mv), jnp.asarray(proj)
    ray_o, ray_d = G.init_rays(mvj, projj, width, height)
    verts_ndc, verts_image = G.compute_verts_ndc_image(verts, mvj, projj, width, height)
    tris = G.face_aa_triangles(verts_image, faces)
    rng = np.random.default_rng(seed)
    vc = jnp.asarray(rng.uniform(size=(verts.shape[0], 3)).astype(np.float32))
    fo = jnp.asarray(rng.uniform(0.3, 1.0, size=(faces.shape[0],)).astype(np.float32))
    fi = jnp.asarray(rng.uniform(0.5, 1.0, size=(b, faces.shape[0])).astype(np.float32))
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    pm = jnp.zeros((b, 2), jnp.int32)
    return verts, faces, vc, fo, verts_ndc, fi, tris, bg, pm, ray_o, ray_d


@pytest.mark.parametrize(
    "tau",
    [pytest.param(1.0, marks=pytest.mark.slow), 0.0, 0.5],
)
def test_pallas_forward_matches_reference(tau):
    width = height = 48
    verts, faces, vc, fo, verts_ndc, fi, tris, bg, pm, ray_o, ray_d = _scene()
    ref_color, ref_depth, ref_aux = render_reference(
        verts, faces, vc, fo, verts_ndc, fi, tris.verts, bg, pm, ray_o, ray_d, tau
    )
    depth01, _, _, alive = face_depth01(verts_ndc, faces)
    binning = bin_faces(tris.verts, depth01, alive, pm, width, height,
                        capacity=1024, max_tiles_per_face=64)  # 80 faces x <=4 tiles x B=2
    stream = pack_face_stream(binning.entry_bf, verts, faces, vc, fo, verts_ndc, fi, tris.verts, interpret=True)
    color, depth, ft, pt, _, _nc = composite_forward(
        stream, binning.tile_starts, binning.tile_counts,
        ray_o[:, 0, 0, :], ray_d, bg, pm, width, height, tau,
        chunk=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref_color), atol=5e-6)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref_depth), atol=5e-6)
    np.testing.assert_allclose(np.asarray(ft), np.asarray(ref_aux.final_t), atol=5e-6)
    np.testing.assert_allclose(np.asarray(pt), np.asarray(ref_aux.final_prev_t), atol=5e-6)


def test_fwd_subchunks_match_full_blocks():
    """fwd_subchunks in {2, 4} must reproduce the full-block forward to
    reassociation noise: piece boundaries only re-chunk the prefix-product
    blend; the early exit acts at piece granularity but can only skip faces
    whose per-pixel active mask is already False (T < T_EPS is monotone)."""
    from dmesh2_renderer_tpu.functional import render
    from dmesh2_renderer_tpu.utils.config import RasterConfig
    from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras

    verts_np, faces_np = icosphere(1)
    rng = np.random.default_rng(11)
    verts_np = verts_np + rng.normal(scale=1e-3, size=verts_np.shape).astype(
        np.float32)
    f = faces_np.shape[0]
    mv, proj = orbit_cameras(1)
    args = (jnp.asarray(verts_np), jnp.asarray(faces_np),
            jnp.asarray(rng.uniform(size=(verts_np.shape[0], 3)).astype(np.float32)),
            jnp.asarray(rng.uniform(0.5, 0.95, size=(f,)).astype(np.float32)),
            jnp.ones((1, f), jnp.float32), jnp.asarray(mv), jnp.asarray(proj),
            jnp.asarray([0.1, 0.2, 0.3], jnp.float32))

    out = {}
    for sc in (1, 2, 4):
        cfg = RasterConfig(binning_capacity=2048, interpret=True,
                           fwd_subchunks=sc)
        c, d, aux = render(*args, 32, 32, 1.0, cfg)
        out[sc] = (np.asarray(c), np.asarray(d),
                   int(aux.num_grad_contributing))
    for sc in (2, 4):
        np.testing.assert_allclose(out[sc][0], out[1][0], atol=2e-6)
        np.testing.assert_allclose(out[sc][1], out[1][1], atol=2e-6)
        # nc_tile (and so the contributing count) is chunking-invariant.
        assert out[sc][2] == out[1][2]
