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


@pytest.mark.parametrize("num_layers", [3, 8])
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
