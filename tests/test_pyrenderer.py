"""pyrenderer compat layer vs the clipping oracle and jax.grad."""

import jax
import jax.numpy as jnp
import numpy as np

from dmesh2_renderer_tpu import pyrenderer as pr
from dmesh2_renderer_tpu.aa import tri_box_overlap_area
from dmesh2_renderer_tpu.oracle.aa_oracle import clip_polygon_area


def _random_tris_pixels(n=256, seed=0):
    rng = np.random.default_rng(seed)
    p = rng.uniform(-1.5, 2.5, size=(3, n, 2)).astype(np.float32)
    tris = pr.Triangles(p[0], p[1], p[2])
    pmin = rng.uniform(-0.5, 1.0, size=(n, 2)).astype(np.float32)
    pixs = pr.make_pixels(pmin, pmin + 1.0)
    return tris, pixs


def test_overlap_area_matches_oracle():
    tris, pixs = _random_tris_pixels()
    n = tris.verts.shape[0]
    idx = jnp.arange(n)
    areas = np.asarray(pr.tri_pixel_overlap_area(tris, pixs, idx, idx))
    tv = np.asarray(tris.verts)
    pv = np.asarray(pixs.verts)
    for i in range(n):
        ref = clip_polygon_area(tv[i], pv[i, 0, 0], pv[i, 2, 0],
                                pv[i, 0, 1], pv[i, 2, 1])
        assert abs(areas[i] - ref) < 1e-5, (i, areas[i], ref)


def test_pixels_positional_construction_matches_reference():
    """DMesh++ constructs Pixels positionally: Pixels(pixmin, pixmax)
    (/root/reference/dmesh2_renderer/pyrenderer.py:33-40)."""
    rng = np.random.default_rng(3)
    n = 32
    pmin = rng.uniform(-0.5, 1.0, size=(n, 2)).astype(np.float32)
    pixs = pr.Pixels(pmin, pmin + 1.0)
    # Corner order: (min), (xmax, ymin), (max), (xmin, ymax).
    np.testing.assert_allclose(np.asarray(pixs.verts[:, 0]), pmin)
    np.testing.assert_allclose(np.asarray(pixs.verts[:, 2]), pmin + 1.0)
    np.testing.assert_allclose(
        np.asarray(pixs.verts[:, 1]),
        np.stack([pmin[:, 0] + 1.0, pmin[:, 1]], axis=1),
    )
    np.testing.assert_allclose(np.asarray(pixs.edges.sum(axis=1)), 0.0)

    p = rng.uniform(-1.5, 2.5, size=(3, n, 2)).astype(np.float32)
    tris = pr.Triangles(p[0], p[1], p[2])
    idx = jnp.arange(n)
    areas = np.asarray(pr.tri_pixel_overlap_area(tris, pixs, idx, idx))
    tv = np.asarray(tris.verts)
    for i in range(n):
        ref = clip_polygon_area(tv[i], pmin[i, 0], pmin[i, 0] + 1.0,
                                pmin[i, 1], pmin[i, 1] + 1.0)
        assert abs(areas[i] - ref) < 1e-5, (i, areas[i], ref)


def test_overlap_grad_matches_autodiff():
    tris, pixs = _random_tris_pixels(n=64, seed=1)
    idx = jnp.arange(64)
    g_analytic = np.asarray(pr.tri_pixel_overlap_area_grad(tris, pixs, idx, idx))

    def area_sum(tv):
        pv = pixs.verts
        return jnp.sum(
            tri_box_overlap_area(tv, pv[:, 0, 0], pv[:, 2, 0],
                                 pv[:, 0, 1], pv[:, 2, 1])
        )

    g_auto = np.asarray(jax.grad(area_sum)(tris.verts))
    np.testing.assert_allclose(g_analytic, g_auto, atol=2e-4)
