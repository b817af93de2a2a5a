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
    areas, _poly = pr.tri_pixel_overlap_area(tris, pixs, idx, idx)
    areas = np.asarray(areas)
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
    areas, _poly = pr.tri_pixel_overlap_area(tris, pixs, idx, idx)
    areas = np.asarray(areas)
    tv = np.asarray(tris.verts)
    for i in range(n):
        ref = clip_polygon_area(tv[i], pmin[i, 0], pmin[i, 0] + 1.0,
                                pmin[i, 1], pmin[i, 1] + 1.0)
        assert abs(areas[i] - ref) < 1e-5, (i, areas[i], ref)


def _shoelace(poly):
    n = len(poly)
    a = 0.0
    for i in range(n):
        px, py = poly[i]
        qx, qy = poly[(i + 1) % n]
        a += px * qy - qx * py
    return 0.5 * a


def test_polygon_return_matches_area():
    """The walked clip polygon's shoelace area equals the closed-form area
    (the reference's second return value, pyrenderer.py:205, 446, 494-498)."""
    tris, pixs = _random_tris_pixels(n=512, seed=7)
    n = tris.verts.shape[0]
    idx = jnp.arange(n)
    areas, (poly, count) = pr.tri_pixel_overlap_area(tris, pixs, idx, idx)
    areas, poly, count = map(np.asarray, (areas, poly, count))
    pv = np.asarray(pixs.verts)
    tv = np.asarray(tris.verts)
    for i in range(n):
        c = int(count[i])
        if c < 3:
            assert areas[i] < 1e-5, (i, areas[i], c)
            continue
        sa = _shoelace(poly[i, :c])
        assert abs(sa - areas[i]) < 1e-4, (i, sa, areas[i], c)
        # every polygon vertex lies in the (slightly inflated) pixel box
        assert (poly[i, :c, 0] >= pv[i, 0, 0] - 1e-4).all()
        assert (poly[i, :c, 0] <= pv[i, 2, 0] + 1e-4).all()


def test_polygon_scalar_fast_paths():
    # Pixel fully inside a big triangle -> (pix_area, pixel corners).
    tris = pr.Triangles(
        np.array([[-10.0, -10.0]], np.float32),
        np.array([[10.0, -10.0]], np.float32),
        np.array([[0.0, 10.0]], np.float32),
    )
    pixs = pr.Pixels(np.array([[0.0, 0.0]], np.float32),
                     np.array([[1.0, 1.0]], np.float32))
    area, poly = pr.tri_pixel_overlap_area(tris, pixs, 0, 0)
    assert abs(float(area) - 1.0) < 1e-6
    np.testing.assert_allclose(np.asarray(poly), np.asarray(pixs.verts[0]))

    # Separated -> (0, []).
    pixs_far = pr.Pixels(np.array([[100.0, 100.0]], np.float32),
                         np.array([[101.0, 101.0]], np.float32))
    area, poly = pr.tri_pixel_overlap_area(tris, pixs_far, 0, 0)
    assert float(area) == 0.0 and poly == []

    # Generic overlap -> list of points, shoelace == area.
    pixs_mid = pr.Pixels(np.array([[9.0, -10.5]], np.float32),
                         np.array([[10.5, -9.0]], np.float32))
    area, poly = pr.tri_pixel_overlap_area(tris, pixs_mid, 0, 0)
    assert len(poly) >= 3
    sa = _shoelace([np.asarray(p) for p in poly])
    assert abs(sa - float(area)) < 1e-5


def test_strict_error_code_e00():
    """An edge crossing exactly through a pixel corner raises E00 in strict
    mode (reference pyrenderer.py:119) and is graceful otherwise."""
    tris = pr.Triangles(
        np.array([[-1.0, -1.0]], np.float32),
        np.array([[3.0, 3.0]], np.float32),
        np.array([[-1.0, 3.0]], np.float32),
    )
    pixs = pr.Pixels(np.array([[0.0, 0.0]], np.float32),
                     np.array([[2.0, 2.0]], np.float32))
    area, _ = pr.tri_pixel_overlap_area(tris, pixs, 0, 0)  # graceful
    assert np.isfinite(float(area))
    try:
        pr.tri_pixel_overlap_area(tris, pixs, 0, 0, strict=True)
    except ValueError as e:
        assert "Error code 00" in str(e)
    else:
        raise AssertionError("strict mode did not raise E00")


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
