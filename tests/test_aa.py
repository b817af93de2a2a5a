"""Closed-form AA overlap area + gradient vs independent oracle.

Validation strategy per SURVEY.md section 4: the AA clip is checked against a
slow trusted polygon clipper (Sutherland-Hodgman), against jax.grad of the
closed form (autodiff vs analytic, the reference author's own method,
``pyrenderer.py:66-425``), and against finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmesh2_renderer_tpu.aa import tri_box_overlap_area, tri_box_overlap_area_grad
from dmesh2_renderer_tpu.geometry import order_ccw
from dmesh2_renderer_tpu.oracle.aa_oracle import tri_box_area_oracle, tri_box_grad_fd


def _random_tris(n, rng, scale=3.0, offset=-1.0):
    p = rng.uniform(offset, offset + scale, size=(n, 3, 2)).astype(np.float32)
    p0, p1, p2 = order_ccw(jnp.asarray(p[:, 0]), jnp.asarray(p[:, 1]), jnp.asarray(p[:, 2]))
    return np.stack([np.asarray(p0), np.asarray(p1), np.asarray(p2)], axis=1)


BOX = (0.0, 1.0, 0.0, 1.0)


def test_containment_cases():
    # pixel fully inside a big triangle -> pixel area, zero gradient
    tri = jnp.array([[[-10.0, -10.0], [20.0, -10.0], [0.0, 30.0]]])
    a = tri_box_overlap_area(tri, *BOX)
    np.testing.assert_allclose(np.asarray(a), [1.0], atol=1e-6)
    g = tri_box_overlap_area_grad(tri, *BOX)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)

    # triangle fully inside pixel -> triangle area
    tri2 = jnp.array([[[0.1, 0.1], [0.6, 0.2], [0.3, 0.7]]])
    a2 = tri_box_overlap_area(tri2, *BOX)
    expected = 0.5 * abs((0.6 - 0.1) * (0.7 - 0.1) - (0.3 - 0.1) * (0.2 - 0.1))
    np.testing.assert_allclose(np.asarray(a2), [expected], rtol=1e-5)

    # disjoint -> 0
    tri3 = jnp.array([[[5.0, 5.0], [6.0, 5.0], [5.0, 6.0]]])
    np.testing.assert_allclose(np.asarray(tri_box_overlap_area(tri3, *BOX)), [0.0], atol=1e-7)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_area_vs_oracle_random(seed):
    rng = np.random.default_rng(seed)
    tris = _random_tris(256, rng)
    areas = np.asarray(tri_box_overlap_area(jnp.asarray(tris), *BOX))
    for i in range(tris.shape[0]):
        ref = tri_box_area_oracle(tris[i], *BOX)
        assert abs(areas[i] - ref) < 1e-4, (i, areas[i], ref, tris[i])


def test_area_vs_oracle_pixel_scale():
    # pixel-scale boxes at arbitrary offsets, like real rasterization
    rng = np.random.default_rng(7)
    for _ in range(64):
        x0 = rng.uniform(-50, 50)
        y0 = rng.uniform(-50, 50)
        tri = _random_tris(1, rng, scale=4.0, offset=0.0)[0] + np.array([x0 - 2, y0 - 2])
        a = float(tri_box_overlap_area(jnp.asarray(tri[None]), x0, x0 + 1, y0, y0 + 1)[0])
        ref = tri_box_area_oracle(tri, x0, x0 + 1, y0, y0 + 1)
        assert abs(a - ref) < 5e-4, (a, ref)


def test_grad_analytic_vs_autodiff_and_fd():
    rng = np.random.default_rng(3)
    tris = _random_tris(128, rng)
    tris_j = jnp.asarray(tris)

    g_analytic = np.asarray(tri_box_overlap_area_grad(tris_j, *BOX))
    g_auto = np.asarray(jax.vmap(jax.grad(lambda t: tri_box_overlap_area(t, *BOX)))(tris_j))

    # autodiff of the fp32 closed form is noisy on near-axis edges
    # (catastrophic cancellation); the Reynolds gradient is well-conditioned,
    # so this comparison is loose while the oracle FD comparison is tight.
    np.testing.assert_allclose(g_analytic, g_auto, atol=1e-2)

    # tight check against f64 oracle finite differences
    for i in range(0, 128, 4):
        fd = tri_box_grad_fd(tris[i].astype(np.float64), *BOX)
        if not np.all(np.isfinite(fd)):
            continue
        np.testing.assert_allclose(g_analytic[i], fd, atol=1e-4)


def test_grad_zero_when_disjoint():
    tri = jnp.array([[[5.0, 5.0], [6.0, 5.0], [5.0, 6.0]]])
    g = tri_box_overlap_area_grad(tri, *BOX)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)
