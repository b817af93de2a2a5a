"""API-parity mirror of the reference's ``dmesh2_renderer.pyrenderer``.

DMesh++ imports ``Triangles`` / ``Pixels`` / ``tri_pixel_overlap_area`` from
the reference's pyrenderer module (``pyrenderer.py:6-39, 456-519``); this
module provides the same names and semantics on jnp. Unlike the reference --
a scalar, per-(triangle, pixel) function with python branching and exception
error codes E00-E05 -- these are vectorized over any leading batch shape and
evaluate the closed-form overlap integrals of :mod:`dmesh2_renderer_tpu.aa`
(exact for every configuration; degenerate cases yield subgradients instead
of raising).

Differences (documented):
  * ``tri_pixel_overlap_area`` returns only the area (the reference's second
    return value, the clip-polygon vertex list, exists for debugging and has
    no consumer in the reference renderer).
  * ``use_autograd=True`` differentiates with jax.grad; ``False`` uses the
    analytic shape derivative. Both return identical areas.
"""

from __future__ import annotations

import jax.numpy as jnp

from dmesh2_renderer_tpu.aa import tri_box_overlap_area, tri_box_overlap_area_grad
from dmesh2_renderer_tpu.geometry import (
    Triangles as _TrianglesTuple,
    make_triangles,
    order_ccw,
    tri_area2,
)

EPS = 1e-3


def Triangles(p0, p1, p2) -> _TrianglesTuple:
    """CCW triangle precompute; same fields as the reference class
    (verts, edges, edges_iszero, edges_recip, edges_normal, edges_normal_c)."""
    return make_triangles(jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2))


class Pixels:
    """Axis-aligned pixel boxes, constructed from (pixmin, pixmax) corner
    arrays exactly like the reference class
    (``/root/reference/dmesh2_renderer/pyrenderer.py:33-40``), so DMesh++'s
    positional call ``Pixels(pixmin, pixmax)`` is a drop-in.

    Attributes:
      verts: (..., 4, 2) corners (min), (xmax, ymin), (max), (xmin, ymax)
      edges: (..., 4, 2) CCW edge vectors
    """

    def __init__(self, pixmin, pixmax):
        pixmin = jnp.asarray(pixmin)
        pixmax = jnp.asarray(pixmax)
        p0 = pixmin
        p1 = jnp.stack([pixmax[..., 0], pixmin[..., 1]], axis=-1)
        p2 = pixmax
        p3 = jnp.stack([pixmin[..., 0], pixmax[..., 1]], axis=-1)
        self.verts = jnp.stack([p0, p1, p2, p3], axis=-2)
        self.edges = jnp.stack([p1 - p0, p2 - p1, p3 - p2, p0 - p3], axis=-2)


def make_pixels(pixmin, pixmax) -> Pixels:
    """Alias for :class:`Pixels` (kept for round-1 API compatibility)."""
    return Pixels(pixmin, pixmax)


def tri_pixel_overlap_area(tris: _TrianglesTuple, pixs: Pixels, tid, pid,
                           use_autograd: bool = False):
    """Overlap area of triangle ``tid`` with pixel ``pid``.

    Vectorized: tid/pid may be scalars or index arrays of the same shape.
    Returns the exact area (see module docstring for the contract vs the
    reference, ``pyrenderer.py:456-519``).
    """
    tv = tris.verts[tid]            # (..., 3, 2)
    pv = pixs.verts[pid]            # (..., 4, 2)
    x0, y0 = pv[..., 0, 0], pv[..., 0, 1]
    x1, y1 = pv[..., 2, 0], pv[..., 2, 1]
    del use_autograd  # identical values either way; kept for signature parity
    return tri_box_overlap_area(tv, x0, x1, y0, y1)


def tri_pixel_overlap_area_grad(tris: _TrianglesTuple, pixs: Pixels, tid, pid):
    """d(area)/d(tris.verts[tid]) -- the analytic shape derivative the
    reference accumulates into grad_tri_verts (``aa.h:431-433``)."""
    tv = tris.verts[tid]
    pv = pixs.verts[pid]
    x0, y0 = pv[..., 0, 0], pv[..., 0, 1]
    x1, y1 = pv[..., 2, 0], pv[..., 2, 1]
    return tri_box_overlap_area_grad(tv, x0, x1, y0, y1)


def tri_area(p0, p1, p2):
    """Signed triangle area (reference ``pyrenderer.tri_area``)."""
    return 0.5 * tri_area2(p0, p1, p2)


__all__ = [
    "EPS", "Triangles", "Pixels", "make_pixels", "order_ccw", "tri_area",
    "tri_pixel_overlap_area", "tri_pixel_overlap_area_grad",
]
