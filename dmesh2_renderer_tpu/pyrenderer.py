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
  * The reference is scalar-only; here ``tid``/``pid`` may be index arrays.
    For scalar indices the polygon return types mirror the reference exactly
    (``[]`` / the (4, 2) pixel-corner tensor / a list of (2,) points, same
    vertex order as the reference's edge walk); for array indices the
    polygon comes back as a padded ``(..., MAX_POLY, 2)`` array + count.
  * The area is always the closed-form winding integral
    (:mod:`dmesh2_renderer_tpu.aa`) -- exact for every configuration and
    equal to the reference's fan area up to float rounding.
  * Error codes E00-E05 (``dmesh2_renderer/README.md:1-8``) are graceful by
    default (the closed form has no degenerate states); pass ``strict=True``
    to detect the reference's degenerate configurations eagerly and raise
    the same ``ValueError("[pyrasterizer] Error code NN")``. ``strict``
    requires concrete (non-traced) inputs.
  * ``use_autograd=True`` differentiates with jax.grad; ``False`` uses the
    analytic shape derivative. Both return identical areas.
"""

from __future__ import annotations

import jax
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


# Clip polygon capacity: a triangle clipped by 4 half-planes has <= 7
# vertices; the reference caps at 10 (``aa.h:11`` MAX_NUM_POLYGONS) and its
# walk can transiently emit duplicates, so we keep the same bound.
MAX_POLY = 10

# One emission group per triangle edge: [ip_lo, ip_hi, endpoint, 4 corners].
_SLOTS_PER_EDGE = 7


def _clip_polygon_walk(tv, pv, inside_tri):
    """Vectorized mirror of the reference's per-edge clip walk
    (``/root/reference/dmesh2_renderer/pyrenderer.py:66-205``): same vertex
    emission ORDER, jnp masks instead of python branches.

    Args:
      tv: (..., 3, 2) CCW triangle vertices.
      pv: (..., 4, 2) pixel corners (min, (xmax,ymin), max, (xmin,ymax)).
      inside_tri: (..., 4) bool, corner-inside-triangle flags.
    Returns:
      poly:  (..., MAX_POLY, 2) polygon vertices, padded with zeros
      count: (...,) int32 valid vertex count
      flags: dict of E-code condition masks (each (...,) bool)
    """
    xmin, ymin = pv[..., 0, 0], pv[..., 0, 1]
    xmax, ymax = pv[..., 2, 0], pv[..., 2, 1]

    # Endpoint-inside-pixel uses the reference's CLOSED box test
    # (``pyrenderer.py:56-64``).
    vin = (
        (tv[..., 0] >= xmin[..., None]) & (tv[..., 0] <= xmax[..., None])
        & (tv[..., 1] >= ymin[..., None]) & (tv[..., 1] <= ymax[..., None])
    )                                                           # (..., 3)

    slots, active = [], []
    e00 = e01 = e02 = e03 = jnp.zeros(tv.shape[:-2], bool)
    for ti in range(3):
        p0 = tv[..., ti, :]
        p1 = tv[..., (ti + 1) % 3, :]
        e = p1 - p0
        tri_h = jnp.abs(e[..., 1]) < EPS
        tri_v = jnp.abs(e[..., 0]) < EPS
        p0in = vin[..., ti]
        p1in = vin[..., (ti + 1) % 3]

        ts, ips, valids, corner00 = [], [], [], []
        for pi in range(4):
            pedge_h = pi in (0, 2)
            # Pixel edge pi is the line {axis0 == iaxis0}; the intersection
            # must land within [pmin1, pmax1] along the other axis.
            axis0 = 1 if pedge_h else 0
            axis1 = 1 - axis0
            iaxis0 = pv[..., pi, axis0]
            pmin1 = xmin if pedge_h else ymin
            pmax1 = xmax if pedge_h else ymax
            parallel = (tri_h & pedge_h) | (tri_v & (not pedge_h))
            denom = e[..., axis0]
            t = (iaxis0 - p0[..., axis0]) / jnp.where(
                jnp.abs(denom) > 0, denom, 1.0
            )
            iaxis1 = p0[..., axis1] + t * e[..., axis1]
            valid = (
                (t >= 0) & (t <= 1) & (iaxis1 >= pmin1) & (iaxis1 <= pmax1)
                & ~parallel & (jnp.abs(denom) > 0)
            )
            corner00.append(valid & ((iaxis1 == pmin1) | (iaxis1 == pmax1)))
            ip = jnp.zeros(tv.shape[:-2] + (2,), tv.dtype)
            ip = ip.at[..., axis0].set(iaxis0).at[..., axis1].set(iaxis1)
            ts.append(jnp.where(valid, t, jnp.inf))
            ips.append(ip)
            valids.append(valid)

        tq = jnp.stack(ts, axis=-1)                              # (..., 4)
        vq = jnp.stack(valids, axis=-1)
        ipq = jnp.stack(ips, axis=-2)                            # (..., 4, 2)
        n = vq.sum(axis=-1)
        e00 = e00 | jnp.stack(corner00, -1).any(-1)
        e01 = e01 | (n > 2)
        e02 = e02 | ((n == 1) & ~(p0in ^ p1in))
        e03 = e03 | ((n == 0) & (p0in ^ p1in))

        i_lo = jnp.argmin(tq, axis=-1)
        tq2 = jnp.where(
            jax.nn.one_hot(i_lo, 4, dtype=bool), jnp.inf, tq
        )
        i_hi = jnp.argmin(tq2, axis=-1)

        def pick(idx, arr):
            return jnp.take_along_axis(
                arr, idx[..., None, None], axis=-2
            )[..., 0, :]

        ip_lo = pick(i_lo, ipq)
        ip_hi = pick(i_hi, ipq)

        # Slot A0/A1: intersection points sorted by t (ref walk appends the
        # lower-t point first for n==2; the single point for n==1).
        slots += [ip_lo, ip_hi]
        active += [n >= 1, n >= 2]

        # Slot B: the edge's head endpoint p1 -- emitted when the edge enters
        # the pixel through an intersection (n==1, p0 out, p1 in) or lies
        # fully inside it (n==0, both in).
        slots.append(p1)
        active.append(
            ((n == 1) & ~p0in & p1in) | ((n == 0) & p0in & p1in)
        )

        # Slots C0..C3: pixel corners walked CCW from the corner after the
        # LAST crossed pixel edge, while they stay inside the triangle.
        # Applies when the edge exits the pixel: n==2, or n==1 with p0
        # inside and p1 outside.
        corner_case = (n >= 2) | ((n == 1) & p0in & ~p1in)
        pedge_idx = jnp.arange(4, dtype=jnp.int32)
        last_pedge = jnp.where(
            n >= 2,
            jnp.take_along_axis(
                jnp.broadcast_to(pedge_idx, tq.shape), i_hi[..., None], -1
            )[..., 0],
            jnp.take_along_axis(
                jnp.broadcast_to(pedge_idx, tq.shape), i_lo[..., None], -1
            )[..., 0],
        )
        run = jnp.ones_like(corner_case)
        for k in range(4):
            cid = (last_pedge + 1 + k) % 4
            cin = jnp.take_along_axis(inside_tri, cid[..., None], -1)[..., 0]
            run = run & cin
            slots.append(
                jnp.take_along_axis(pv, cid[..., None, None], axis=-2)[..., 0, :]
            )
            active.append(corner_case & run)

    mask = jnp.stack(active, axis=-1)                           # (..., 21)
    verts = jnp.stack(slots, axis=-2)                           # (..., 21, 2)
    # Stable compaction: active slots first, original order preserved.
    order = jnp.argsort(~mask, axis=-1, stable=True)
    poly = jnp.take_along_axis(
        verts, order[..., :MAX_POLY, None], axis=-2
    )
    count = mask.sum(axis=-1, dtype=jnp.int32)
    keep = jnp.arange(MAX_POLY) < count[..., None]
    poly = jnp.where(keep[..., None], poly, 0.0)
    count = jnp.minimum(count, MAX_POLY)

    # Fan-triangulation diagnostics (ref walk ``pyrenderer.py:190-203``).
    sub = jnp.zeros(count.shape + (MAX_POLY - 2,), tv.dtype)
    for si in range(MAX_POLY - 2):
        a = tri_area(poly[..., 0, :], poly[..., si + 1, :], poly[..., si + 2, :])
        sub = sub.at[..., si].set(jnp.where(si + 2 < count, a, 0.0))
    e04 = (sub < 0).any(axis=-1)
    fan_area = sub.sum(axis=-1)
    pxarea = (xmax - xmin) * (ymax - ymin)
    e05 = fan_area > pxarea

    flags = {"e00": e00, "e01": e01, "e02": e02, "e03": e03,
             "e04": e04, "e05": e05}
    return poly, count, flags


def _raise_ecodes(flags, degenerate_mask):
    for code in ("e00", "e01", "e02", "e03", "e04", "e05"):
        if bool(jnp.any(flags[code] & degenerate_mask)):
            raise ValueError(f"[pyrasterizer] Error code {code[1:]}")


def tri_pixel_overlap_area(tris: _TrianglesTuple, pixs: Pixels, tid, pid,
                           use_autograd: bool = False, strict: bool = False):
    """Overlap area + clip polygon of triangle ``tid`` with pixel ``pid``.

    Mirrors the reference dispatcher (``pyrenderer.py:456-519``): returns
    ``(0.0, [])`` when a triangle edge separates the pixel, ``(pix_area,
    pix_corners)`` when the pixel is fully inside, else the walked clip
    polygon. Vectorized: for array ``tid``/``pid`` the polygon is returned
    padded as ``(poly (..., MAX_POLY, 2), count (...))`` and the fast paths
    are folded in per element (count 0 / 4).

    ``strict=True`` raises the reference's E00-E05 ``ValueError``s on the
    corresponding degenerate configurations (concrete inputs only).
    """
    del use_autograd  # identical values either way; kept for signature parity
    tv = tris.verts[tid]            # (..., 3, 2)
    nrm = tris.edges_normal[tid]    # (..., 3, 2)
    nc = tris.edges_normal_c[tid]   # (..., 3)
    pv = pixs.verts[pid]            # (..., 4, 2)
    x0, y0 = pv[..., 0, 0], pv[..., 0, 1]
    x1, y1 = pv[..., 2, 0], pv[..., 2, 1]

    area = tri_box_overlap_area(tv, x0, x1, y0, y1)

    # corner-vs-edge half-plane table (..., 3 edges, 4 corners)
    side = jnp.einsum("...ek,...ck->...ec", nrm, pv) - nc[..., None]
    corner_in_edge = side >= 0
    reject = (~corner_in_edge).all(axis=-1).any(axis=-1)
    contained = corner_in_edge.all(axis=(-1, -2))
    inside_tri = corner_in_edge.all(axis=-2)                   # (..., 4)

    poly, count, flags = _clip_polygon_walk(tv, pv, inside_tri)
    if strict:
        _raise_ecodes(flags, ~reject & ~contained)

    scalar = jnp.ndim(tid) == 0 and jnp.ndim(pid) == 0
    if scalar:
        if bool(reject):
            return area, []
        if bool(contained):
            return area, pv
        return area, [poly[i] for i in range(int(count))]

    count = jnp.where(reject, 0, count)
    pad = jnp.zeros(pv.shape[:-2] + (MAX_POLY - 4, 2), pv.dtype)
    poly = jnp.where(
        contained[..., None, None], jnp.concatenate([pv, pad], axis=-2), poly
    )
    count = jnp.where(contained, 4, count)
    return area, (poly, count)


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
    "EPS", "MAX_POLY", "Triangles", "Pixels", "make_pixels", "order_ccw",
    "tri_area", "tri_pixel_overlap_area", "tri_pixel_overlap_area_grad",
]
