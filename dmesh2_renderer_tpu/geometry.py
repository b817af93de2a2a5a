"""Camera / projection / screen-space geometry (pure jnp, fully vmappable).

TPU-native re-expression of the torch preprocessing in the reference:

* ray generation           -> ``dmesh2_renderer/__init__.py:198-237``
* vertex NDC/image coords  -> ``dmesh2_renderer/__init__.py:239-262``
* CCW triangle precompute  -> ``dmesh2_renderer/pyrenderer.py:6-30, 521-535``
* patch ray selection      -> ``dmesh2_renderer/__init__.py:264-302``

Everything here is differentiable jnp so that the screen-space AA gradient
path chains back to world-space vertices exactly as the torch ops do in the
reference (the "second gradient path", ``__init__.py:332-344``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dmesh2_renderer_tpu.utils.config import AA_EPS, RAY_NORM_EPS, W_EPS


def compute_verts_ndc_image(verts, mv, proj, width, height):
    """Project vertices to NDC and image (pixel) coordinates.

    Matches ``Renderer.compute_verts_ndc_image`` (``__init__.py:239-262``):
    homogeneous transform by mv then proj, clamp ``|w| < 1e-4`` away from zero
    (sign-preserving), divide, and map xy from [-1, 1] to pixels.

    Args:
      verts: (P, 3) world-space vertices.
      mv:    (B, 4, 4) model-view matrices.
      proj:  (B, 4, 4) projection matrices.
      width, height: image size in pixels.

    Returns:
      verts_ndc:   (B, P, 3)
      verts_image: (B, P, 2) pixel coordinates.
    """
    # Precision.HIGHEST on all camera einsums: TPU's default matmul precision
    # (bf16 passes) perturbs NDC coordinates enough to flip per-face culling
    # and tile-binning decisions vs CPU/CUDA.
    verts_hom = jnp.concatenate([verts, jnp.ones_like(verts[:, :1])], axis=-1)
    verts_view = jnp.einsum("pj,bij->bpi", verts_hom, mv,
                           precision=jax.lax.Precision.HIGHEST)
    verts_proj = jnp.einsum("bpj,bij->bpi", verts_view, proj,
                           precision=jax.lax.Precision.HIGHEST)
    w = verts_proj[..., 3:4]
    # Sign-preserving clamp of w into (-inf,-eps] U [eps, inf). w == 0 maps to
    # +eps, mirroring the reference where the torch mask `w>=0 & w<eps -> eps`
    # catches w == 0 (__init__.py:254).
    w = jnp.where((w >= 0.0) & (w < W_EPS), W_EPS, w)
    w = jnp.where((w < 0.0) & (w > -W_EPS), -W_EPS, w)
    verts_ndc = verts_proj[..., :3] / w
    scale = jnp.array([width, height], dtype=verts_ndc.dtype)
    verts_image = (verts_ndc[..., :2] + 1.0) * 0.5 * scale
    return verts_ndc, verts_image


def init_rays(mv, proj, width, height, origin=None, shape=None):
    """Per-pixel world-space camera rays for a batch of cameras.

    Matches ``Renderer._init_rays`` (``__init__.py:198-237``): ray origins are
    the camera positions (``inv(mv)[:, :3, 3]``); directions go through pixel
    centers (+0.5) unprojected from NDC at the near plane (z = -1), normalized
    with a +1e-6 length epsilon.

    ``origin=(x0, y0)`` / ``shape=(ph, pw)`` restrict the pixel grid to one
    window of the full (width, height) frame shared by all B views -- the
    form spatial pixel sharding needs (parallel/patch_parallel.py), where the
    window origin is a TRACED value (`lax.axis_index` of the pixel axis) but
    the window shape is static. Per-view windows stay on the precompute +
    gather path (``select_rays``) the class API uses.

    Returns:
      ray_o: (B, ph, pw, 3)
      ray_d: (B, ph, pw, 3) unit directions.
    """
    b = mv.shape[0]
    ph, pw = shape if shape is not None else (height, width)
    x0, y0 = origin if origin is not None else (0, 0)
    inv_mv = jnp.linalg.inv(mv)
    inv_proj = jnp.linalg.inv(proj)

    ray_o = jnp.broadcast_to(inv_mv[:, :3, 3][:, None, None, :], (b, ph, pw, 3))

    px = (x0 + jnp.arange(pw, dtype=mv.dtype) + 0.5) / width * 2.0 - 1.0
    py = (y0 + jnp.arange(ph, dtype=mv.dtype) + 0.5) / height * 2.0 - 1.0
    pix_ndc = jnp.stack(
        jnp.meshgrid(px, py, indexing="xy") , axis=-1
    )  # (ph, pw, 2)
    ones = jnp.ones((ph, pw, 1), dtype=mv.dtype)
    # NDC point on the near plane: z = -1, w = 1 (__init__.py:225-226).
    pix_ndc_h = jnp.concatenate([pix_ndc, -ones, ones], axis=-1)  # (H, W, 4)
    pix_view = jnp.einsum("hwj,bij->bhwi", pix_ndc_h, inv_proj,
                         precision=jax.lax.Precision.HIGHEST)
    # Perspective division before leaving clip space. DELIBERATE PARITY
    # DEVIATION (reference-bug fix): the reference applies inv_mv to the
    # UNDIVIDED point (__init__.py:228-233), so whenever the unprojected
    # w != 1 its ray directions are w-dependently skewed (for |w| == 1 the
    # skew reduces to a sign flip, under which Moller-Trumbore barycentrics
    # are invariant -- but the hit parameter t changes sign, breaking any
    # t >= 0 logic such as the peel). With the division, rays are
    # geometrically correct for every projection; rendered output can differ
    # from the reference for projections whose unprojected |w| != 1.
    pix_view = pix_view / pix_view[..., 3:4]
    pix_world = jnp.einsum("bhwj,bij->bhwi", pix_view, inv_mv,
                          precision=jax.lax.Precision.HIGHEST)[..., :3]

    ray_d = pix_world - ray_o
    ray_len = jnp.linalg.norm(ray_d, axis=-1, keepdims=True) + RAY_NORM_EPS
    return ray_o, ray_d / ray_len


def select_rays(ray_o, ray_d, batch_idx, patch_min, patch_width, patch_height):
    """Slice per-view patch windows out of full-frame ray maps.

    Matches ``Renderer.select_rays`` (``__init__.py:264-302``): every view in
    the call may render a different ``patch_min + (pw, ph)`` window.

    Args:
      ray_o, ray_d: (Bc, H, W, 3) full-frame rays for the *cameras* used.
      batch_idx: (B,) int indices into the camera axis.
      patch_min: (B, 2) int (x, y) patch origins.
      patch_width, patch_height: static python ints.

    Returns: (B, ph, pw, 3) sliced ray_o / ray_d.
    """
    gy = jnp.arange(patch_height)[None, :, None]
    gx = jnp.arange(patch_width)[None, None, :]
    y = patch_min[:, 1][:, None, None] + gy  # (B, ph, pw)
    x = patch_min[:, 0][:, None, None] + gx
    bi = batch_idx[:, None, None]
    return ray_o[bi, y, x], ray_d[bi, y, x]


class Triangles(NamedTuple):
    """Screen-space triangle precompute (CCW ordered).

    TPU counterpart of ``pyrenderer.Triangles`` (``pyrenderer.py:6-30``). The
    closed-form AA coverage (see ``aa.py``) only needs the ordered vertices
    and the bounding box, but edge normals etc. are kept for the oracle and
    for API parity with the reference's AA tensor set
    (``__init__.py:339-344``).
    """

    verts: jnp.ndarray          # (..., 3, 2) CCW ordered
    edges: jnp.ndarray          # (..., 3, 2) p1-p0, p2-p1, p0-p2
    edges_iszero: jnp.ndarray   # (..., 3, 2) bool, |edge component| < 1e-3
    edges_recip: jnp.ndarray    # (..., 3, 2) 1/edge (inf where zero)
    edges_normal: jnp.ndarray   # (..., 3, 2) inward edge normals
    edges_normal_c: jnp.ndarray  # (..., 3) plane offsets


def tri_area2(p0, p1, p2):
    """Twice the signed area (positive for CCW). ``pyrenderer.py:531-535``."""
    return (p1[..., 0] - p0[..., 0]) * (p2[..., 1] - p0[..., 1]) - (
        p2[..., 0] - p0[..., 0]
    ) * (p1[..., 1] - p0[..., 1])


def order_ccw(p0, p1, p2):
    """Swap p1/p2 where the signed area is negative (``pyrenderer.py:521-529``).

    Differentiable through jnp.where; the swap decision itself is
    piecewise-constant, exactly as in the torch reference.
    """
    neg = (tri_area2(p0, p1, p2) < 0.0)[..., None]
    q1 = jnp.where(neg, p2, p1)
    q2 = jnp.where(neg, p1, p2)
    return p0, q1, q2


def make_triangles(p0, p1, p2) -> Triangles:
    """Build the CCW triangle precompute (``pyrenderer.py:6-30``)."""
    p0, p1, p2 = order_ccw(p0, p1, p2)
    verts = jnp.stack([p0, p1, p2], axis=-2)
    edges = jnp.stack([p1 - p0, p2 - p1, p0 - p2], axis=-2)
    edges_iszero = jnp.abs(edges) < AA_EPS
    edges_recip = 1.0 / edges

    def normal_of(e, p):
        # rotate edge by +90deg: (ex, ey) -> (-ey, ex); inward for CCW.
        n = jnp.stack([-e[..., 1], e[..., 0]], axis=-1)
        c = jnp.sum(n * p, axis=-1)
        return n, c

    n0, c0 = normal_of(p1 - p0, p0)
    n1, c1 = normal_of(p2 - p1, p1)
    n2, c2 = normal_of(p0 - p2, p2)
    edges_normal = jnp.stack([n0, n1, n2], axis=-2)
    edges_normal_c = jnp.stack([c0, c1, c2], axis=-1)
    return Triangles(verts, edges, edges_iszero, edges_recip, edges_normal, edges_normal_c)


def face_aa_triangles(verts_image, faces) -> Triangles:
    """Per-(batch, face) screen-space triangle precompute.

    Matches the gather + ``Triangles`` construction in ``__init__.py:335-344``.

    Args:
      verts_image: (B, P, 2)
      faces: (F, 3) int
    Returns: Triangles with leading shape (B, F).
    """
    fv = verts_image[:, faces]  # (B, F, 3, 2)
    return make_triangles(fv[..., 0, :], fv[..., 1, :], fv[..., 2, :])


def _face_aa_verts_impl(verts_image, faces):
    fv = verts_image[:, faces]                       # (B, F, 3, 2)
    p0, p1, p2 = fv[..., 0, :], fv[..., 1, :], fv[..., 2, :]
    neg = tri_area2(p0, p1, p2) < 0.0                # (B, F)
    q1 = jnp.where(neg[..., None], p2, p1)
    q2 = jnp.where(neg[..., None], p1, p2)
    return jnp.stack([p0, q1, q2], axis=-2), neg


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def face_aa_verts_ccw(verts_image, faces, max_vertex_valence: int = 256,
                      vtable=None):
    """CCW screen-space AA triangles (B, F, 3, 2) -- the rasterizer input.

    Value-identical to ``face_aa_triangles(verts_image, faces).verts``, but
    with a hand-written backward: the corner-gather's natural VJP is an XLA
    scatter-add over (B, P, 2), which costs ~140 ms at 1M faces on a v5e --
    an order of magnitude more than the sort + segmented-scan face->vertex
    reduction used here (the same machinery as ops/pallas_bwd
    scatter_entry_grads). ``max_vertex_valence`` bounds the segmented-scan
    depth: a vertex with more incident faces than this gets a TRUNCATED
    gradient sum -- pass ``RasterConfig.max_vertex_valence`` so one knob
    governs every valence-bounded reduction (callers with concrete ``faces``
    can verify via ``utils.validate.check_vertex_valence``).

    ``vtable`` (optional): the host-precomputed (V, maxval) valence table
    from ``utils.segments.static_vertex_table(faces, P)``; when given, the
    backward's 3F-row runtime sort + scan + tails become a fixed table
    gather + dense sum (RasterConfig.vertex_sort_mode="static"), exact for
    any valence.
    """
    return _face_aa_verts_impl(verts_image, faces)[0]


def _face_aa_verts_fwd(verts_image, faces, max_vertex_valence: int = 256,
                       vtable=None):
    out, neg = _face_aa_verts_impl(verts_image, faces)
    return out, (neg, faces, verts_image.shape[1], vtable)


def aa_cotangent_to_verts_image(g, neg, faces, num_verts, max_vertex_valence,
                                vtable=None):
    """Reduce an AA-corner cotangent (B, F, 3, 2) onto d verts_image (B, P, 2).

    The shared backward of the screen-space AA corner gather: un-swap the
    CCW reorder (``neg`` is the swap mask from the forward), then run the
    valence-bounded sort + segmented-scan face->vertex reduction (the TPU
    replacement for the reference's torch scatter-add on this path,
    ``__init__.py:332-344``). Used by both :func:`face_aa_verts_ccw`'s VJP
    (RasterConfig.prep_mode="split") and the rasterize op's fused-prep
    backward (prep_mode="fused", ops/rasterize.py).
    """
    from dmesh2_renderer_tpu.utils.segments import (
        segment_tails,
        segmented_prefix_sum,
        sort_rows_by_key,
        vertex_table_reduce,
    )

    b, f = neg.shape
    # Un-swap the cotangent (the CCW reorder is its own inverse).
    g0 = g[..., 0, :]
    g1 = jnp.where(neg[..., None], g[..., 2, :], g[..., 1, :])
    g2 = jnp.where(neg[..., None], g[..., 1, :], g[..., 2, :])
    contrib = jnp.concatenate(
        [gk.transpose(1, 0, 2).reshape(f, 2 * b) for gk in (g0, g1, g2)],
        axis=0,
    )                                                 # (3F, 2B)
    if vtable is not None:
        # Static topology (utils/segments.static_vertex_table): one fixed
        # valence-table gather + dense sum instead of sort + scan + tails.
        pieces = ([contrib] if 2 * b <= 15 else
                  [contrib[:, s:s + 15] for s in range(0, 2 * b, 15)])
        d_img = vertex_table_reduce(pieces, vtable, num_verts)
    else:
        vids = jnp.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
        sv, contrib_pieces = sort_rows_by_key(
            vids, [contrib[:, i] for i in range(2 * b)]
        )
        accs = [segmented_prefix_sum(cp, sv, min(3 * f, max_vertex_valence))
                for cp in contrib_pieces]
        d_img = segment_tails(accs, sv, num_verts)    # (P, 2B)
    return d_img.reshape(num_verts, b, 2).transpose(1, 0, 2)


def _face_aa_verts_bwd(max_vertex_valence, res, g):
    neg, faces, p, vtable = res
    d_img = aa_cotangent_to_verts_image(g, neg, faces, p, max_vertex_valence,
                                        vtable)
    return d_img, None, None


face_aa_verts_ccw.defvjp(_face_aa_verts_fwd, _face_aa_verts_bwd)


def ray_tri_intersection(ray_o, ray_d, p0, p1, p2):
    """Moeller-Trumbore, unclamped (t, u, v) + validity.

    Matches ``auxiliary.h:212-243``: valid is False only when the determinant
    is exactly zero; (u, v) are *not* required to lie inside the triangle.

    All args broadcast; the last axis is 3.
    Returns: t, u, v, valid (bool).
    """
    t0 = ray_o - p0
    e1 = p1 - p0
    e2 = p2 - p0
    pvec = jnp.cross(ray_d, e2)
    qvec = jnp.cross(t0, e1)
    denom = jnp.sum(pvec * e1, axis=-1)
    valid = denom != 0.0
    inv = 1.0 / jnp.where(valid, denom, 1.0)
    t = jnp.sum(qvec * e2, axis=-1) * inv
    u = jnp.sum(pvec * t0, axis=-1) * inv
    v = jnp.sum(qvec * ray_d, axis=-1) * inv
    return t, u, v, valid


def clamp_bary_uv(u, v):
    """Clamp (u, v) barycentrics to the triangle; 7-region code.

    Matches ``auxiliary.h:292-329``. Returns (u_c, v_c, code) with code 0 when
    (u, v) is already inside (used for the hard-coverage term).
    """
    inside = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    c1 = (u <= 0.0) & (v <= 0.0)
    c2 = ((u >= 1.0) & (v <= 0.0)) | ((v >= 0.0) & (v <= u - 1.0))
    c3 = ((u <= 0.0) & (v >= 1.0)) | ((u >= 0.0) & (v >= u + 1.0))
    c4 = (u <= 0.0) & (v <= 1.0) & (v >= 0.0)
    c5 = (u <= 1.0) & (u >= 0.0) & (v <= 0.0)
    # diagonal projection region (code 6)
    ud = (1.0 + u - v) * 0.5
    vd = (1.0 - u + v) * 0.5

    code = jnp.where(
        inside, 0,
        jnp.where(c1, 1, jnp.where(c2, 2, jnp.where(c3, 3, jnp.where(c4, 4, jnp.where(c5, 5, 6))))),
    )
    # Nested wheres (not jnp.select): select lowers through argmax, which
    # Mosaic cannot lower inside Pallas kernels.
    zero = jnp.zeros_like(u)
    one = jnp.ones_like(u)
    u_c = jnp.where(
        code == 0, u,
        jnp.where(code == 1, zero,
                  jnp.where(code == 2, one,
                            jnp.where(code == 3, zero,
                                      jnp.where(code == 4, zero,
                                                jnp.where(code == 5, u, ud))))),
    )
    v_c = jnp.where(
        code == 0, v,
        jnp.where(code == 1, zero,
                  jnp.where(code == 2, zero,
                            jnp.where(code == 3, one,
                                      jnp.where(code == 4, v,
                                                jnp.where(code == 5, zero, vd))))),
    )
    return u_c, v_c, code


def clamp_bary_uv_grad(code, dtype=jnp.float32):
    """Piecewise-constant Jacobian of the barycentric clamp.

    Matches ``auxiliary.h:331-357``. Returns (duc_du, duc_dv, dvc_du, dvc_dv).
    """
    one = jnp.ones_like(code, dtype=dtype)
    zero = jnp.zeros_like(code, dtype=dtype)
    half = 0.5 * one
    duc_du = jnp.where(
        code == 0, one,
        jnp.where(code == 4, zero,
                  jnp.where(code == 5, one, jnp.where(code == 6, half, zero))),
    )
    dvc_dv = jnp.where(
        code == 0, one,
        jnp.where(code == 4, one,
                  jnp.where(code == 5, zero, jnp.where(code == 6, half, zero))),
    )
    duc_dv = jnp.where(code == 6, -half, zero)
    dvc_du = jnp.where(code == 6, -half, zero)
    return duc_du, duc_dv, dvc_du, dvc_dv


def ray_tri_intersection_uv_grad(ray_o, ray_d, p0, p1, p2):
    """Analytic Jacobians d(u,v)/d(p0,p1,p2) of Moeller-Trumbore.

    Counterpart of ``auxiliary.h:245-290`` -- with a fix: the reference's
    "dv" block actually differentiates tuv.x (the ray parameter t; it uses
    the t-numerator ``dot(cross(T,E1), E2)`` and its partials), so the CUDA
    renderer's v-channel vertex gradients are not the derivative of the v it
    interpolates with. We derive dv from v = dot(cross(T,E1), d) / denom
    directly; both channels here are validated against jax.grad of
    :func:`ray_tri_intersection`.

    Returns 6 arrays (..., 3): du/dp0, du/dp1, du/dp2, dv/dp0, dv/dp1, dv/dp2.
    """
    t0 = ray_o - p0
    e1 = p1 - p0
    e2 = p2 - p0

    rxe2 = jnp.cross(ray_d, e2)                       # P = cross(d, E2)
    denom_sqrt = jnp.sum(rxe2 * e1, axis=-1, keepdims=True)
    denom = denom_sqrt * denom_sqrt
    denom_inv = 1.0 / jnp.where(denom == 0.0, 1.0, denom)

    u_num = jnp.sum(rxe2 * t0, axis=-1, keepdims=True)
    v1 = denom_sqrt
    qvec = jnp.cross(t0, e1)                          # Q = cross(T, E1)
    v_num = jnp.sum(qvec * ray_d, axis=-1, keepdims=True)
    e1xd = jnp.cross(e1, ray_d)

    # u = u_num / v1;  d(u_num)/dE1 = 0, d(v1)/dE1 = rxe2,
    # d(u_num)/dE2 = cross(T, d), d(v1)/dE2 = cross(E1, d), d(u_num)/dT = rxe2
    du_de1 = (-rxe2 * u_num) * denom_inv
    du_de2 = (jnp.cross(t0, ray_d) * v1 - u_num * e1xd) * denom_inv
    du_dt = (rxe2 * v1) * denom_inv

    # v = v_num / v1;  d(v_num)/dE1 = cross(d, T), d(v_num)/dE2 = 0,
    # d(v_num)/dT = cross(E1, d)
    dv_de1 = (jnp.cross(ray_d, t0) * v1 - v_num * rxe2) * denom_inv
    dv_de2 = (-v_num * e1xd) * denom_inv
    dv_dt = e1xd * v1 * denom_inv

    du_dp0 = -du_de1 - du_de2 - du_dt
    dv_dp0 = -dv_de1 - dv_de2 - dv_dt
    return du_dp0, du_de1, du_de2, dv_dp0, dv_de1, dv_de2
