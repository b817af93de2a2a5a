"""Pure-XLA reference compositor (executable spec; slow, obviously correct).

This renders with *exactly* the blending semantics of the CUDA forward
compositing kernel (``cuda_impl/forward.cu:139-432``), but with no tile
binning: every face is tested against every pixel, in global mean-depth
order, one face per ``lax.scan`` step. It exists to

  * pin down the specification the Pallas kernels must match,
  * provide golden gradients via plain ``jax.grad`` (JAX AD through this
    function differentiates the same math the reference's hand-written
    backward kernel implements, ``cuda_impl/backward.cu:17-532``),
  * serve as the small-scene fallback path.

Semantics mirrored (see SURVEY.md section 2, invariant checklist):
  * ordering by per-face mean NDC z mapped to [0, 1]  (forward.cu:62-68, 96-98)
  * z-culling of faces with max_z < -1 or min_z > 1   (forward.cu:71-72)
  * AA box = unit pixel square at integer image coords (forward.cu:319-323)
  * skip if (tau > 0) and overlap area == 0            (forward.cu:337-338)
  * Moller-Trumbore + 7-region barycentric clamp       (forward.cu:360-372)
  * alpha = opacity * ((1-tau)*inside + tau*oarea)     (forward.cu:375-398)
  * front-to-back blending, early stop at T < 1e-4     (forward.cu:402-415)
  * background composited with bg-depth 1.0            (forward.cu:427-428)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dmesh2_renderer_tpu.aa import tri_box_overlap_area
from dmesh2_renderer_tpu.geometry import clamp_bary_uv, ray_tri_intersection
from dmesh2_renderer_tpu.utils.config import T_EPS


class RenderAux(NamedTuple):
    final_t: jnp.ndarray        # (B, H, W)
    final_prev_t: jnp.ndarray   # (B, H, W)
    n_contrib: jnp.ndarray      # (B, H, W) int32


def face_depth01_from_z(z):
    """Per-(batch, face) mean/min/max NDC z mapped to [0,1], and cull mask.

    Matches ``preprocessFaceCUDA`` (forward.cu:42-107), from pre-gathered
    corner depths ``z`` of shape (B, F, 3). Returns (depth, min_depth,
    max_depth, alive) each of shape (B, F).
    """
    mean_z = z.mean(axis=-1)
    min_z = z.min(axis=-1)
    max_z = z.max(axis=-1)
    alive = (max_z >= -1.0) & (min_z <= 1.0)
    to01 = lambda d: jnp.clip((d + 1.0) * 0.5, 0.0, 1.0)
    return to01(mean_z), to01(min_z), to01(max_z), alive


def face_depth01(verts_ndc, faces):
    """:func:`face_depth01_from_z` with the corner gather included."""
    return face_depth01_from_z(verts_ndc[:, faces, 2])


def render_reference(
    verts,            # (P, 3)
    faces,            # (F, 3) int32
    verts_color,      # (P, 3)
    faces_opacity,    # (F,)
    verts_ndc,        # (B, P, 3)
    faces_intense,    # (B, F)
    aa_face_verts,    # (B, F, 3, 2) CCW screen-space triangles
    background,       # (3,)
    patch_min,        # (B, 2) int32
    ray_o,            # (B, H, W, 3)
    ray_d,            # (B, H, W, 3)
    aa_temperature: float,
):
    """Returns (color (B,H,W,3), raw depth (B,H,W), RenderAux)."""
    b, h, w, _ = ray_d.shape
    f = faces.shape[0]

    depth01, _, _, alive = face_depth01(verts_ndc, faces)        # (B, F)
    # Dead faces sort to the end and are masked out of blending.
    sort_key = jnp.where(alive, depth01, jnp.inf)
    order = jnp.argsort(sort_key, axis=-1, stable=True)          # (B, F)

    # Per-face gathered data, pre-sorted along the face axis per batch.
    fv = verts[faces]                                            # (F, 3, 3)
    fc = verts_color[faces]                                      # (F, 3, 3)
    fz = verts_ndc[:, faces, 2]                                  # (B, F, 3)

    def gather_b(order_b, fz_b, intense_b, aa_b, alive_b):
        return (
            fv[order_b],
            fc[order_b],
            fz_b[order_b],
            faces_opacity[order_b],
            intense_b[order_b],
            aa_b[order_b],
            alive_b[order_b],
        )

    s_fv, s_fc, s_fz, s_op, s_in, s_aa, s_alive = jax.vmap(gather_b)(
        order, fz, faces_intense, aa_face_verts, alive
    )

    # Pixel AA boxes in image coordinates (forward.cu:319-323).
    px = patch_min[:, 0][:, None, None] + jnp.arange(w)[None, None, :]
    py = patch_min[:, 1][:, None, None] + jnp.arange(h)[None, :, None]
    pxmin = jnp.broadcast_to(px, (b, h, w)).astype(ray_d.dtype)
    pymin = jnp.broadcast_to(py, (b, h, w)).astype(ray_d.dtype)

    aa_on = aa_temperature > 0.0

    def step(carry, xs):
        c_rgb, c_d, t, pt, last_contrib, contrib = carry
        p3, col3, z3, op, intense, aa6, ok = xs
        contrib = contrib + 1

        # AA overlap area for every pixel vs this face.
        if aa_on:
            oarea = tri_box_overlap_area(
                aa6[:, None, None], pxmin, pxmin + 1.0, pymin, pymin + 1.0
            )  # (B, H, W)
            aa_skip = oarea <= 0.0
        else:
            oarea = jnp.zeros((b, h, w), dtype=ray_d.dtype)
            aa_skip = jnp.zeros((b, h, w), dtype=bool)

        # Per-pixel face-bbox rejection. The CUDA reference prunes faces at
        # tile granularity (binning, renderer.cu:452-464) plus a per-pixel
        # bbox reject inside the AA clip (aa.h:476). We apply the bbox test
        # per pixel in all code paths: it never rejects a true contribution
        # (coverage > 0 or an in-frustum hit implies bbox overlap) and prunes
        # the backward-ray (t < 0) phantom hits that Moller-Trumbore admits
        # (the reference never checks tuv.x in this kernel, forward.cu:360).
        txmin = aa6[..., 0].min(axis=-1)[:, None, None]
        txmax = aa6[..., 0].max(axis=-1)[:, None, None]
        tymin = aa6[..., 1].min(axis=-1)[:, None, None]
        tymax = aa6[..., 1].max(axis=-1)[:, None, None]
        bbox_ok = (
            (pxmin + 1.0 >= txmin) & (pxmin <= txmax)
            & (pymin + 1.0 >= tymin) & (pymin <= tymax)
        )

        ti, u, v, mt_ok = ray_tri_intersection(
            ray_o, ray_d,
            p3[:, None, None, 0], p3[:, None, None, 1], p3[:, None, None, 2],
        )
        del ti
        uc, vc, code = clamp_bary_uv(u, v)
        inside = (code == 0).astype(ray_d.dtype)
        ratio = (1.0 - aa_temperature) * inside + aa_temperature * oarea

        i0 = 1.0 - uc - vc
        i_c = (
            i0[..., None] * col3[:, None, None, 0]
            + uc[..., None] * col3[:, None, None, 1]
            + vc[..., None] * col3[:, None, None, 2]
        ) * intense[:, None, None, None]
        i_d = i0 * z3[:, None, None, 0] + uc * z3[:, None, None, 1] + vc * z3[:, None, None, 2]

        alpha = op[:, None, None] * ratio
        blend = (
            ok[:, None, None]
            & mt_ok
            & bbox_ok
            & (ratio != 0.0)
            & ~aa_skip
            & (t >= T_EPS)
        )
        alpha = jnp.where(blend, alpha, 0.0)

        c_rgb = c_rgb + i_c * (alpha * t)[..., None]
        c_d = c_d + i_d * alpha * t
        pt = jnp.where(blend, t, pt)
        t = t * (1.0 - alpha)
        last_contrib = jnp.where(blend, contrib, last_contrib)
        return (c_rgb, c_d, t, pt, last_contrib, contrib), None

    init = (
        jnp.zeros((b, h, w, 3), dtype=ray_d.dtype),
        jnp.zeros((b, h, w), dtype=ray_d.dtype),
        jnp.ones((b, h, w), dtype=ray_d.dtype),
        jnp.ones((b, h, w), dtype=ray_d.dtype),
        jnp.zeros((b, h, w), dtype=jnp.int32),
        jnp.zeros((), dtype=jnp.int32),
    )
    # scan over faces: xs leading axis = F
    xs = (
        jnp.swapaxes(s_fv, 0, 1),   # (F, B, 3, 3)
        jnp.swapaxes(s_fc, 0, 1),
        jnp.swapaxes(s_fz, 0, 1),
        jnp.swapaxes(s_op, 0, 1),
        jnp.swapaxes(s_in, 0, 1),
        jnp.swapaxes(s_aa, 0, 1),
        jnp.swapaxes(s_alive, 0, 1),
    )
    (c_rgb, c_d, t, pt, last_contrib, _), _ = jax.lax.scan(step, init, xs)

    color = c_rgb + t[..., None] * background[None, None, None, :]
    depth = c_d + t * 1.0
    return color, depth, RenderAux(t, pt, last_contrib)
