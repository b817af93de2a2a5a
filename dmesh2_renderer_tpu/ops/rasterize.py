"""The differentiable rasterization op: binning + Pallas kernels + custom_vjp.

This is the TPU equivalent of the reference's autograd boundary
(``RenderFunction``, ``dmesh2_renderer/__init__.py:11-177``): a
``jax.custom_vjp`` around the full rasterize step whose backward runs the
analytic gradient kernel and a deterministic segment-sum scatter.

Differences from the reference boundary, by design:

  * No oarea ring buffer ("aa_grad_buffer_size"): the closed-form AA
    clip is cheap enough to rematerialize, so backward always recomputes it
    -- equivalent to the reference's buffer-overflow path
    (backward.cu:276-284) being taken for every face, with bitwise-identical
    results and no (B, H, W, K, 3, 2) residual tensor.
  * Residuals are the sorted entry list + per-pixel (final_T, prev_T) --
    the analogue of ctx.save_for_backward (__init__.py:85-116) minus the
    raw byte arenas, which static shapes make unnecessary.
  * Binning overflow is reported (num_rendered vs capacity) instead of
    silently resized; callers pick capacity (see utils/config.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dmesh2_renderer_tpu.ops import reference as ref_ops
from dmesh2_renderer_tpu.ops.binning import (
    bin_faces,
    build_face_table_from_corners,
    contributing_mask,
    gather_face_corners,
    gather_stream,
)
from dmesh2_renderer_tpu.ops.pallas_bwd import composite_backward, scatter_entry_grads
from dmesh2_renderer_tpu.ops.pallas_fwd import composite_forward
from dmesh2_renderer_tpu.utils.config import TILE_X, TILE_Y, RasterConfig


class RasterAux(NamedTuple):
    num_rendered: jnp.ndarray   # () int32: true duplicated-instance count
    num_truncated: jnp.ndarray  # () int32: entries dropped by capacity/Kt
    # () int32: entries inside some tile's contributing prefix -- what
    # RasterConfig.grad_compact_capacity must cover for lossless backward
    # compaction. Reported from the FORWARD pass because the axon TPU
    # runtime supports no host callbacks (jax.debug.print) to warn from the
    # backward; Renderer.forward checks it against the config and warns.
    num_grad_contributing: jnp.ndarray


@functools.lru_cache(maxsize=32)
def make_rasterizer(patch_width: int, patch_height: int, aa_temperature: float,
                    config: RasterConfig):
    """Build the jit-compatible custom_vjp rasterize op for a static config.

    The returned function has signature

        rasterize(verts, verts_color, faces_opacity, verts_ndc,
                  faces_intense, aa_face_verts,
                  faces, background, patch_min, ray_o_cam, ray_d,
                  vtable=None)
        -> (color, depth_raw, final_t, RasterAux)

    with gradients defined for the first six arguments, matching the six
    kernel gradients of the reference (render.cu:313-318, 372). ``final_t``
    (the per-pixel exit transmittance) is a differentiable output beyond the
    reference's surface: it is what makes depth-slab face-parallel
    compositing possible (parallel/face_parallel.py), and its cotangent
    rides the backward kernel's existing -T/(1-a) background-term path.

    ``vtable`` (optional) is the host-precomputed (V, maxval) valence table
    from ``utils.segments.static_vertex_table(faces, P)``; when given, the
    backward's face->vertex reductions collapse to a fixed table gather +
    dense sum instead of a 3F-row sort + segmented scan + tails
    (RasterConfig.vertex_sort_mode="static").

    With ``config.prep_mode == "fused"``, callers pass ``aa_face_verts=None``
    and the raw projected vertices ``verts_image`` (B, P, 2) instead: the AA
    corner columns ride the pipeline's one consolidated corner gather
    (binning.gather_face_corners) and the CCW reorder happens inside, saving
    a whole 3F-row gather per step vs geometry.face_aa_verts_ccw. The
    gradient then flows to ``verts_image`` (same valence-bounded reduction,
    geometry.aa_cotangent_to_verts_image); values and gradients are
    identical to the split path by construction.
    """
    tau = float(aa_temperature)
    fused_prep = config.prep_mode == "fused"

    def _pipeline(verts, verts_color, faces_opacity, verts_ndc, faces_intense,
                  aa_face_verts, faces, patch_min, verts_image):
        # One consolidated corner gather feeds both the depth preprocessing
        # and the record table (binning.gather_face_corners docstring).
        if fused_prep:
            from dmesh2_renderer_tpu.geometry import tri_area2

            v9, c9, z, fv_img = gather_face_corners(
                verts, verts_color, verts_ndc, faces, verts_image
            )
            p0, p1, p2 = fv_img[..., 0, :], fv_img[..., 1, :], fv_img[..., 2, :]
            neg = tri_area2(p0, p1, p2) < 0.0                   # (B, F)
            q1 = jnp.where(neg[..., None], p2, p1)
            q2 = jnp.where(neg[..., None], p1, p2)
            aa_face_verts = jnp.stack([p0, q1, q2], axis=-2)    # (B, F, 3, 2)
        else:
            v9, c9, z = gather_face_corners(verts, verts_color, verts_ndc,
                                            faces)
            neg = None
        depth01, _, _, alive = ref_ops.face_depth01_from_z(z)
        binning = bin_faces(
            aa_face_verts, depth01, alive, patch_min, patch_width, patch_height,
            config.binning_capacity, config.max_tiles_per_face,
            num_giant_faces=config.num_giant_faces,
            giant_tiles=config.giant_tiles,
            exact_tile_cull=config.exact_tile_cull,
        )
        table = build_face_table_from_corners(
            v9, c9, z, faces_opacity, faces_intense, aa_face_verts,
            interpret=config.interpret,
        )
        stream = gather_stream(table, binning.entry_bf)
        return binning, stream, table, neg

    def rasterize_fwd_impl(verts, verts_color, faces_opacity, verts_ndc,
                           faces_intense, aa_face_verts, faces, background,
                           patch_min, ray_o_cam, ray_d, vtable,
                           verts_image):
        if not config.use_pallas:
            if fused_prep:
                from dmesh2_renderer_tpu.geometry import _face_aa_verts_impl

                aa_face_verts = _face_aa_verts_impl(verts_image, faces)[0]
            color, depth, ref_aux = ref_ops.render_reference(
                verts, faces, verts_color, faces_opacity, verts_ndc,
                faces_intense, aa_face_verts, background, patch_min,
                jnp.broadcast_to(ray_o_cam[:, None, None, :], ray_d.shape), ray_d, tau,
            )
            zero = jnp.zeros((), jnp.int32)
            return (color, depth, ref_aux.final_t,
                    RasterAux(zero, zero, zero)), None
        binning, stream, _table, neg = _pipeline(
            verts, verts_color, faces_opacity, verts_ndc, faces_intense,
            aa_face_verts, faces, patch_min, verts_image,
        )
        color, depth, final_t, prev_t, _, nc_tile = composite_forward(
            stream, binning.tile_starts, binning.tile_counts, ray_o_cam, ray_d,
            background, patch_min, patch_width, patch_height, tau,
            chunk=config.face_chunk, interpret=config.interpret,
            subchunks=config.fwd_subchunks,
        )
        n_contrib_total = jnp.sum(
            jnp.minimum(binning.tile_counts, jnp.maximum(nc_tile, 0)))
        aux = RasterAux(binning.num_rendered, binning.num_truncated,
                        n_contrib_total)
        residuals = (stream, binning.entry_bf, binning.tile_starts,
                     binning.tile_counts, binning.giant_ids, nc_tile,
                     color, depth, final_t, prev_t, neg)
        return (color, depth, final_t, aux), residuals

    @jax.custom_vjp
    def rasterize(verts, verts_color, faces_opacity, verts_ndc, faces_intense,
                  aa_face_verts, faces, background, patch_min, ray_o_cam, ray_d,
                  vtable=None, verts_image=None):
        out, _ = rasterize_fwd_impl(
            verts, verts_color, faces_opacity, verts_ndc, faces_intense,
            aa_face_verts, faces, background, patch_min, ray_o_cam, ray_d,
            vtable, verts_image,
        )
        return out

    def fwd(verts, verts_color, faces_opacity, verts_ndc, faces_intense,
            aa_face_verts, faces, background, patch_min, ray_o_cam, ray_d,
            vtable=None, verts_image=None):
        out, residuals = rasterize_fwd_impl(
            verts, verts_color, faces_opacity, verts_ndc, faces_intense,
            aa_face_verts, faces, background, patch_min, ray_o_cam, ray_d,
            vtable, verts_image,
        )
        saved = (residuals, verts, verts_color, faces_opacity, verts_ndc,
                 faces_intense, aa_face_verts, faces, background, patch_min,
                 ray_o_cam, ray_d, vtable, verts_image)
        return out, saved

    def bwd(saved, cotangents):
        g_color, g_depth, g_final_t, _ = cotangents
        g_final_t = jnp.zeros_like(g_depth) if g_final_t is None else g_final_t
        (residuals, verts, verts_color, faces_opacity, verts_ndc,
         faces_intense, aa_face_verts, faces, background, patch_min,
         ray_o_cam, ray_d, vtable, verts_image) = saved

        if not config.use_pallas:
            def f(v, c, o, nz, it, aa_or_img):
                if fused_prep:
                    from dmesh2_renderer_tpu.geometry import _face_aa_verts_impl

                    aa = _face_aa_verts_impl(aa_or_img, faces)[0]
                else:
                    aa = aa_or_img
                color, depth, raux = ref_ops.render_reference(
                    v, faces, c, o, nz, it, aa, background, patch_min,
                    jnp.broadcast_to(ray_o_cam[:, None, None, :], ray_d.shape),
                    ray_d, tau,
                )
                return color, depth, raux.final_t

            _, vjp = jax.vjp(f, verts, verts_color, faces_opacity, verts_ndc,
                             faces_intense,
                             verts_image if fused_prep else aa_face_verts)
            d6 = vjp((g_color, g_depth, g_final_t))
            if fused_prep:
                return (*d6[:5], None, None, None, None, None, None, None,
                        d6[5])
            return (*d6, None, None, None, None, None, None, None)

        (stream, entry_bf, starts, counts, giant_ids, nc_tile,
         color, depth, final_t, prev_t, neg) = residuals
        grad_records = composite_backward(
            stream, starts, counts, nc_tile, ray_o_cam, ray_d, background,
            patch_min, color, depth, final_t, prev_t, g_color, g_depth,
            g_final_t, patch_width, patch_height, tau,
            chunk=config.face_chunk, interpret=config.interpret,
            blocked=True, subchunks=config.bwd_subchunks,
        )
        if config.grad_compact_capacity:
            # Residual compaction folded into the scatter's sort: entries
            # past a tile's contributing prefix have exactly-zero records,
            # so their keys mask to the sentinel and all post-sort stages
            # run on the static compact_capacity prefix (scatter_entry_grads
            # docstring; pre-compacting the stream was measured a net loss).
            # Overflow is reported through the FORWARD aux
            # (num_grad_contributing): no host callbacks exist on this
            # runtime to warn from here.
            keep, _ = contributing_mask(
                starts, counts, nc_tile, entry_bf.shape[0]
            )
        else:
            keep = None
        gx = -(-patch_width // TILE_X)
        gy = -(-patch_height // TILE_Y)
        kt2 = (gx * gy if config.giant_tiles is None
               else min(config.giant_tiles, gx * gy))
        d_verts, d_vcolor, d_op, d_vndc_z, d_int, d_aa = scatter_entry_grads(
            grad_records, entry_bf, faces, verts.shape[0], verts_ndc.shape[0],
            max_tiles_per_face=config.max_tiles_per_face,
            max_vertex_valence=config.max_vertex_valence,
            giant_ids=giant_ids if config.num_giant_faces > 0 else None,
            giant_seg_len=config.max_tiles_per_face + kt2,
            keep=keep, compact_capacity=config.grad_compact_capacity,
            sort_mode=config.grad_sort_mode,
            sort_split=config.grad_sort_split,
            vtable=vtable,
        )
        d_vndc = jnp.zeros_like(verts_ndc).at[..., 2].set(d_vndc_z)
        if fused_prep:
            from dmesh2_renderer_tpu.geometry import aa_cotangent_to_verts_image

            d_img = aa_cotangent_to_verts_image(
                d_aa, neg, faces, verts_image.shape[1],
                config.max_vertex_valence, vtable,
            )
            return (d_verts, d_vcolor, d_op, d_vndc, d_int, None,
                    None, None, None, None, None, None, d_img)
        return (d_verts, d_vcolor, d_op, d_vndc, d_int, d_aa,
                None, None, None, None, None, None, None)

    rasterize.defvjp(fwd, bwd)
    return rasterize
