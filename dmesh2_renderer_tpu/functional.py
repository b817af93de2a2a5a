"""Functional full-frame render entry point (jit/shard_map friendly).

The class API (``models.Renderer``) precomputes rays once per camera set like
the reference module does; this functional form recomputes them per call so
the whole step stays a pure function of its inputs -- the shape required for
``jax.jit`` / ``jax.grad`` / ``shard_map`` composition in training loops.
"""

from __future__ import annotations

import jax.numpy as jnp

from dmesh2_renderer_tpu import geometry as G
from dmesh2_renderer_tpu.ops.rasterize import make_rasterizer
from dmesh2_renderer_tpu.utils.config import RasterConfig
from dmesh2_renderer_tpu.utils.segments import static_vertex_order
from dmesh2_renderer_tpu.utils.validate import valence_cache


def render_partial(
    verts,          # (P, 3)
    faces,          # (F, 3) int32
    verts_color,    # (P, 3)
    faces_opacity,  # (F,)
    faces_intense,  # (B, F)
    mv,             # (B, 4, 4)
    proj,           # (B, 4, 4)
    background,     # (3,)
    width: int,
    height: int,
    aa_temperature: float = 1.0,
    config: RasterConfig | None = None,
    patch_origin=None,
    patch_shape: tuple[int, int] | None = None,
):
    """Render B full-frame views, also returning the exit transmittance.

    Returns (color, depth_raw, final_t, aux) with ``depth_raw`` the
    UN-remapped composite -- the form face-parallel compositing needs
    (parallel/face_parallel.py): partial framebuffers from disjoint depth
    slabs combine with the associative ``over`` operator using final_t.

    ``patch_origin=(x0, y0)`` (values may be traced) + ``patch_shape=(ph,
    pw)`` (static) restrict every view to one shared window of the full
    frame: cameras/projections still describe the (width, height) frame but
    only the window's rays/tiles are binned and composited. This is the
    spatial-sharding form (parallel/patch_parallel.py: one window per chip);
    per-view windows are the class API (models.Renderer patches).
    """
    config = config or RasterConfig()
    if (patch_origin is None) != (patch_shape is None):
        raise ValueError(
            "patch_origin and patch_shape must be passed together "
            f"(got patch_origin={patch_origin!r}, patch_shape={patch_shape!r})"
        )
    b = mv.shape[0]
    ray_o, ray_d = G.init_rays(mv, proj, width, height,
                               origin=patch_origin, shape=patch_shape)
    verts_ndc, verts_image = G.compute_verts_ndc_image(verts, mv, proj, width, height)
    valence_cache.check(faces, config.max_vertex_valence)
    vperm, svids = (static_vertex_order(faces)
                    if config.vertex_sort_mode == "static" else (None, None))
    if config.prep_mode == "fused":
        # AA corners ride the rasterizer's consolidated corner gather
        # (RasterConfig.prep_mode docstring).
        aa_verts, img = None, verts_image
    else:
        aa_verts = G.face_aa_verts_ccw(verts_image, faces,
                                       config.max_vertex_valence, vperm, svids)
        img = None
    if patch_origin is None:
        patch_min = jnp.zeros((b, 2), jnp.int32)
        pw, ph = width, height
    else:
        x0, y0 = patch_origin
        patch_min = jnp.broadcast_to(
            jnp.stack([jnp.asarray(x0, jnp.int32),
                       jnp.asarray(y0, jnp.int32)])[None, :], (b, 2))
        ph, pw = patch_shape
    rasterize = make_rasterizer(pw, ph, float(aa_temperature), config)
    return rasterize(
        verts, verts_color, faces_opacity, verts_ndc, faces_intense, aa_verts,
        faces, background, patch_min, ray_o[:, 0, 0, :], ray_d, vperm, svids,
        img,
    )


def render(
    verts,          # (P, 3)
    faces,          # (F, 3) int32
    verts_color,    # (P, 3)
    faces_opacity,  # (F,)
    faces_intense,  # (B, F)
    mv,             # (B, 4, 4)
    proj,           # (B, 4, 4)
    background,     # (3,)
    width: int,
    height: int,
    aa_temperature: float = 1.0,
    config: RasterConfig | None = None,
):
    """Render B full-frame views. Returns (color, depth in [0,1], aux)."""
    color, depth_raw, _final_t, aux = render_partial(
        verts, faces, verts_color, faces_opacity, faces_intense, mv, proj,
        background, width, height, aa_temperature, config,
    )
    depth = 1.0 - (depth_raw + 1.0) / 2.0
    return color, depth, aux
