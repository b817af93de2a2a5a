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
from dmesh2_renderer_tpu.utils.segments import static_vertex_table
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
    vtable = (static_vertex_table(faces, verts.shape[0])
              if config.vertex_sort_mode == "static" else None)
    if vtable is None:
        # The valence-table path is exact for any valence; only the sort +
        # bounded-scan path needs the truncation guard.
        valence_cache.check(faces, config.max_vertex_valence)
    if config.prep_mode == "fused":
        # AA corners ride the rasterizer's consolidated corner gather
        # (RasterConfig.prep_mode docstring).
        aa_verts, img = None, verts_image
    else:
        aa_verts = G.face_aa_verts_ccw(verts_image, faces,
                                       config.max_vertex_valence, vtable)
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
        faces, background, patch_min, ray_o[:, 0, 0, :], ray_d, vtable,
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


def peel_pipeline(verts, faces, faces_existence, mv, proj, ray_o, ray_d,
                  width: int, height: int, num_layers: int,
                  config: RasterConfig | None = None):
    """Depth-peel core shared by the class API and the sharded wrapper.

    Bin by MIN face depth over the full frame (the layered orchestrator's
    deviation from the renderer, ``renderer.cu:557-558, 603``), then L
    extract-min passes (ops/peel.py). Returns (layers (B, H, W, L) int32,
    counts (B, H, W) int32, (num_rendered, num_truncated)).
    """
    from dmesh2_renderer_tpu.ops.binning import bin_faces
    from dmesh2_renderer_tpu.ops.peel import pack_peel_stream, peel_layers
    from dmesh2_renderer_tpu.ops.reference import face_depth01

    cfg = config or RasterConfig()
    b = mv.shape[0]
    verts_ndc, verts_image = G.compute_verts_ndc_image(
        verts, mv, proj, width, height
    )
    tris = G.face_aa_triangles(verts_image, faces)
    _, min_depth, _, alive = face_depth01(verts_ndc, faces)
    patch_min = jnp.zeros((b, 2), jnp.int32)
    binning = bin_faces(
        tris.verts, min_depth, alive, patch_min, width, height,
        cfg.binning_capacity, cfg.max_tiles_per_face,
        num_giant_faces=cfg.num_giant_faces,
        giant_tiles=cfg.giant_tiles,
    )
    stream = pack_peel_stream(binning.entry_bf, verts, faces, faces_existence)
    layers, counts = peel_layers(
        stream, binning.tile_starts, binning.tile_counts,
        ray_o[:, 0, 0, :], ray_d, width, height, num_layers,
        chunk=cfg.face_chunk, interpret=cfg.interpret,
    )
    return layers, counts, (binning.num_rendered, binning.num_truncated)


def generate_layers(verts, faces, faces_existence, mv, proj,
                    width: int, height: int, num_layers: int,
                    config: RasterConfig | None = None):
    """Functional depth peel over B full-frame views (jit/shard_map
    friendly; the class form is ``models.LayeredRenderer.generate``)."""
    ray_o, ray_d = G.init_rays(mv, proj, width, height)
    return peel_pipeline(verts, faces, faces_existence, mv, proj, ray_o,
                         ray_d, width, height, num_layers, config)


def render_banded(
    verts, faces, verts_color, faces_opacity, faces_intense,
    mv, proj, background,
    width: int, height: int,
    bands: int,
    aa_temperature: float = 1.0,
    config: RasterConfig | None = None,
):
    """Render B views in ``bands`` sequential horizontal bands (one chip).

    Bounds PEAK memory instead of wall time: XLA compiles ONE band pipeline
    and ``lax.map``s it over band origins, so the live buffers (emission
    grid, sorted stream, framebuffers) are band-sized -- the single-chip
    answer for frames whose full-frame capacities outgrow HBM (4K+, or
    million-face scenes at large capacity). ``config.binning_capacity``
    applies PER BAND (a band only bins faces overlapping it; see
    ``suggest_config`` margins). The stitched result equals the full-frame
    render exactly -- band compositing is per-pixel independent.

    Multi-chip latency scaling of the same decomposition is
    ``parallel.render_pixels_sharded``; this is its sequential,
    memory-bounded sibling.

    Returns (color (B, H, W, 3), depth in [0, 1], aux max/summed over
    bands: num_rendered is a per-band MAX -- a per-band capacity gauge,
    not a total -- while num_truncated sums).
    """
    import jax

    if height % bands:
        raise ValueError(f"height {height} must divide into {bands} bands")
    band = height // bands
    b = mv.shape[0]

    def one(y0):
        color, depth_raw, _final_t, aux = render_partial(
            verts, faces, verts_color, faces_opacity, faces_intense,
            mv, proj, background, width, height, aa_temperature, config,
            patch_origin=(0, y0), patch_shape=(band, width),
        )
        return color, depth_raw, aux

    ys = jnp.arange(bands, dtype=jnp.int32) * band
    colors, draws, auxs = jax.lax.map(one, ys)
    color = jnp.moveaxis(colors, 0, 1).reshape(b, height, width, 3)
    depth_raw = jnp.moveaxis(draws, 0, 1).reshape(b, height, width)
    aux = type(auxs)(
        num_rendered=auxs.num_rendered.max(),
        num_truncated=auxs.num_truncated.sum(),
        num_grad_contributing=auxs.num_grad_contributing.max(),
    )
    return color, 1.0 - (depth_raw + 1.0) / 2.0, aux
