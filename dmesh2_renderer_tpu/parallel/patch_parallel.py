"""Spatial pixel parallelism: shard one frame's pixel space across chips.

The third scaling axis, orthogonal to views (data_parallel.py) and faces
(face_parallel.py): each chip renders a horizontal BAND of every view. This
is the axis that attacks single-frame LATENCY -- the DESIGN.md roofline
shows the compositing kernels are VPU-bound on one chip (62 Mpix/s is
unreachable single-chip), and pixel work divides embarrassingly: per-band
binning culls faces outside the band (the reference's tile-range mechanism,
``cuda_impl/renderer.cu:456-476``, restricted to the band's tile rows), the
band composites independently, and the stitched image is exact -- no
inter-chip compositing math at all, unlike the face axis.

Sharding shape: out_specs place the band axis ON the image height axis, so
the global result is the (B, H, W, 3) frame already sharded the way an image
loss consumes it; the matching target shard never leaves its chip. Shared
scene parameters are replicated; their gradients all-reduce with ``psum``
over ICI exactly as in data_parallel. ``make_grid_train_step`` composes this
with the view axis on a 2-D ``(dp, sp)`` device mesh.

Capacity note: ``config.binning_capacity`` applies PER CHIP and per-chip
emission counts shrink ~1/n (only faces overlapping the band emit), so a
full-frame capacity can be divided by ~n across the sp axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from dmesh2_renderer_tpu.functional import render_partial
from dmesh2_renderer_tpu.parallel.data_parallel import RenderStats, SceneParams
from dmesh2_renderer_tpu.utils.config import RasterConfig


def make_pixel_mesh(n_devices: int | None = None, axis: str = "sp") -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(devices, (axis,))


def _band(height: int, n: int) -> int:
    if height % n:
        raise ValueError(
            f"height {height} must divide evenly into {n} bands; pad the "
            "frame or choose a band-aligned height"
        )
    return height // n


def render_pixels_sharded(
    mesh: Mesh,
    verts, faces, verts_color, faces_opacity, faces_intense,
    mv, proj, background,
    width: int, height: int,
    aa_temperature: float = 1.0,
    config: RasterConfig | None = None,
    axis: str = "sp",
):
    """Render B views with the pixel rows sharded across the mesh.

    Returns (color (B, H, W, 3), depth (B, H, W) in [0, 1], aux) with the
    image arrays sharded along the height axis (band k on chip k); the
    stitched frame is bit-identical to the single-chip render of the same
    config (band compositing is per-pixel independent).
    """
    config = config or RasterConfig()
    n = mesh.shape[axis]
    band = _band(height, n)

    def shard_fn(verts, faces, vc, fo, fi, mv, proj, bg):
        y0 = jax.lax.axis_index(axis) * band
        color, depth_raw, _final_t, aux = render_partial(
            verts, faces, vc, fo, fi, mv, proj, bg,
            width, height, aa_temperature, config,
            patch_origin=(0, y0), patch_shape=(band, width),
        )
        stats = jax.tree.map(
            lambda s: jax.lax.pmax(s, axis),
            RenderStats(aux.num_truncated, aux.num_grad_contributing),
        )
        return color, 1.0 - (depth_raw + 1.0) / 2.0, stats

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(),) * 8,
        out_specs=(P(None, axis), P(None, axis), P()),
        check_vma=False,
    )
    return fn(verts, faces, verts_color, faces_opacity, faces_intense,
              mv, proj, background)


def make_grid_train_step(
    mesh: Mesh,
    optimizer,
    faces,
    width: int,
    height: int,
    aa_temperature: float = 1.0,
    config: RasterConfig | None = None,
    view_axis: str = "dp",
    pixel_axis: str = "sp",
    depth_weight: float = 0.0,
):
    """Build a jitted train step over a 2-D (view x pixel-band) device mesh.

    Views shard over ``view_axis``; each view's pixel rows shard over
    ``pixel_axis``. Per-chip work is one band of one view subset; shared
    scene-parameter gradients all-reduce over BOTH axes (one fused psum over
    ICI), targets arrive pre-sharded on (view, row). With ``mesh`` shaped
    (n, 1) this reduces exactly to data_parallel.make_sharded_train_step;
    with (1, n) it is pure spatial sharding of BASELINE.md config 1's frame.
    A 1-D mesh carrying only ``pixel_axis`` (make_pixel_mesh) is also
    accepted: views replicate, bands shard.

    Returns step(params, opt_state, faces_intense, mv, proj, target_color,
    background) -> (params, opt_state, loss, stats: RenderStats).
    """
    config = config or RasterConfig()
    if pixel_axis not in mesh.axis_names:
        raise ValueError(
            f"mesh axes {mesh.axis_names} lack pixel axis {pixel_axis!r}"
        )
    has_views = view_axis in mesh.axis_names
    n_px = mesh.shape[pixel_axis]
    band = _band(height, n_px)
    axes = (view_axis, pixel_axis) if has_views else (pixel_axis,)
    vspec = P(view_axis) if has_views else P()
    tspec = P(view_axis, pixel_axis) if has_views else P(None, pixel_axis)

    def local_loss(params: SceneParams, fi_s, mv_s, proj_s, tgt_s, background):
        y0 = jax.lax.axis_index(pixel_axis) * band
        color, depth_raw, _final_t, aux = render_partial(
            params.verts, faces, params.verts_color, params.faces_opacity,
            fi_s, mv_s, proj_s, background, width, height, aa_temperature,
            config, patch_origin=(0, y0), patch_shape=(band, width),
        )
        # Equal-sized shards: the local mean IS the global mean after pmean.
        loss = jnp.mean((color - tgt_s) ** 2)
        if depth_weight:
            depth = 1.0 - (depth_raw + 1.0) / 2.0
            loss = loss + depth_weight * jnp.mean(depth**2)
        stats = RenderStats(aux.num_truncated, aux.num_grad_contributing)
        return loss, stats

    def shard_fn(params, fi_s, mv_s, proj_s, tgt_s, background):
        (loss, stats), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params, fi_s, mv_s, proj_s, tgt_s, background
        )
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, axes), grads)
        loss = jax.lax.pmean(loss, axes)
        stats = jax.tree.map(lambda s: jax.lax.pmax(s, axes), stats)
        return loss, grads, stats

    sharded_grads = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), vspec, vspec, vspec, tspec, P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(params, opt_state, faces_intense, mv, proj, target_color,
             background):
        loss, grads, stats = sharded_grads(
            params, faces_intense, mv, proj, target_color, background
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss, stats

    return step
