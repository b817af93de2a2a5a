"""Scene-driven capacity sizing for the static binning design.

The reference sizes its buffers with a mid-pipeline device->host readback
of the true emission count (``cuda_impl/renderer.cu:175-183``) -- free
dynamic allocation, impossible under XLA. This module is the TPU-native
replacement: run ONLY the cheap geometry prefix (projection + tile rects,
no kernels, no sort) on the actual scene, and derive a ``RasterConfig``
whose static capacities cover it with headroom. One probe per
scene/camera-family amortizes to zero; capacities stay static under jit.

Typical use::

    cfg = suggest_config(verts, faces, mv, proj, W, H)
    color, depth, aux = render(..., config=cfg)     # aux.num_truncated == 0
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from dmesh2_renderer_tpu import geometry as G
from dmesh2_renderer_tpu.ops.binning import face_tile_rects, tile_grid_size
from dmesh2_renderer_tpu.ops.reference import face_depth01
from dmesh2_renderer_tpu.utils.config import RasterConfig


def scene_binning_stats(verts, faces, mv, proj, width: int, height: int):
    """Per-scene emission statistics from the geometry prefix only.

    Returns a dict: ``total_emissions`` (sum over views of per-face tile
    counts -- the bbox-rect count, an upper bound on what any cull keeps),
    ``max_tiles`` (largest single-face tile footprint), ``tiles_hist``
    (per-(batch, face) tile counts, flattened numpy), ``grid`` (gx, gy).
    """
    verts = jnp.asarray(verts, jnp.float32)
    faces_j = jnp.asarray(faces, jnp.int32)
    mv = jnp.asarray(mv, jnp.float32)
    proj = jnp.asarray(proj, jnp.float32)
    verts_ndc, verts_image = G.compute_verts_ndc_image(
        verts, mv, proj, width, height
    )
    aa = G.face_aa_verts_ccw(verts_image, faces_j)
    _, _, _, alive = face_depth01(verts_ndc, faces_j)
    gx, gy = tile_grid_size(width, height)
    pm = jnp.zeros((mv.shape[0], 2), jnp.int32)
    _, _, rw, rh = face_tile_rects(aa, pm, gx, gy)
    tiles = jnp.where(alive, rw * rh, 0)
    tiles_np = np.asarray(tiles).reshape(-1)
    return {
        "total_emissions": int(tiles_np.sum()),
        "max_tiles": int(tiles_np.max()) if tiles_np.size else 0,
        "tiles_hist": tiles_np,
        "grid": (gx, gy),
    }


def _round_up(n: int, q: int) -> int:
    return -(-n // q) * q


def suggest_config(
    verts, faces, mv, proj, width: int, height: int,
    base: RasterConfig | None = None,
    margin: float = 1.3,
    kt_percentile: float = 99.0,
):
    """Derive static capacities that cover this scene with headroom.

    * ``binning_capacity``: bbox emission count x ``margin``, rounded up to
      the 128-entry stream block (conservative: the exact-overlap cull and
      behind-camera culls only shrink it).
    * ``max_tiles_per_face`` (Kt): the ``kt_percentile`` of per-face tile
      counts -- the dense grid stays small while only outlier faces spill.
    * ``num_giant_faces`` / ``giant_tiles``: sized so every face above Kt
      fits the giant tier WITH 2x headroom (camera motion between probe
      and render changes footprints).

    ``grad_compact_capacity`` is NOT derived here: the contributing count
    depends on occlusion (a forward-pass quantity). Render once with the
    suggested config and read ``aux.num_grad_contributing``, or leave
    compaction off. ``base`` carries every non-capacity knob through.

    Geometry changes (vertices move every optimization step) change
    footprints; ``margin`` absorbs drift, and ``aux.num_truncated`` /
    ``Renderer.forward`` warnings remain the contract that overflow is
    never silent. Re-probe when they fire.
    """
    base = base or RasterConfig()
    s = scene_binning_stats(verts, faces, mv, proj, width, height)
    hist = s["tiles_hist"]
    gx, gy = s["grid"]

    if hist.size == 0 or s["total_emissions"] == 0:
        return dataclasses.replace(base, binning_capacity=1024)

    # Kt sizes the DENSE emission grid (B*F*Kt sort keys): track the bulk
    # of the distribution, never the outliers -- the cap at 4x the 90th
    # percentile keeps a handful of huge faces (<1% tails) from inflating
    # every face's slot count; they belong in the giant tier.
    pos = hist[hist > 0]
    kt = int(np.percentile(pos, kt_percentile)) if pos.size else 1
    kt = min(kt, 4 * max(1, int(np.percentile(pos, 90.0))) if pos.size else kt)
    kt = max(4, min(kt, gx * gy))
    n_giant = int((hist > kt).sum())
    num_giant_faces = _round_up(max(2 * n_giant, 16), 16) if n_giant else 0
    giant_tiles = min(max(s["max_tiles"], kt), gx * gy) if n_giant else None

    capacity = _round_up(int(s["total_emissions"] * margin) + 128, 1024)
    return dataclasses.replace(
        base,
        binning_capacity=capacity,
        max_tiles_per_face=kt,
        num_giant_faces=num_giant_faces,
        giant_tiles=giant_tiles,
        # The probe was handed CONCRETE faces, so the static valence-table
        # reduction applies (measured -7.5% e2e at the 1M headline; round-5
        # A/B). Topology-dynamic loops that re-wire faces every step should
        # override back to "sort" -- the per-topology host precompute would
        # miss its cache each step. ``base`` wins if it already chose.
        vertex_sort_mode=("static" if base.vertex_sort_mode == "sort"
                          else base.vertex_sort_mode),
    )
