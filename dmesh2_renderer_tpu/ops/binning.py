"""Static-capacity tile binning (TPU replacement for the CUDA sort pipeline).

The CUDA reference bins faces into 16x16 tiles with a dynamically-sized
key/value buffer: prefix-sum of touched-tile counts, a blocking device->host
readback of the total, buffer allocation, 64-bit key duplication and a CUB
radix sort (``cuda_impl/renderer.cu:150-219, 415-492``). XLA cannot allocate
data-dependent buffers inside jit, so this module re-expresses the pipeline
with static shapes:

  * touched-tile rects      -> vectorized over (B, F)     (forward.cu:16-108)
  * prefix sum              -> ``jnp.cumsum``             (renderer.cu:165-171)
  * key duplication         -> masked scatter at a static capacity R with
                               out-of-capacity entries dropped (overflow is
                               *reported*, mirroring the reference's explicit
                               buffer-overflow philosophy, backward.cu:254-257)
  * 64-bit (tile|depth) radix sort -> stable two-key lexicographic
                               ``lax.sort`` on (int32 tile, f32 depth in [0,1]);
                               the reference's float-bits-monotone trick
                               (renderer.cu:456-459) is unnecessary because
                               lax.sort orders floats natively
  * identifyTileRanges      -> vectorized ``searchsorted`` on the sorted keys

The sorted entries are then *pre-gathered* into a dense face-record table
("face stream"): one XLA gather converts the compositing kernels' random
access into contiguous streaming DMA -- the idiomatic TPU answer to the
reference's per-block shared-memory staging of face data
(``forward.cu:262-304``).

Stream layout: Mosaic can only DMA-slice HBM arrays whose minor dimension is
a multiple of the 128-lane tiling, so the (R, 32) record table is stored as
field-major 128-entry blocks (NB, 32, 128) -- block k holds entries
[128k, 128(k+1)), field f on sublane f -- and every tile's entry segment is
aligned to a 128-entry boundary (sentinel-padded). Kernels DMA whole blocks
and transpose (32, 128) -> (128, 32) in VMEM.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dmesh2_renderer_tpu.utils.config import (
    FACE_RECORD_WIDTH,
    STREAM_BLOCK,
    TILE_X,
    TILE_Y,
)


class Binning(NamedTuple):
    entry_bf: jnp.ndarray      # (Ra,) int32, b*F+f per entry (sentinel BF);
                               # tile segments 128-aligned, sentinel-padded
    tile_starts: jnp.ndarray   # (T_total,) int32 offsets into entry_bf
    tile_counts: jnp.ndarray   # (T_total,) int32 (excludes alignment padding)
    num_rendered: jnp.ndarray  # () int32: true duplicated-instance count
    num_truncated: jnp.ndarray  # () int32: instances dropped by Kt / capacity


def tile_grid_size(patch_width: int, patch_height: int):
    gx = -(-patch_width // TILE_X)
    gy = -(-patch_height // TILE_Y)
    return gx, gy


def face_tile_rects(aa_face_verts, patch_min, gx: int, gy: int):
    """Clamped tile rectangles per (batch, face).

    Matches ``getPatchRectFromTri`` (``auxiliary.h:72-92``): floor on the min
    corner, ceil on the max corner (exclusive), clamped into [0, grid].

    Returns rx0, ry0, rw, rh (each (B, F) int32; rw/rh may be 0).
    """
    mn = aa_face_verts.min(axis=2)  # (B, F, 2)
    mx = aa_face_verts.max(axis=2)
    pm = patch_min.astype(aa_face_verts.dtype)[:, None, :]
    rx0 = jnp.clip(jnp.floor((mn[..., 0] - pm[..., 0]) / TILE_X).astype(jnp.int32), 0, gx)
    ry0 = jnp.clip(jnp.floor((mn[..., 1] - pm[..., 1]) / TILE_Y).astype(jnp.int32), 0, gy)
    rx1 = jnp.clip(jnp.ceil((mx[..., 0] - pm[..., 0]) / TILE_X).astype(jnp.int32), 0, gx)
    ry1 = jnp.clip(jnp.ceil((mx[..., 1] - pm[..., 1]) / TILE_Y).astype(jnp.int32), 0, gy)
    return rx0, ry0, jnp.maximum(rx1 - rx0, 0), jnp.maximum(ry1 - ry0, 0)


def bin_faces(
    aa_face_verts,   # (B, F, 3, 2) screen-space triangles
    depth01,         # (B, F) sort depth in [0, 1]
    alive,           # (B, F) bool cull mask
    patch_min,       # (B, 2) int32
    patch_width: int,
    patch_height: int,
    capacity: int,
    max_tiles_per_face: int,
) -> Binning:
    b, f = depth01.shape
    bf = b * f
    gx, gy = tile_grid_size(patch_width, patch_height)
    t_total = b * gx * gy
    kt = max_tiles_per_face
    capacity = ((capacity + STREAM_BLOCK - 1) // STREAM_BLOCK) * STREAM_BLOCK

    rx0, ry0, rw, rh = face_tile_rects(aa_face_verts, patch_min, gx, gy)
    touched = jnp.where(alive, rw * rh, 0).reshape(bf)               # (BF,)
    emit = jnp.minimum(touched, kt)

    offsets = jnp.cumsum(emit) - emit                                 # exclusive
    num_rendered = jnp.sum(touched)
    num_truncated = jnp.sum(touched - emit) + jnp.maximum(
        offsets[-1] + emit[-1] - capacity, 0
    )

    # Emission grid (BF, Kt): k-th touched tile of each face, y-major order
    # matching duplicateWithKeys (renderer.cu:452-464).
    k = jnp.arange(kt, dtype=jnp.int32)[None, :]                      # (1, Kt)
    rw_f = jnp.maximum(rw.reshape(bf, 1), 1)
    dy = k // rw_f
    dx = k - dy * rw_f
    tile_x = rx0.reshape(bf, 1) + dx
    tile_y = ry0.reshape(bf, 1) + dy
    batch_of = (jnp.arange(bf, dtype=jnp.int32) // f)[:, None]
    tile_id = batch_of * (gx * gy) + tile_y * gx + tile_x             # (BF, Kt)

    valid = k < emit[:, None]
    pos = jnp.where(valid, offsets[:, None] + k, capacity)            # drop slot

    flat_pos = pos.reshape(-1)
    flat_tile = tile_id.reshape(-1)
    flat_depth = jnp.broadcast_to(depth01.reshape(bf, 1), (bf, kt)).reshape(-1)
    flat_bf = jnp.broadcast_to(
        jnp.arange(bf, dtype=jnp.int32)[:, None], (bf, kt)
    ).reshape(-1)

    tile_keys = jnp.full((capacity,), t_total, dtype=jnp.int32)
    depth_keys = jnp.full((capacity,), jnp.inf, dtype=depth01.dtype)
    entries = jnp.full((capacity,), bf, dtype=jnp.int32)
    tile_keys = tile_keys.at[flat_pos].set(flat_tile, mode="drop")
    depth_keys = depth_keys.at[flat_pos].set(flat_depth, mode="drop")
    entries = entries.at[flat_pos].set(flat_bf, mode="drop")

    tile_sorted, _, entry_sorted = jax.lax.sort(
        (tile_keys, depth_keys, entries), dimension=0, num_keys=2, is_stable=True
    )

    tiles = jnp.arange(t_total, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_sorted, tiles, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_sorted, tiles, side="right").astype(jnp.int32)
    counts = ends - starts

    # Re-lay the sorted list with every tile segment 128-entry aligned
    # (required for whole-block stream DMA; see module docstring). Gaps are
    # sentinel entries that the kernels mask via tile_counts.
    blk = STREAM_BLOCK
    padded = ((counts + blk - 1) // blk) * blk
    new_starts = (jnp.cumsum(padded) - padded).astype(jnp.int32)
    r_aligned = capacity + blk * t_total
    idx = jnp.arange(capacity, dtype=jnp.int32)
    in_tile = tile_sorted < t_total
    safe_tile = jnp.minimum(tile_sorted, t_total - 1)
    new_pos = jnp.where(
        in_tile, new_starts[safe_tile] + (idx - starts[safe_tile]), r_aligned
    )
    entry_aligned = jnp.full((r_aligned,), bf, dtype=jnp.int32).at[new_pos].set(
        entry_sorted, mode="drop"
    )
    return Binning(entry_aligned, new_starts, counts, num_rendered, num_truncated)


# Face-stream record layout (FACE_RECORD_WIDTH = 32 f32 words per entry):
#   [0:9)   v0.xyz v1.xyz v2.xyz      world-space triangle
#   [9:18)  c0.rgb c1.rgb c2.rgb      vertex colors
#   [18:21) z0 z1 z2                  per-batch NDC depths
#   [21]    opacity
#   [22]    intensity (per batch)
#   [23:29) aa x0 y0 x1 y1 x2 y2      CCW screen-space triangle
#   [29:32) pad
REC_V = 0
REC_C = 9
REC_Z = 18
REC_OP = 21
REC_IN = 22
REC_AA = 23


def pack_face_stream(
    entry_bf,        # (R,) int32 sorted entries (sentinel = B*F)
    verts,           # (P, 3)
    faces,           # (F, 3) int32
    verts_color,     # (P, 3)
    faces_opacity,   # (F,)
    verts_ndc,       # (B, P, 3)
    faces_intense,   # (B, F)
    aa_face_verts,   # (B, F, 3, 2)
):
    """Gather per-entry face records into a dense (R, 32) f32 table."""
    f = faces.shape[0]
    r = entry_bf.shape[0]
    safe = jnp.minimum(entry_bf, f * verts_ndc.shape[0] - 1)
    bi = safe // f
    fi = safe - bi * f
    vid = faces[fi]                                  # (R, 3)
    v = verts[vid].reshape(r, 9)
    c = verts_color[vid].reshape(r, 9)
    z = verts_ndc[bi[:, None], vid, 2]               # (R, 3)
    op = faces_opacity[fi][:, None]
    it = faces_intense[bi, fi][:, None]
    aa = aa_face_verts[bi, fi].reshape(r, 6)
    pad = jnp.zeros((r, FACE_RECORD_WIDTH - 29), dtype=v.dtype)
    flat = jnp.concatenate([v, c, z, op, it, aa, pad], axis=1)
    return block_stream(flat)


def block_stream(flat):
    """(R, W) records -> (R/128, W, 128) field-major DMA blocks."""
    r, width = flat.shape
    nb = r // STREAM_BLOCK
    return flat.reshape(nb, STREAM_BLOCK, width).transpose(0, 2, 1)


def unblock_stream(blocked):
    """(NB, W, 128) field-major blocks -> (R, W) records."""
    nb, width, blk = blocked.shape
    return blocked.transpose(0, 2, 1).reshape(nb * blk, width)
