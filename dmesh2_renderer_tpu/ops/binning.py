"""Static-capacity tile binning (TPU replacement for the CUDA sort pipeline).

The CUDA reference bins faces into 16x16 tiles with a dynamically-sized
key/value buffer: prefix-sum of touched-tile counts, a blocking device->host
readback of the total, buffer allocation, 64-bit key duplication and a CUB
radix sort (``cuda_impl/renderer.cu:150-219, 415-492``). XLA cannot allocate
data-dependent buffers inside jit, so this module re-expresses the pipeline
with static shapes -- and, because XLA TPU scatters cost ~50x more than
sorts of the same size (measured), strictly scatter-free:

  * touched-tile rects      -> vectorized over (B, F)     (forward.cu:16-108)
  * key duplication + sort  -> ONE sort of the dense (BF * Kt) emission grid
                               on a packed int32 (tile | quantized-depth) key
                               with the (b*F + f) entry id as payload; empty
                               slots carry a sentinel key and sort to the end
                               (the reference's 64-bit float-bits key,
                               renderer.cu:456-459, becomes tile<<bits_d |
                               depth * 2^bits_d -- the global depth test is
                               approximate by design, so quantized sort depth
                               changes nothing structural)
  * identifyTileRanges      -> ``searchsorted`` of the T tile boundaries in
                               the sorted keys (T queries, not R)
  * dynamic num_rendered    -> static capacity R; entries past R are dropped
                               and *reported* (mirroring the reference's
                               explicit buffer-overflow philosophy,
                               backward.cu:254-257)

The sorted entries are then *pre-gathered* into a dense face-record table
("face stream"): one XLA gather converts the compositing kernels' random
access into contiguous streaming DMA -- the idiomatic TPU answer to the
reference's per-block shared-memory staging of face data
(``forward.cu:262-304``).

Stream layout: Mosaic can only DMA-slice HBM arrays whose minor dimension is
a multiple of the 128-lane tiling, so the (R, W) record table is stored as
field-major 128-entry blocks (R/128, W, 128) -- block k holds entries
[128k, 128(k+1)), field f on sublane f. Tile segments are NOT aligned to
block boundaries; kernels DMA whole blocks and mask the head/tail rows that
belong to neighboring tiles (see pallas_fwd/pallas_bwd).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dmesh2_renderer_tpu.utils.config import (
    STREAM_BLOCK,
    TILE_X,
    TILE_Y,
)


class Binning(NamedTuple):
    entry_bf: jnp.ndarray      # (R,) int32, b*F+f per sorted entry (sentinel
                               # BF); segments contiguous, UNALIGNED starts
    tile_starts: jnp.ndarray   # (T_total,) int32 offsets into entry_bf
    tile_counts: jnp.ndarray   # (T_total,) int32
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


def _ceil_log2(n: int) -> int:
    return max(1, (n - 1).bit_length())


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
    num_rendered = jnp.sum(touched)
    num_emitted = jnp.sum(emit)
    num_truncated = num_rendered - num_emitted + jnp.maximum(
        num_emitted - capacity, 0
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

    # Packed int31 sort key: tile in the high bits, quantized depth below.
    # The reference packs (tile << 32 | float_bits(depth)) into 64 bits
    # (renderer.cu:456-459); 64-bit sorts lower poorly on TPU, and the depth
    # test is approximate (per-face mean z) by design, so bits_d levels of
    # depth resolution are behaviorally equivalent.
    bits_t = _ceil_log2(t_total + 1)
    bits_d = 31 - bits_t
    if bits_d < 10:
        raise ValueError(
            f"tile grid too large for packed int31 sort keys: {t_total} "
            f"(batch x tiles) needs {bits_t} bits, leaving {bits_d} < 10 "
            "depth bits. Render fewer views per call (shard views across "
            "chips with dmesh2_renderer_tpu.parallel) or use smaller patches."
        )
    # Quantize depth in the INTEGER domain: for bits_d >= 25 the float32
    # value (2^bits_d - 1) rounds up to 2^bits_d, so a float-side clip can
    # still yield dq == 2^bits_d at depth01 == 1.0 and overflow into the
    # tile bits (binning the entry into the adjacent tile).
    dmax = (1 << bits_d) - 1
    dq = jnp.minimum(
        (depth01.reshape(bf, 1) * dmax).astype(jnp.int32), dmax
    )
    dq = jnp.maximum(dq, 0)
    key = jnp.where(
        valid,
        (tile_id << bits_d) | dq,
        jnp.int32(0x7FFFFFFF),
    )
    payload = jnp.broadcast_to(
        jnp.arange(bf, dtype=jnp.int32)[:, None], (bf, kt)
    )

    key_sorted, entry_sorted = jax.lax.sort(
        (key.reshape(-1), payload.reshape(-1)), num_keys=1, is_stable=True
    )
    key_sorted = key_sorted[:capacity]
    entry_bf = jnp.where(key_sorted != jnp.int32(0x7FFFFFFF),
                         entry_sorted[:capacity], bf)

    # Tile ranges: T boundary queries into the sorted keys.
    bounds = (jnp.arange(t_total + 1, dtype=jnp.int32) << bits_d)
    edges = jnp.searchsorted(key_sorted, bounds, side="left").astype(jnp.int32)
    starts = edges[:-1]
    counts = edges[1:] - starts
    return Binning(entry_bf, starts, counts, num_rendered, num_truncated)


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


def build_face_table(
    verts,           # (P, 3)
    faces,           # (F, 3) int32
    verts_color,     # (P, 3)
    faces_opacity,   # (F,)
    verts_ndc,       # (B, P, 3)
    faces_intense,   # (B, F)
    aa_face_verts,   # (B, F, 3, 2)
):
    """Per-(batch, face) record table as TWO contiguous (B*F, 16) arrays.

    All gathers here are F-sized (faces -> verts), not R-sized; the R-sized
    access is the row gather in :func:`gather_stream`. XLA TPU row-gather
    throughput is non-monotonic in row width; 2x16 measures fastest at the
    1M-table / 6M-read scale (228 vs 279 ms direct-32 vs 356 ms 4x8).
    """
    b = verts_ndc.shape[0]
    f = faces.shape[0]
    vid = faces  # (F, 3)
    v = verts[vid].reshape(f, 9)                                  # (F, 9)
    c = verts_color[vid].reshape(f, 9)
    z = verts_ndc[:, :, 2][:, vid]                                # (B, F, 3)
    op = jnp.broadcast_to(faces_opacity[None, :, None], (b, f, 1))
    it = faces_intense[:, :, None]
    aa = aa_face_verts.reshape(b, f, 6)
    vb = jnp.broadcast_to(v[None], (b, f, 9))
    cb = jnp.broadcast_to(c[None], (b, f, 9))
    pad = jnp.zeros((b, f, 3), v.dtype)
    flat = jnp.concatenate([vb, cb, z, op, it, aa, pad], axis=2).reshape(b * f, 32)
    return tuple(flat[:, 16 * k:16 * (k + 1)] for k in range(2))


def gather_stream(face_table, entry_bf):
    """(R,) sorted entries -> (R/128, 32, 128) field-major DMA blocks.

    Two 16-wide row gathers from the split (B*F, 16) tables (sentinel
    entries read row 0 and are masked by tile_counts in the kernels),
    emitted directly in the blocked field-major layout the kernels DMA.
    """
    r = entry_bf.shape[0]
    nb = r // STREAM_BLOCK
    safe = jnp.minimum(entry_bf, face_table[0].shape[0] - 1)
    rows = jnp.concatenate([t[safe] for t in face_table], axis=1)
    return rows.reshape(nb, STREAM_BLOCK, 32).transpose(0, 2, 1)


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
    """Gather per-entry face records into (R/128, 32, 128) DMA blocks."""
    table = build_face_table(
        verts, faces, verts_color, faces_opacity, verts_ndc, faces_intense,
        aa_face_verts,
    )
    return gather_stream(table, entry_bf)


def block_stream(flat):
    """(R, W) records -> (R/128, W, 128) field-major DMA blocks."""
    r, width = flat.shape
    nb = r // STREAM_BLOCK
    return flat.reshape(nb, STREAM_BLOCK, width).transpose(0, 2, 1)


def unblock_stream(blocked):
    """(NB, W, 128) field-major blocks -> (R, W) records."""
    nb, width, blk = blocked.shape
    return blocked.transpose(0, 2, 1).reshape(nb * blk, width)
