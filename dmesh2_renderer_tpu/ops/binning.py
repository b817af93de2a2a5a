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
from jax.experimental import pallas as pl

from dmesh2_renderer_tpu.utils.config import (
    FACE_RECORD_WIDTH,
    STREAM_BLOCK,
    TILE_X,
    TILE_Y,
)


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def materialize(x, interpret: bool = False):
    """Force ``x`` into its own contiguous HBM buffer via an opaque copy.

    ``jax.lax.optimization_barrier`` does NOT stop XLA from tracing a gather
    operand back through concats/slices and decomposing the row gather into
    per-piece gathers -- which is catastrophic when pieces are narrow
    (width-1 gathers cost ~60 ms per 6M reads; measured: the same split
    gather runs 147 ms from parameter tables vs 235 ms from in-jit
    barrier'd tables, benchmarks/micro_packparts.py). A Pallas identity
    copy is a custom call XLA cannot look through, so the result behaves
    like a parameter: a real contiguous table. Cost: one dense copy
    (~bandwidth, <1 ms for the face tables).

    The copy runs on the array flattened and padded to (rows, 1024) -- an
    exactly (8, 128)-tiled 2-D shape -- sidestepping both Mosaic's
    minor-dim tiling constraints for narrow tables and the 1-D layout
    mismatch XLA picks for small arrays (T(512) vs Mosaic's T(1024)).
    """
    n = x.size
    lane = 1024
    m = -(-n // lane)
    flat = x.reshape(n)
    if m * lane != n:
        flat = jnp.concatenate(
            [flat, jnp.zeros((m * lane - n,), x.dtype)]
        )
    arr = flat.reshape(m, lane)
    block_rows = min(m, 512)                   # <= 2 MiB f32 per block
    out = pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct((m, lane), x.dtype),
        grid=(pl.cdiv(m, block_rows),),
        in_specs=[pl.BlockSpec((block_rows, lane), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block_rows, lane), lambda i: (i, 0)),
        interpret=interpret,
    )(arr)
    return out.reshape(m * lane)[:n].reshape(x.shape)


class Binning(NamedTuple):
    entry_bf: jnp.ndarray      # (R,) int32, b*F+f per sorted entry (sentinel
                               # BF); segments contiguous, UNALIGNED starts
    tile_starts: jnp.ndarray   # (T_total,) int32 offsets into entry_bf
    tile_counts: jnp.ndarray   # (T_total,) int32
    num_rendered: jnp.ndarray  # () int32: true duplicated-instance count
    num_truncated: jnp.ndarray  # () int32: instances dropped by Kt / capacity
    giant_ids: jnp.ndarray     # (M2,) int32 b*F+f of tier-2 ("giant") faces,
                               # sentinel BF; empty when the tier is disabled


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


def _tri_tile_overlaps(aa_flat, patch_min_flat, tile_x, tile_y):
    """Exact triangle-vs-tile-box overlap test for emitted (entry, slot)s.

    The rect emission (face_tile_rects, mirroring ``getPatchRectFromTri``,
    auxiliary.h:72-92) bins a face into every tile its BBOX touches; a thin
    diagonal triangle touches only ~half of those. This SAT test keeps a
    slot only when the triangle actually intersects the 16x16 tile box: a
    convex polygon misses an AABB iff the box lies entirely outside one
    edge half-plane, i.e. the box corner MAXIMIZING the (orientation-
    corrected) edge function is still negative. Conservative on boundaries
    (>= 0 keeps) and orientation-safe (edge functions are scaled by the
    triangle's winding sign). Costs ~25 elementwise ops per slot on data
    already in registers -- repaid many times over by every downstream
    R-sized stage (sort, pack, kernels, gradient reduction).

    Args: aa_flat (BF, 3, 2) screen triangles, patch_min_flat (BF, 2),
    tile_x/tile_y (BF, K) tile indices. Returns (BF, K) bool.
    """
    ax = [aa_flat[:, k, 0:1] for k in range(3)]
    ay = [aa_flat[:, k, 1:2] for k in range(3)]
    # winding sign: cross(v1 - v0, v2 - v0)
    sgn = jnp.sign(
        (ax[1] - ax[0]) * (ay[2] - ay[0]) - (ay[1] - ay[0]) * (ax[2] - ax[0])
    )
    x0 = tile_x.astype(aa_flat.dtype) * TILE_X + patch_min_flat[:, 0:1]
    y0 = tile_y.astype(aa_flat.dtype) * TILE_Y + patch_min_flat[:, 1:2]
    ok = None
    for e in range(3):
        j = (e + 1) % 3
        ex = sgn * (ax[j] - ax[e])          # scaled edge vector (BF, 1)
        ey = sgn * (ay[j] - ay[e])
        # corner of the box maximizing ex*(cy - ay) - ey*(cx - ax)
        cy = y0 + jnp.where(ex > 0, float(TILE_Y), 0.0)
        cx = x0 + jnp.where(ey > 0, 0.0, float(TILE_X))
        smax = ex * (cy - ay[e]) - ey * (cx - ax[e])
        # Keep the cull strictly conservative under f32 rounding: the edge
        # function's absolute error is O(eps_f32 * |edge| * screen_extent);
        # a slack of 1e-3 px * |edge| dwarfs that while staying far below
        # any slot that could produce nonzero pixel coverage.
        slack = -1e-3 * (jnp.abs(ex) + jnp.abs(ey))
        ok = smax >= slack if ok is None else ok & (smax >= slack)
    return ok


def bin_faces(
    aa_face_verts,   # (B, F, 3, 2) screen-space triangles
    depth01,         # (B, F) sort depth in [0, 1]
    alive,           # (B, F) bool cull mask
    patch_min,       # (B, 2) int32
    patch_width: int,
    patch_height: int,
    capacity: int,
    max_tiles_per_face: int,
    num_giant_faces: int = 0,
    giant_tiles: int | None = None,
    exact_tile_cull: bool = False,
) -> Binning:
    """Static-capacity tile binning (module docstring has the design).

    ``max_tiles_per_face`` (Kt) caps the dense per-face emission grid; faces
    touching more tiles spill into the GIANT tier: up to ``num_giant_faces``
    of them (selected by lowest entry id) additionally emit tiles
    [Kt, Kt + giant_tiles), where ``giant_tiles`` defaults to the full tile
    grid -- so a camera-filling triangle is binned into every tile it
    touches, matching the reference's unbounded duplication
    (renderer.cu:415-465), without paying a (BF x tiles) dense grid.
    Anything beyond both tiers is truncated and reported.

    ``exact_tile_cull`` additionally drops rect slots whose tile box the
    triangle does not actually intersect (``_tri_tile_overlaps``): the
    rendered output is identical (such entries never pass the kernels' AA /
    inside tests), every R-sized downstream stage shrinks, and the culled
    slots are NOT counted as truncation. ``num_rendered`` stays the
    reference's rect-duplication count (renderer.cu:415-465) either way.
    """
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
    aa_flat = aa_face_verts.reshape(bf, 3, 2)
    pm_flat = jnp.broadcast_to(
        patch_min.astype(aa_face_verts.dtype)[:, None, :], (b, f, 2)
    ).reshape(bf, 2)
    num_culled = jnp.zeros((), jnp.int32)
    if exact_tile_cull:
        overlap1 = _tri_tile_overlaps(aa_flat, pm_flat, tile_x, tile_y)
        num_culled = jnp.sum((valid & ~overlap1).astype(jnp.int32))
        valid = valid & overlap1
    num_emitted = jnp.sum(valid.astype(jnp.int32))

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
    keys_flat = [key.reshape(-1)]
    payloads_flat = [payload.reshape(-1)]

    # Giant tier: faces with touched > Kt emit their REMAINING tiles from a
    # compacted (M2, Kt2) grid. Selection = the M2 MOST-oversized faces
    # (ascending Kt - touched key, ties broken by entry id via the stable
    # payload sort), so when the tier itself overflows, a camera-filling
    # triangle always wins a slot over faces that barely exceed Kt --
    # matching the intent of the reference's unbounded duplication
    # (renderer.cu:415-465) as closely as a bounded tier can.
    m2 = min(num_giant_faces, bf)
    if m2 > 0:
        kt2 = gx * gy if giant_tiles is None else min(giant_tiles, gx * gy)
        big = touched > kt
        sel_key = jnp.where(big, kt - touched, jnp.int32(0x7FFFFFFF))
        sk_g, giant_ids = jax.lax.sort(
            (sel_key, jnp.arange(bf, dtype=jnp.int32)), num_keys=1,
            is_stable=True,
        )
        sk_g, giant_ids = sk_g[:m2], giant_ids[:m2]
        valid_g = sk_g != jnp.int32(0x7FFFFFFF)
        safe_g = jnp.where(valid_g, giant_ids, 0)
        rx0_g = rx0.reshape(bf)[safe_g]
        ry0_g = ry0.reshape(bf)[safe_g]
        rw_g = jnp.maximum(rw.reshape(bf)[safe_g], 1)[:, None]
        touched_g = touched[safe_g]
        dq_g = dq.reshape(bf)[safe_g]
        batch_g = (safe_g // f)[:, None]
        k2 = jnp.arange(kt2, dtype=jnp.int32)[None, :] + kt       # (1, Kt2)
        dy2 = k2 // rw_g
        dx2 = k2 - dy2 * rw_g
        tile2 = batch_g * (gx * gy) + (ry0_g[:, None] + dy2) * gx + (
            rx0_g[:, None] + dx2
        )
        valid2 = valid_g[:, None] & (k2 < touched_g[:, None])
        if exact_tile_cull:
            overlap2 = _tri_tile_overlaps(
                aa_flat[safe_g], pm_flat[safe_g],
                rx0_g[:, None] + dx2, ry0_g[:, None] + dy2,
            )
            num_culled = num_culled + jnp.sum(
                (valid2 & ~overlap2).astype(jnp.int32))
            valid2 = valid2 & overlap2
        keys_flat.append(jnp.where(
            valid2, (tile2 << bits_d) | dq_g[:, None], jnp.int32(0x7FFFFFFF)
        ).reshape(-1))
        payloads_flat.append(
            jnp.broadcast_to(safe_g[:, None], (m2, kt2)).reshape(-1)
        )
        num_emitted = num_emitted + jnp.sum(valid2.astype(jnp.int32))
        giant_ids = jnp.where(valid_g, giant_ids, bf)
    else:
        giant_ids = jnp.zeros((0,), jnp.int32)

    num_truncated = num_rendered - num_emitted - num_culled + jnp.maximum(
        num_emitted - capacity, 0
    )

    # Small scenes can have fewer emission slots than the (block-rounded)
    # capacity; pad with sentinels so the sorted stream is exactly capacity.
    total_slots = sum(k.shape[0] for k in keys_flat)
    if total_slots < capacity:
        pad_n = capacity - total_slots
        keys_flat.append(jnp.full((pad_n,), 0x7FFFFFFF, jnp.int32))
        payloads_flat.append(jnp.zeros((pad_n,), jnp.int32))

    key_sorted, entry_sorted = jax.lax.sort(
        (jnp.concatenate(keys_flat), jnp.concatenate(payloads_flat)),
        num_keys=1, is_stable=True,
    )
    key_sorted = key_sorted[:capacity]
    entry_bf = jnp.where(key_sorted != jnp.int32(0x7FFFFFFF),
                         entry_sorted[:capacity], bf)

    # Tile ranges: T boundary queries into the sorted keys.
    bounds = (jnp.arange(t_total + 1, dtype=jnp.int32) << bits_d)
    edges = jnp.searchsorted(key_sorted, bounds, side="left").astype(jnp.int32)
    starts = edges[:-1]
    counts = edges[1:] - starts
    return Binning(entry_bf, starts, counts, num_rendered, num_truncated,
                   giant_ids)


def contributing_mask(tile_starts, tile_counts, nc_tile, r: int):
    """(R,) bool: stream positions inside some tile's CONTRIBUTING prefix.

    The forward kernel reports, per tile, the 1-based rank of the last face
    that blended into any pixel (``nc_tile``); every later entry has an
    exactly-zero gradient record (its transmittance is below T_EPS for every
    pixel, so the backward kernel's ``ok`` mask zeroes it). Ranks are list
    positions, so the contributing set is a per-tile PREFIX -- the
    entry-level analogue of the reference's per-pixel ``n_contrib`` skip
    (backward.cu:219-221). At opacity ~0.5, T crosses T_EPS after ~26
    faces, so only ~1/4 of the 1080p headline's entries contribute.

    Built with two T-sized index-add scatters and one R-sized cumsum (+1 at
    each tile start, -1 at its contributing cut): ~2 ms at R = 5.25M. (A
    position->tile ``searchsorted`` map was measured at ~300 ms for the
    same job -- see benchmarks/micro_compact.py.)

    Also returns the total contributing count (for overflow reporting).
    """
    counts2 = jnp.minimum(tile_counts, jnp.maximum(nc_tile, 0))
    delta = jnp.zeros((r + 1,), jnp.int32)
    delta = delta.at[tile_starts].add(1, mode="drop")
    delta = delta.at[tile_starts + counts2].add(-1, mode="drop")
    keep = jnp.cumsum(delta[:r], dtype=jnp.int32) > 0
    return keep, jnp.sum(counts2)


# Face-stream record layout (FACE_RECORD_WIDTH = 32 f32 words per entry):
#   [0:9)   v0.xyz v1.xyz v2.xyz      world-space triangle
#   [9:18)  c0.rgb c1.rgb c2.rgb      vertex colors
#   [18]    opacity
#   [19]    intensity (per batch)
#   [20:23) z0 z1 z2                  per-batch NDC depths
#   [23:29) aa x0 y0 x1 y1 x2 y2      CCW screen-space triangle
#   [29:32) pad
REC_V = 0
REC_C = 9
REC_OP = 18
REC_IN = 19
REC_Z = 20
REC_AA = 23

# Gathered-table split: XLA TPU row gathers are fast only from narrow
# CONTIGUOUS tables (measured, 6M reads from a 1M-row table: width 8 -> 39
# ms, width 16 -> 47 ms, width 32 -> 240 ms; slicing a wide table inside jit
# de-optimizes to the wide case, and widths sum roughly linearly). The
# 29-word record rides as 16 + 8 + 5 (fastest of the splits measured
# end-to-end including the block transpose: 170 vs 188 (16+13) vs 242
# direct).
_TABLE_SPLITS = (16, 8, 5)


def gather_face_corners(verts, verts_color, verts_ndc, faces,
                        verts_image=None):
    """ONE consolidated per-corner row gather for the whole pipeline.

    Builds a per-vertex table [xyz | rgb | ndc_z per batch] and gathers all
    3F corner rows at once: XLA TPU gathers pay per ROW far more than per
    column (measured: width 1 costs 60 ms where width 8 costs 39 ms at 6M
    reads), so one 6+B-wide gather replaces the four separate corner
    gathers (verts, colors, z for binning, z for records) the pipeline
    otherwise issues. Batches beyond width 16 chunk the z columns.

    With ``verts_image`` (B, P, 2) given (RasterConfig.prep_mode="fused"),
    the screen-space AA corner columns ride the SAME gather -- removing the
    separate 3F-row gather ``geometry.face_aa_verts_ccw`` otherwise issues
    (benchmarks/micro_prep.py candidate p3).

    Returns (v9 (F, 9), c9 (F, 9), z (B, F, 3)[, fv_img (B, F, 3, 2)]).
    """
    b = verts_ndc.shape[0]
    f = faces.shape[0]
    vid = faces.reshape(-1)
    zcols = jnp.swapaxes(verts_ndc[..., 2], 0, 1)                # (P, B)
    extra = 3 * b if verts_image is not None else b
    if 6 + extra <= 16:
        cols = [verts, verts_color, zcols]
        if verts_image is not None:
            cols.append(jnp.transpose(verts_image, (1, 0, 2))
                        .reshape(-1, 2 * b))                     # (P, 2B)
        vtab = jnp.concatenate(cols, axis=1)
        fv = vtab[vid].reshape(f, 3, 6 + extra)
        v9 = fv[:, :, 0:3].reshape(f, 9)
        c9 = fv[:, :, 3:6].reshape(f, 9)
        z = jnp.transpose(fv[:, :, 6:6 + b], (2, 0, 1))          # (B, F, 3)
        if verts_image is None:
            return v9, c9, z
        fv_img = jnp.transpose(
            fv[:, :, 6 + b:].reshape(f, 3, b, 2), (2, 0, 1, 3)
        )                                                        # (B, F, 3, 2)
        return v9, c9, z, fv_img
    if b <= 10:
        vtab = jnp.concatenate([verts, verts_color, zcols], axis=1)
        fv = vtab[vid].reshape(f, 3, 6 + b)
        v9 = fv[:, :, 0:3].reshape(f, 9)
        c9 = fv[:, :, 3:6].reshape(f, 9)
        z = jnp.transpose(fv[:, :, 6:], (2, 0, 1))
    else:
        vtab = jnp.concatenate([verts, verts_color], axis=1)
        fv = vtab[vid].reshape(f, 3, 6)
        v9 = fv[:, :, 0:3].reshape(f, 9)
        c9 = fv[:, :, 3:6].reshape(f, 9)
        zs = [zcols[:, k:k + 16][vid] for k in range(0, b, 16)]
        z = jnp.transpose(
            jnp.concatenate(zs, axis=1).reshape(f, 3, b), (2, 0, 1)
        )
    if verts_image is None:
        return v9, c9, z
    imgcols = jnp.transpose(verts_image, (1, 0, 2)).reshape(-1, 2 * b)
    gs = [imgcols[:, k:k + 16][vid] for k in range(0, 2 * b, 16)]
    fv_img = jnp.transpose(
        jnp.concatenate(gs, axis=1).reshape(f, 3, b, 2), (2, 0, 1, 3)
    )
    return v9, c9, z, fv_img


def build_face_table_from_corners(
    v9,              # (F, 9) world corners
    c9,              # (F, 9) corner colors
    z,               # (B, F, 3) corner NDC depths
    faces_opacity,   # (F,)
    faces_intense,   # (B, F)
    aa_face_verts,   # (B, F, 3, 2)
    interpret: bool = False,
):
    """Per-(batch, face) record table as separate CONTIGUOUS split arrays.

    Column layout across the splits matches the REC_* constants:
    [v 0:9 | c 9:18 | op 18 | in 19 | z 20:23 | aa 23:29].
    """
    b, f = faces_intense.shape
    op = jnp.broadcast_to(faces_opacity[None, :, None], (b, f, 1))
    it = faces_intense[:, :, None]
    aa = aa_face_verts.reshape(b, f, 6)
    vb = jnp.broadcast_to(v9[None], (b, f, 9))
    cb = jnp.broadcast_to(c9[None], (b, f, 9))
    parts = [vb, cb, op, it, z, aa]

    def cols(lo, hi):
        out, pos = [], 0
        for part in parts:
            w = part.shape[2]
            s, e = max(lo - pos, 0), min(hi - pos, w)
            if s < e:
                out.append(part[:, :, s:e])
            pos += w
        return jnp.concatenate(out, axis=2).reshape(b * f, hi - lo)

    # Each split goes through an opaque Pallas copy: optimization_barrier
    # alone does NOT stop XLA from decomposing the downstream row gather
    # back into per-piece gathers of this concat (including catastrophic
    # width-1 gathers for opacity/intensity) -- measured +88 ms vs gathering
    # from true contiguous tables (micro_packparts.py; materialize
    # docstring).
    splits, pos = [], 0
    for w in _TABLE_SPLITS:
        splits.append(materialize(cols(pos, pos + w), interpret=interpret))
        pos += w
    return tuple(splits)


def build_face_table(
    verts,           # (P, 3)
    faces,           # (F, 3) int32
    verts_color,     # (P, 3)
    faces_opacity,   # (F,)
    verts_ndc,       # (B, P, 3)
    faces_intense,   # (B, F)
    aa_face_verts,   # (B, F, 3, 2)
    interpret: bool = False,
):
    """:func:`build_face_table_from_corners` with the corner gather included."""
    v9, c9, z = gather_face_corners(verts, verts_color, verts_ndc, faces)
    return build_face_table_from_corners(
        v9, c9, z, faces_opacity, faces_intense, aa_face_verts,
        interpret=interpret,
    )


def gather_stream(face_table, entry_bf):
    """(R,) sorted entries -> (R/128, 32, 128) field-major DMA blocks.

    Narrow contiguous row gathers from the split tables (sentinel entries
    read row 0 and are masked by tile_counts in the kernels), emitted in the
    blocked field-major layout the kernels DMA.
    """
    r = entry_bf.shape[0]
    nb = r // STREAM_BLOCK
    safe = jnp.minimum(entry_bf, face_table[0].shape[0] - 1)
    parts = [t[safe] for t in face_table]
    width = sum(t.shape[1] for t in face_table)
    pad = jnp.zeros((r, FACE_RECORD_WIDTH - width), parts[0].dtype)
    rows = jnp.concatenate(parts + [pad], axis=1)
    return rows.reshape(nb, STREAM_BLOCK, FACE_RECORD_WIDTH).transpose(0, 2, 1)


def pack_face_stream(
    entry_bf,        # (R,) int32 sorted entries (sentinel = B*F)
    verts,           # (P, 3)
    faces,           # (F, 3) int32
    verts_color,     # (P, 3)
    faces_opacity,   # (F,)
    verts_ndc,       # (B, P, 3)
    faces_intense,   # (B, F)
    aa_face_verts,   # (B, F, 3, 2)
    interpret: bool = False,
):
    """Gather per-entry face records into (R/128, 32, 128) DMA blocks."""
    table = build_face_table(
        verts, faces, verts_color, faces_opacity, verts_ndc, faces_intense,
        aa_face_verts, interpret=interpret,
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
