"""Pallas forward compositing kernel (the hot loop of the renderer).

TPU-native counterpart of the CUDA tile compositor ``renderCUDA<3>``
(``cuda_impl/forward.cu:139-432``). Design mapping:

  CUDA                                  TPU (this kernel)
  ------------------------------------  -----------------------------------
  one 16x16 thread block per tile       one grid program per tile; the 256
                                        pixels ride the 256-lane axis of
                                        (1, 256) vectors
  shared-memory staging of 256 faces    chunked async DMA of pre-gathered
  (forward.cu:228-304)                  (C, 32) face records HBM -> VMEM
  per-thread sequential blend loop      per-chunk vectorized (C, 256) alpha /
                                        color evaluation + a log2(C)-step
                                        prefix-product blend scan (front-to-
                                        back compositing is associative:
                                        T_i = prod_{k<i}(1 - a_k), so the
                                        whole chunk blends in ~7 vector ops
                                        instead of a C-step serial loop)
  __syncthreads_count early exit        whole-chunk skip: the chunk while-loop
  (forward.cu:258)                      stops when every lane has T < 1e-4
  data-dependent list length            scalar-prefetched (start, count) per
  (ranges, renderer.cu:223)             tile; dynamic-trip-count while loop

Outputs are packed tile-major as (T_total, 8, 256) f32 rows
[r, g, b, depth, final_T, final_prev_T, n_contrib, pad] so that every store
is a full aligned vector row; the XLA wrapper untiles to (B, H, W, .).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmesh2_renderer_tpu.aa import tri_box_overlap_area_xy
from dmesh2_renderer_tpu.geometry import clamp_bary_uv
from dmesh2_renderer_tpu.utils.config import (
    FACE_RECORD_WIDTH,
    T_EPS,
    TILE_PIXELS,
    TILE_X,
    TILE_Y,
)
from dmesh2_renderer_tpu.ops.binning import REC_AA, REC_C, REC_IN, REC_OP, REC_V, REC_Z

# Output row indices in the packed (8, 256) tile result.
OUT_R, OUT_G, OUT_B, OUT_D, OUT_T, OUT_PT, OUT_NC = range(7)


def _col(buf, idx):
    """(C, 1) column of the face-record chunk."""
    return buf[:, idx][:, None]


class ChunkQuantities(NamedTuple):
    """Per-(face, pixel) blending quantities for one face chunk.

    All arrays are (C, N) f32 unless noted. Unused fields are dead-code
    eliminated by XLA, so the forward kernel pays nothing for the extras the
    backward kernel needs.
    """

    passes: jnp.ndarray    # 1.0 where the face passes every skip test
    alpha: jnp.ndarray     # opacity * coverage ratio (already masked)
    ratio: jnp.ndarray     # coverage ratio (AA-temperature mix)
    oarea: jnp.ndarray     # raw AA overlap area (0 when tau == 0)
    code: jnp.ndarray      # int32 barycentric clamp region code
    uc: jnp.ndarray        # clamped barycentrics
    vc: jnp.ndarray
    u: jnp.ndarray         # unclamped Moller-Trumbore barycentrics
    v: jnp.ndarray
    inv: jnp.ndarray       # 1 / MT denominator (den = rd . (e2 x e1))
    ic_r: jnp.ndarray      # interpolated color * intensity
    ic_g: jnp.ndarray
    ic_b: jnp.ndarray
    m_r: jnp.ndarray       # interpolated color without intensity
    m_g: jnp.ndarray
    m_b: jnp.ndarray
    i_d: jnp.ndarray       # interpolated NDC depth


def chunk_face_quantities(buf, rank0, count, rdx, rdy, rdz, ox, oy, oz,
                          px0, py0, aa_temperature) -> ChunkQuantities:
    """Vectorized per-(face, pixel) blending quantities for one chunk.

    Args:
      buf: (C, 32) face records.
      rank0: scalar rank (index within this tile's entry list) of row 0;
        may be negative in a tile's first block (unaligned tile starts --
        head rows belong to the previous tile).
      count: scalar tile entry count; rows with rank outside [0, count)
        are masked out.
      rdx, rdy, rdz: (1, N) ray directions.
      ox, oy, oz: scalar ray origin (camera position for this batch).
      px0, py0: (1, N) pixel box min corner in image coordinates.
      aa_temperature: static python float.

    ``passes`` is 1.0 on faces that pass every skip test of forward.cu
    (AA area, MT validity, bbox, nonzero coverage) and 0.0 otherwise.
    """
    c = buf.shape[0]
    dt = buf.dtype
    rank = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0) + rank0
    in_range = ((rank >= 0) & (rank < count)).astype(dt)

    v0x, v0y, v0z = _col(buf, REC_V + 0), _col(buf, REC_V + 1), _col(buf, REC_V + 2)
    v1x, v1y, v1z = _col(buf, REC_V + 3), _col(buf, REC_V + 4), _col(buf, REC_V + 5)
    v2x, v2y, v2z = _col(buf, REC_V + 6), _col(buf, REC_V + 7), _col(buf, REC_V + 8)

    # Moller-Trumbore (auxiliary.h:212-243), factored through scalar triple
    # products: den = (rd x e2).e1 = rd.(e2 x e1), u_num = (rd x e2).t0 =
    # rd.(e2 x t0), v_num = (t0 x e1).rd. All three cross products are then
    # pixel-INDEPENDENT (C, 1) columns and only the three dots against rd
    # touch (C, N) -- ~19 VPU ops/(face,pixel) instead of ~35 for the
    # textbook order (pv = rd x e2 alone is 18 (C, N) ops). Same quantities
    # to f32 rounding; the backward kernel's factored Jacobian
    # (pallas_bwd.py) was already derived in this basis.
    e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
    e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
    t0x, t0y, t0z = ox - v0x, oy - v0y, oz - v0z
    nx = e2y * e1z - e2z * e1y
    ny = e2z * e1x - e2x * e1z
    nz = e2x * e1y - e2y * e1x
    mx = e2y * t0z - e2z * t0y
    my = e2z * t0x - e2x * t0z
    mz = e2x * t0y - e2y * t0x
    qvx = t0y * e1z - t0z * e1y
    qvy = t0z * e1x - t0x * e1z
    qvz = t0x * e1y - t0y * e1x
    denom = nx * rdx + ny * rdy + nz * rdz
    mt_ok = denom != 0.0
    inv = 1.0 / jnp.where(mt_ok, denom, 1.0)
    u = (mx * rdx + my * rdy + mz * rdz) * inv
    v = (qvx * rdx + qvy * rdy + qvz * rdz) * inv

    uc, vc, code = clamp_bary_uv(u, v)
    inside = (code == 0).astype(dt)

    # Per-pixel face-bbox rejection (see ops/reference.py for rationale:
    # matches aa.h:476 and prunes backward-ray phantom hits).
    ax0, ay0 = _col(buf, REC_AA + 0), _col(buf, REC_AA + 1)
    ax1, ay1 = _col(buf, REC_AA + 2), _col(buf, REC_AA + 3)
    ax2, ay2 = _col(buf, REC_AA + 4), _col(buf, REC_AA + 5)
    txmin = jnp.minimum(jnp.minimum(ax0, ax1), ax2)
    txmax = jnp.maximum(jnp.maximum(ax0, ax1), ax2)
    tymin = jnp.minimum(jnp.minimum(ay0, ay1), ay2)
    tymax = jnp.maximum(jnp.maximum(ay0, ay1), ay2)
    bbox_ok = (
        (px0 + 1.0 >= txmin) & (px0 <= txmax)
        & (py0 + 1.0 >= tymin) & (py0 <= tymax)
    )

    if aa_temperature > 0.0:
        oarea = tri_box_overlap_area_xy(
            ax0, ay0, ax1, ay1, ax2, ay2, px0, px0 + 1.0, py0, py0 + 1.0
        )
        aa_ok = oarea > 0.0
        ratio = (1.0 - aa_temperature) * inside + aa_temperature * oarea
    else:
        aa_ok = jnp.ones_like(u, dtype=bool)
        ratio = inside

    passes = (
        in_range
        * mt_ok.astype(dt)
        * aa_ok.astype(dt)
        * bbox_ok.astype(dt)
        * (ratio != 0.0).astype(dt)
    )

    i0 = 1.0 - uc - vc
    intense = _col(buf, REC_IN)
    m_r = i0 * _col(buf, REC_C + 0) + uc * _col(buf, REC_C + 3) + vc * _col(buf, REC_C + 6)
    m_g = i0 * _col(buf, REC_C + 1) + uc * _col(buf, REC_C + 4) + vc * _col(buf, REC_C + 7)
    m_b = i0 * _col(buf, REC_C + 2) + uc * _col(buf, REC_C + 5) + vc * _col(buf, REC_C + 8)
    i_d = i0 * _col(buf, REC_Z + 0) + uc * _col(buf, REC_Z + 1) + vc * _col(buf, REC_Z + 2)

    alpha = _col(buf, REC_OP) * ratio * passes
    if aa_temperature <= 0.0:
        oarea = jnp.zeros_like(ratio)
    return ChunkQuantities(
        passes=passes, alpha=alpha, ratio=ratio, oarea=oarea, code=code,
        uc=uc, vc=vc, u=u, v=v, inv=inv,
        ic_r=m_r * intense, ic_g=m_g * intense, ic_b=m_b * intense,
        m_r=m_r, m_g=m_g, m_b=m_b, i_d=i_d,
    )


def _shift_down(x, s, fill):
    """Shift rows of (C, N) down by s; top s rows become ``fill``."""
    c = x.shape[0]
    pad = jnp.full((s, x.shape[1]), fill, x.dtype)
    return jnp.concatenate([pad, x[: c - s]], axis=0)


def _cumprod_incl(x):
    """Inclusive prefix product along axis 0 (Hillis-Steele, log2 C steps)."""
    s = 1
    while s < x.shape[0]:
        x = x * _shift_down(x, s, 1.0)
        s *= 2
    return x


def _cumsum_incl(x):
    """Inclusive prefix sum along axis 0 (Hillis-Steele, log2 C steps)."""
    s = 1
    while s < x.shape[0]:
        x = x + _shift_down(x, s, 0.0)
        s *= 2
    return x


def blend_scan(passes, alpha, t_in):
    """Front-to-back blending of one chunk as a prefix-product scan.

    Sequential semantics being reproduced (forward.cu:398-416): face j blends
    iff it passes and the running transmittance T_j (before it) is >= T_EPS;
    then T *= (1 - a_j). Because a_j in [0, 1] makes the *unmasked* prefix
    product monotonically non-increasing, the first row where it drops below
    T_EPS is exactly the sequential freeze point, so the unmasked prefix
    equals the sequential ("frozen") transmittance at every active row -- the
    freeze never has to be simulated.

    Args:
      passes: (C, N) 0/1 skip-test mask (already folded into alpha too).
      alpha:  (C, N) per-face alpha, zero where not passing.
      t_in:   (1, N) carried transmittance entering the chunk.

    Returns (tb, active, a_eff, w, t_out):
      tb:     (C, N) transmittance before each face (valid at active rows).
      active: (C, N) bool, face actually blended.
      a_eff:  (C, N) alpha where active else 0.
      w:      (C, N) blend weight a_eff * tb.
      t_out:  (1, N) transmittance leaving the chunk.
    """
    p_excl = _shift_down(_cumprod_incl(1.0 - alpha), 1, 1.0)
    tb = t_in * p_excl
    active = (passes > 0.0) & (tb >= T_EPS)
    a_eff = jnp.where(active, alpha, 0.0)
    w = a_eff * tb
    # Frozen exit transmittance: T after the last active face (min of the
    # per-active-row post-blend values; t_in when nothing blended).
    cand = jnp.where(active, tb * (1.0 - alpha), t_in)
    t_out = jnp.min(cand, axis=0, keepdims=True)
    return tb, active, a_eff, w, t_out


def _fwd_kernel(
    # scalar prefetch
    starts_ref, counts_ref, pm_ref, ray_o_ref,
    # inputs
    stream_ref,   # (NB, 32, 128) HBM field-major blocks
    ray_d_ref,    # (1, 4, 256) VMEM block for this tile
    bg_ref,       # (1, 4) VMEM
    # outputs
    out_ref,      # (1, 8, 256) VMEM block
    # scratch
    buf_ref,      # (32, 128) VMEM: one field-major block
    sem,          # DMA semaphore
    *,
    grid_x: int,
    grid_y: int,
    chunk: int,
    aa_temperature: float,
    subchunks: int = 1,
):
    t = pl.program_id(0)
    tiles_per_batch = grid_x * grid_y
    b = t // tiles_per_batch
    rem = t - b * tiles_per_batch
    ty = rem // grid_x
    tx = rem - ty * grid_x

    start = starts_ref[t]
    count = counts_ref[t]
    blk0 = start // chunk
    h0 = start - blk0 * chunk  # head rows in the first block: previous tile

    # Pixel box min corners in image coordinates (forward.cu:319-323).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIXELS), 1)
    xx = lane % TILE_X
    yy = lane // TILE_X
    px0 = (pm_ref[2 * b] + tx * TILE_X + xx).astype(jnp.float32)
    py0 = (pm_ref[2 * b + 1] + ty * TILE_Y + yy).astype(jnp.float32)

    rdx = ray_d_ref[0, 0:1, :]
    rdy = ray_d_ref[0, 1:2, :]
    rdz = ray_d_ref[0, 2:3, :]
    ox = ray_o_ref[3 * b]
    oy = ray_o_ref[3 * b + 1]
    oz = ray_o_ref[3 * b + 2]

    nblocks = pl.cdiv(count + h0, chunk)
    # The loop walks chunk/subchunks-entry PIECES of each 128-entry block:
    # the whole-tile early exit and the tile-tail cutoff then act at piece
    # granularity, trimming the ~1.5x pair overshoot of full blocks
    # (docs/DESIGN.md roofline, lever 2). DMA stays whole-block.
    sub = chunk // subchunks
    nsteps = pl.cdiv(count + h0, sub)

    # Double-buffered stream DMA: block k+1 is in flight while block k is
    # composited (the TPU analogue of the reference's two-phase shared-mem
    # staging, forward.cu:255-304).
    def get_dma(slot, k):
        return pltpu.make_async_copy(
            stream_ref.at[blk0 + k], buf_ref.at[slot], sem.at[slot]
        )

    @pl.when(nblocks > 0)
    def _():
        get_dma(0, 0).start()

    def chunk_body(state):
        i, t_run, pt_run, cr, cg, cb, cd, nc = state
        kb = i // subchunks           # block index
        part = i - kb * subchunks     # piece within the block
        slot = jax.lax.rem(kb, 2)

        @pl.when((part == 0) & (kb + 1 < nblocks))
        def _():
            get_dma(jax.lax.rem(kb + 1, 2), kb + 1).start()

        @pl.when(part == 0)
        def _():
            get_dma(slot, kb).wait()
        rank0 = i * sub - h0

        buf = buf_ref[slot]
        if subchunks == 1:
            piece = buf
        else:
            # Static lane slices selected by the (scalar) piece index:
            # Mosaic has no dynamic lane slicing, and the selects are cheap
            # next to the per-piece math.
            piece = buf[:, 0:sub]
            for j in range(1, subchunks):
                piece = jnp.where(part == j, buf[:, j * sub:(j + 1) * sub],
                                  piece)
        q = chunk_face_quantities(
            piece.T, rank0, count, rdx, rdy, rdz, ox, oy, oz,
            px0, py0, aa_temperature,
        )
        tb, active, _a_eff, w, t_out = blend_scan(q.passes, q.alpha, t_run)
        cr = cr + jnp.sum(q.ic_r * w, axis=0, keepdims=True)
        cg = cg + jnp.sum(q.ic_g * w, axis=0, keepdims=True)
        cb = cb + jnp.sum(q.ic_b * w, axis=0, keepdims=True)
        cd = cd + jnp.sum(q.i_d * w, axis=0, keepdims=True)
        # prev_T = T before the last blended face (backward.cu:396-401).
        m = jnp.min(jnp.where(active, tb, 2.0), axis=0, keepdims=True)
        pt_run = jnp.where(m < 1.5, m, pt_run)
        # n_contrib = 1-based rank of the last blended face.
        rowf = (
            jax.lax.broadcasted_iota(jnp.int32, active.shape, 0).astype(jnp.float32)
            + (rank0 + 1).astype(jnp.float32)
        )
        nc = jnp.maximum(
            nc, jnp.max(jnp.where(active, rowf, 0.0), axis=0, keepdims=True)
        )
        return i + 1, t_out, pt_run, cr, cg, cb, cd, nc

    def chunk_cond(state):
        i, t_run = state[0], state[1]
        return (i < nsteps) & (jnp.max(t_run) >= T_EPS)

    zeros = jnp.zeros((1, TILE_PIXELS), dtype=jnp.float32)
    ones = jnp.ones((1, TILE_PIXELS), dtype=jnp.float32)
    i_end, t_run, pt_run, cr, cg, cb, cd, nc = jax.lax.while_loop(
        chunk_cond, chunk_body, (0, ones, ones, zeros, zeros, zeros, zeros, zeros)
    )

    # Early exit can leave one block's prefetch in flight; drain it so the
    # semaphore is clean for the next grid step (scratch persists). The last
    # WAITED block is (i_end-1)//subchunks; the last STARTED prefetch is one
    # past it (started at that block's part-0 step); i_end == 0 means only
    # the pre-loop prefetch of block 0 is outstanding.
    drain = jnp.where(i_end == 0, 0, (i_end - 1) // subchunks + 1)

    @pl.when(drain < nblocks)
    def _():
        get_dma(jax.lax.rem(drain, 2), drain).wait()

    # Background composite (forward.cu:427-428).
    out_ref[0, :, :] = jnp.concatenate(
        [
            cr + t_run * bg_ref[0:1, 0:1],
            cg + t_run * bg_ref[0:1, 1:2],
            cb + t_run * bg_ref[0:1, 2:3],
            cd + t_run * 1.0,
            t_run,
            pt_run,
            nc,
            zeros,
        ],
        axis=0,
    )


def tile_pack(planes, grid_x, grid_y, rows=None):
    """Pack per-pixel planes tile-major: [(B, H, W)] -> (B*gy*gx, k, 256).

    Lane l of tile (b, ty, tx) is pixel (ty*16 + l//16, tx*16 + l%16); pads
    the image up to the tile grid and the row count up to ``rows``.
    """
    b, h, w = planes[0].shape
    hp, wp = grid_y * TILE_Y, grid_x * TILE_X
    stack = jnp.stack(planes, axis=-1)  # (B, H, W, k)
    k = stack.shape[-1]
    pad = jnp.zeros((b, hp, wp, k), stack.dtype).at[:, :h, :w, :].set(stack)
    tiled = pad.reshape(b, grid_y, TILE_Y, grid_x, TILE_X, k)
    tiled = tiled.transpose(0, 1, 3, 5, 2, 4).reshape(b * grid_y * grid_x, k, TILE_PIXELS)
    if rows is not None and rows > k:
        padrow = jnp.zeros((tiled.shape[0], rows - k, TILE_PIXELS), stack.dtype)
        tiled = jnp.concatenate([tiled, padrow], axis=1)
    return tiled


def tile_rays(ray_d, grid_x, grid_y):
    """(B, H, W, 3) -> (B*gy*gx, 4, 256) tile-major ray directions."""
    return tile_pack(
        [ray_d[..., 0], ray_d[..., 1], ray_d[..., 2]], grid_x, grid_y, rows=4
    )


def untile(packed_rows, b, h, w, grid_x, grid_y):
    """(T_total, 256) tile-major rows -> (B, H, W)."""
    x = packed_rows.reshape(b, grid_y, grid_x, TILE_Y, TILE_X)
    x = x.transpose(0, 1, 3, 2, 4).reshape(b, grid_y * TILE_Y, grid_x * TILE_X)
    return x[:, :h, :w]


@functools.partial(
    jax.jit,
    static_argnames=("patch_width", "patch_height", "aa_temperature", "chunk",
                     "interpret", "subchunks"),
)
def composite_forward(
    face_stream,   # (NB, 32, 128) field-major blocks (binning.block_stream)
    tile_starts,   # (T_total,)
    tile_counts,   # (T_total,)
    ray_o_cam,     # (B, 3) camera origins
    ray_d,         # (B, H, W, 3)
    background,    # (3,)
    patch_min,     # (B, 2) int32
    patch_width: int,
    patch_height: int,
    aa_temperature: float,
    chunk: int = 128,
    interpret: bool = False,
    subchunks: int = 1,
):
    """Run the forward compositor. Returns (color, depth, final_T, prev_T,
    n_contrib, nc_tile) -- the first five shaped (B, H, W[, 3]); nc_tile is
    the (T_total,) per-tile max contributor rank, used by the backward pass
    to skip fully-saturated face blocks (the analogue of the reference's
    per-pixel n_contrib skip, backward.cu:219-221, hoisted to tile level)."""
    b, h, w, _ = ray_d.shape
    gx = -(-patch_width // TILE_X)
    gy = -(-patch_height // TILE_Y)
    t_total = b * gx * gy
    assert chunk == face_stream.shape[2], "chunk must equal STREAM_BLOCK"

    # Tile segments start UNALIGNED inside the blocked stream (binning.py);
    # kernels mask head rows via h0. Whole-block DMA stays in-bounds because
    # binning rounds capacity up to a multiple of STREAM_BLOCK.
    stream = face_stream
    ray_d_t = tile_rays(ray_d, gx, gy)
    ray_o_flat = ray_o_cam.reshape(-1).astype(jnp.float32)
    bg4 = jnp.concatenate([background, jnp.zeros((1,), background.dtype)])[None, :]
    pm_flat = patch_min.reshape(-1).astype(jnp.int32)

    kernel = functools.partial(
        _fwd_kernel,
        grid_x=gx,
        grid_y=gy,
        chunk=chunk,
        aa_temperature=aa_temperature,
        subchunks=subchunks,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(t_total,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),                        # stream
            pl.BlockSpec((1, 4, TILE_PIXELS), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),                      # ray_d tiles
            pl.BlockSpec(memory_space=pltpu.VMEM),                      # bg
        ],
        out_specs=pl.BlockSpec((1, 8, TILE_PIXELS), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, FACE_RECORD_WIDTH, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_total, 8, TILE_PIXELS), jnp.float32),
        interpret=interpret,
    )(tile_starts, tile_counts, pm_flat, ray_o_flat, stream, ray_d_t, bg4)

    color = jnp.stack(
        [untile(out[:, ch, :], b, h, w, gx, gy) for ch in (OUT_R, OUT_G, OUT_B)],
        axis=-1,
    )
    depth = untile(out[:, OUT_D, :], b, h, w, gx, gy)
    final_t = untile(out[:, OUT_T, :], b, h, w, gx, gy)
    prev_t = untile(out[:, OUT_PT, :], b, h, w, gx, gy)
    n_contrib = untile(out[:, OUT_NC, :], b, h, w, gx, gy).astype(jnp.int32)
    nc_tile = jnp.max(out[:, OUT_NC, :], axis=1).astype(jnp.int32)
    return color, depth, final_t, prev_t, n_contrib, nc_tile
