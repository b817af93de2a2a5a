"""Depth peeling: exact per-ray face layers (the LayeredRenderer backend).

The CUDA reference computes, per pixel ray, the IDs of the first L existing
faces it crosses by (1) a closest-hit scan over the min-depth-sorted tile
list (``firstIntersectCUDA``, forward.cu:538-709) and (2) a serial
pointer-chasing walk through the tetrahedral grid (``generateRenderLayersCUDA``,
forward.cu:744-1000) -- per-pixel data-dependent global-memory chasing that is
maximally TPU-hostile.

TPU redesign: the tet walk enumerates exactly the existing faces the ray
intersects, in ray-parameter order (every face crossed between entry and the
L-th existing face). So the same output contract is computed with a *single
streaming pass* over the tile's face list: per chunk, Moller-Trumbore runs
vectorized over all (C, 256) (face, pixel) pairs, then the L smallest hit
parameters are extracted with L successive masked min-reductions over the
face axis (argmin recovered by value-matching) and merged into the carried
L-slot ordering by a branch-free insertion cascade. No adjacency chasing, no
serial per-face walk; ``tets/face_tets/tet_faces`` remain in the API for
signature parity (``__init__.py:404-416``).

Known deviations (documented, tested): the reference walk's output is
always a LEADING PREFIX of this peel's output -- both record existing-face
hits in ascending ray parameter; the walk just stops early in three cases
where the peel keeps going:

  1. **Grid boundary** (forward.cu:983-989): when the ray exits the tet
     grid, the walk records the exit face and halts. On a CONVEX grid the
     prefix is the whole sequence (every hit lies between entry and exit),
     so walk == peel. On a NON-CONVEX or partial grid (deleted tets, kept
     faces) a ray can exit and RE-ENTER; the walk misses every hit after
     the first exit while the peel records them. This is the one real
     semantic divergence; ``tests/test_peel.py::
     test_peel_vs_tet_walk_nonconvex_divergence_is_prefix_only`` proves it
     is confined to prefix truncation against a numpy port of the walk
     (``tests/_tet_walk_oracle.py``).
  2. **Numeric guards** (forward.cu:892-896, 917-922, 977-981): degenerate
     rays the walk aborts mid-traversal are peeled robustly here.
  3. **No incident start tet** (forward.cu:684-708 finds none): the walk
     records at most the first face; the peel is unaffected.

Additionally, two *distinct* faces hit at bit-identical t collapse to one
layer (measure-zero; the same face never appears twice in one tile list).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmesh2_renderer_tpu.utils.config import TILE_PIXELS, TILE_X, TILE_Y

# Peel face-record layout (16 f32 words).
PREC_V = 0       # [0:9) v0 v1 v2 xyz
PREC_EXIST = 9   # existence flag
PREC_FID = 10    # face id (exact in f32 for F < 2^24)
PREC_WIDTH = 16

_INF = 3.0e38  # python float: jnp scalars here would be captured as consts


def pack_peel_stream(entry_bf, verts, faces, faces_existence):
    """Gather peel records into (NB, 16, 128) field-major DMA blocks."""
    from dmesh2_renderer_tpu.ops.binning import block_stream

    f = faces.shape[0]
    r = entry_bf.shape[0]
    fi = entry_bf % f  # sentinel rows map to face 0; never read (masked by counts)
    v = verts[faces[fi]].reshape(r, 9)
    exist = faces_existence[fi].astype(v.dtype)[:, None]
    fid = fi.astype(v.dtype)[:, None]
    pad = jnp.zeros((r, PREC_WIDTH - 11), v.dtype)
    return block_stream(jnp.concatenate([v, exist, fid, pad], axis=1))


def _pcol(buf, idx):
    """(C, 1) column of the peel-record chunk."""
    return buf[:, idx:idx + 1]


def _peel_kernel(
    starts_ref, counts_ref, ray_o_ref,
    stream_ref,    # (NB, 16, 128) HBM field-major blocks
    ray_d_ref,     # (1, 4, 256) VMEM block
    out_ref,       # (1, L + 1, 256) VMEM block
    buf_ref,       # (16, 128) VMEM: one field-major block
    sem,
    *,
    tiles_per_batch: int,
    chunk: int,
    num_layers: int,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    blk0 = start // chunk
    h0 = start - blk0 * chunk  # head rows in the first block: previous tile

    t_b = t // tiles_per_batch
    rdx = ray_d_ref[0, 0:1, :]
    rdy = ray_d_ref[0, 1:2, :]
    rdz = ray_d_ref[0, 2:3, :]
    ox = ray_o_ref[3 * t_b]
    oy = ray_o_ref[3 * t_b + 1]
    oz = ray_o_ref[3 * t_b + 2]

    nblocks = pl.cdiv(count + h0, chunk)
    neg1 = jnp.full((1, TILE_PIXELS), -1.0, jnp.float32)
    inf = jnp.full((1, TILE_PIXELS), _INF, jnp.float32)

    def chunk_body(i, slots):
        slot_t, slot_id = slots
        copy = pltpu.make_async_copy(stream_ref.at[blk0 + i], buf_ref, sem)
        copy.start()
        copy.wait()
        buf = buf_ref[:, :].T
        rank = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) + (i * chunk - h0)

        # Moller-Trumbore vectorized over all (face, pixel) pairs.
        v0x, v0y, v0z = _pcol(buf, 0), _pcol(buf, 1), _pcol(buf, 2)
        v1x, v1y, v1z = _pcol(buf, 3), _pcol(buf, 4), _pcol(buf, 5)
        v2x, v2y, v2z = _pcol(buf, 6), _pcol(buf, 7), _pcol(buf, 8)
        exist = _pcol(buf, PREC_EXIST)
        fid = _pcol(buf, PREC_FID)

        e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
        e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
        t0x, t0y, t0z = ox - v0x, oy - v0y, oz - v0z
        pvx = rdy * e2z - rdz * e2y
        pvy = rdz * e2x - rdx * e2z
        pvz = rdx * e2y - rdy * e2x
        qvx = t0y * e1z - t0z * e1y
        qvy = t0z * e1x - t0x * e1z
        qvz = t0x * e1y - t0y * e1x
        denom = pvx * e1x + pvy * e1y + pvz * e1z
        ok = denom != 0.0
        inv = 1.0 / jnp.where(ok, denom, 1.0)
        tt = (qvx * e2x + qvy * e2y + qvz * e2z) * inv
        u = (pvx * t0x + pvy * t0y + pvz * t0z) * inv
        v = (qvx * rdx + qvy * rdy + qvz * rdz) * inv
        # exact hit test of firstIntersectCUDA (forward.cu:667) + existence
        valid = (
            ok & (tt >= 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (exist > 0.0) & (rank >= 0) & (rank < count)
        )
        tt = jnp.where(valid, tt, _INF)      # (C, N)
        fidb = fid + 0.0 * tt                # (C, N) broadcast face ids

        # Extract the chunk's L smallest hits per pixel with successive
        # masked min-reductions, merging each into the carried slots.
        thresh = jnp.full((1, TILE_PIXELS), -1.0, jnp.float32)
        for _k in range(num_layers):
            cand = jnp.where(tt > thresh, tt, _INF)
            m = jnp.min(cand, axis=0, keepdims=True)           # (1, N)
            hit = m < _INF
            sel = (cand == m) & hit
            mid = jnp.max(jnp.where(sel, fidb, -1.0), axis=0, keepdims=True)
            thresh = jnp.where(hit, m, thresh)
            # branch-free insertion of (m, mid) into the sorted slots
            carry_t = jnp.where(hit, m, inf)
            carry_id = jnp.where(hit, mid, neg1)
            new_t, new_id = [], []
            for k in range(num_layers):
                take = carry_t < slot_t[k]
                nt = jnp.where(take, carry_t, slot_t[k])
                ni = jnp.where(take, carry_id, slot_id[k])
                carry_t = jnp.where(take, slot_t[k], carry_t)
                carry_id = jnp.where(take, slot_id[k], carry_id)
                new_t.append(nt)
                new_id.append(ni)
            slot_t, slot_id = tuple(new_t), tuple(new_id)
        return slot_t, slot_id

    slot_t = tuple(inf for _ in range(num_layers))
    slot_id = tuple(neg1 for _ in range(num_layers))
    slot_t, slot_id = jax.lax.fori_loop(0, nblocks, chunk_body, (slot_t, slot_id))

    cnt = jnp.zeros((1, TILE_PIXELS), jnp.float32)
    for k in range(num_layers):
        cnt = cnt + (slot_t[k] < _INF).astype(jnp.float32)
    out_ref[0, :, :] = jnp.concatenate(list(slot_id) + [cnt], axis=0)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "num_layers", "chunk", "interpret")
)
def peel_layers(
    peel_stream,   # (R, 16)
    tile_starts,   # (T_total,)
    tile_counts,   # (T_total,)
    ray_o_cam,     # (B, 3)
    ray_d,         # (B, H, W, 3)
    width: int,
    height: int,
    num_layers: int,
    chunk: int = 128,
    interpret: bool = False,
):
    """Returns (render_layers (B, H, W, L) int32, counts (B, H, W) int32)."""
    from dmesh2_renderer_tpu.ops.pallas_fwd import tile_rays, untile

    b, h, w, _ = ray_d.shape
    gx = -(-width // TILE_X)
    gy = -(-height // TILE_Y)
    t_total = b * gx * gy

    assert chunk == peel_stream.shape[2], "chunk must equal STREAM_BLOCK"
    stream = peel_stream
    ray_d_t = tile_rays(ray_d, gx, gy)
    ray_o_flat = ray_o_cam.reshape(-1).astype(jnp.float32)

    kernel = functools.partial(
        _peel_kernel, tiles_per_batch=gx * gy, chunk=chunk, num_layers=num_layers
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_total,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 4, TILE_PIXELS), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, num_layers + 1, TILE_PIXELS),
                               lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((PREC_WIDTH, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_total, num_layers + 1, TILE_PIXELS), jnp.float32),
        interpret=interpret,
    )(tile_starts, tile_counts, ray_o_flat, stream, ray_d_t)

    layers = jnp.stack(
        [untile(out[:, k, :], b, h, w, gx, gy) for k in range(num_layers)], axis=-1
    ).astype(jnp.int32)
    counts = untile(out[:, num_layers, :], b, h, w, gx, gy).astype(jnp.int32)
    return layers, counts
