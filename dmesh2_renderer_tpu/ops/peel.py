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
streaming pass* over the tile's face list: each pixel keeps an L-slot
insertion network of the smallest intersection parameters t >= 0 (a
branch-free min/max cascade per face, vectorized over the 256-pixel lane
axis). No adjacency chasing, no serial walk; ``tets/face_tets/tet_faces``
remain in the API for signature parity (``__init__.py:404-416``).

Known deviations (documented): rays that the reference aborts mid-walk on
numerical inconsistencies (forward.cu:892-896, 917-981 ``done`` guards) or
that start in a boundary configuration with no incident tet are peeled
robustly here; layer sets can differ on such degenerate rays only.
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

_INF = jnp.float32(3.0e38)


def pack_peel_stream(entry_bf, verts, faces, faces_existence):
    """Gather (R, 16) peel records from sorted entries (sentinel = B*F)."""
    f = faces.shape[0]
    r = entry_bf.shape[0]
    fi = entry_bf % f  # sentinel rows map to face 0; never read (masked by counts)
    v = verts[faces[fi]].reshape(r, 9)
    exist = faces_existence[fi].astype(v.dtype)[:, None]
    fid = fi.astype(v.dtype)[:, None]
    pad = jnp.zeros((r, PREC_WIDTH - 11), v.dtype)
    return jnp.concatenate([v, exist, fid, pad], axis=1)


def _peel_kernel(
    starts_ref, counts_ref,
    stream_ref,    # (R + C, 16) ANY
    ray_o_ref,     # (B, 4) VMEM
    ray_d_ref,     # (1, 4, 256) VMEM block
    out_ref,       # (1, L + 1, 256) VMEM block
    buf_ref,       # (C, 16) VMEM
    sem,
    *,
    tiles_per_batch: int,
    chunk: int,
    num_layers: int,
):
    t = pl.program_id(0)
    b = t // tiles_per_batch
    start = starts_ref[t]
    count = counts_ref[t]

    rdx = ray_d_ref[0, 0:1, :]
    rdy = ray_d_ref[0, 1:2, :]
    rdz = ray_d_ref[0, 2:3, :]
    ox = ray_o_ref[b, 0]
    oy = ray_o_ref[b, 1]
    oz = ray_o_ref[b, 2]

    nchunks = pl.cdiv(count, chunk)
    neg1 = jnp.full((1, TILE_PIXELS), -1.0, jnp.float32)
    inf = jnp.full((1, TILE_PIXELS), _INF, jnp.float32)

    def chunk_body(i, slots):
        copy = pltpu.make_async_copy(
            stream_ref.at[pl.ds(start + i * chunk, chunk), :], buf_ref, sem
        )
        copy.start()
        copy.wait()
        buf = buf_ref[:, :]
        n_valid = count - i * chunk

        def face_body(j, slots):
            slot_t, slot_id = slots
            row = buf[pl.ds(j, 1), :]  # (1, 16)
            v0x, v0y, v0z = row[0, 0], row[0, 1], row[0, 2]
            v1x, v1y, v1z = row[0, 3], row[0, 4], row[0, 5]
            v2x, v2y, v2z = row[0, 6], row[0, 7], row[0, 8]
            exist = row[0, PREC_EXIST]
            fid = row[0, PREC_FID]

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
                & (exist > 0.0) & (j < n_valid)
            )
            carry_t = jnp.where(valid, tt, inf)
            carry_id = jnp.where(valid, fid, -1.0)

            new_t, new_id = [], []
            for k in range(num_layers):
                take = carry_t < slot_t[k]
                nt = jnp.where(take, carry_t, slot_t[k])
                ni = jnp.where(take, carry_id, slot_id[k])
                carry_t = jnp.where(take, slot_t[k], carry_t)
                carry_id = jnp.where(take, slot_id[k], carry_id)
                new_t.append(nt)
                new_id.append(ni)
            return tuple(new_t), tuple(new_id)

        return jax.lax.fori_loop(0, chunk, face_body, slots)

    slot_t = tuple(inf for _ in range(num_layers))
    slot_id = tuple(neg1 for _ in range(num_layers))
    slot_t, slot_id = jax.lax.fori_loop(0, nchunks, chunk_body, (slot_t, slot_id))

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

    stream = jnp.concatenate(
        [peel_stream, jnp.zeros((chunk, PREC_WIDTH), peel_stream.dtype)], axis=0
    )
    ray_d_t = tile_rays(ray_d, gx, gy)
    ray_o4 = jnp.concatenate([ray_o_cam, jnp.zeros((b, 1), ray_o_cam.dtype)], axis=1)

    kernel = functools.partial(
        _peel_kernel, tiles_per_batch=gx * gy, chunk=chunk, num_layers=num_layers
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_total,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, TILE_PIXELS), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, num_layers + 1, TILE_PIXELS),
                               lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((chunk, PREC_WIDTH), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_total, num_layers + 1, TILE_PIXELS), jnp.float32),
        interpret=interpret,
    )(tile_starts, tile_counts, stream, ray_o4, ray_d_t)

    layers = jnp.stack(
        [untile(out[:, k, :], b, h, w, gx, gy) for k in range(num_layers)], axis=-1
    ).astype(jnp.int32)
    counts = untile(out[:, num_layers, :], b, h, w, gx, gy).astype(jnp.int32)
    return layers, counts
