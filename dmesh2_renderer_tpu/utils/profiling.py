"""Per-stage timing / observability for the render pipeline.

The reference ships no profiling at all (SURVEY.md section 5: its only
timing aid is the always-on ``cudaDeviceSynchronize`` in CHECK_CUDA,
``auxiliary.h:433-440``). On TPU the question "where do the milliseconds
go" is answered here: :func:`profile_render` runs every pipeline stage
jitted in isolation on the caller's actual scene and returns a
stage -> milliseconds mapping, cross-checked against the end-to-end
iteration time so unattributed overhead is visible rather than hidden.

This is the library API behind ``benchmarks/profile_stages.py``.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _force(out):
    """Force a scalar host readback (block_until_ready alone is unreliable
    through remote-device tunnels)."""
    return float(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def time_jitted(fn: Callable, *args, iters: int = 5) -> tuple:
    """Jit ``fn``, warm it up, and time ``iters`` steady-state calls.

    Returns (output, milliseconds_per_call).
    """
    fn_j = jax.jit(fn)
    _force(fn_j(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn_j(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    return fn_j(*args), dt


def profile_render(
    verts,           # (P, 3)
    faces,           # (F, 3) int32
    verts_color,     # (P, 3)
    faces_opacity,   # (F,)
    faces_intense,   # (B, F)
    mv,              # (B, 4, 4)
    proj,            # (B, 4, 4)
    background,      # (3,)
    width: int,
    height: int,
    aa_temperature: float = 1.0,
    config=None,
    iters: int = 5,
    verbose: bool = False,
):
    """Time every pipeline stage of a full-frame render on this scene.

    Returns a dict with per-stage milliseconds (``prep``, ``binning``,
    ``pack``, ``fwd_kernel``, ``bwd_kernel``, ``scatter``), the end-to-end
    forward and fwd+bwd times, the unattributed remainder, and the binning
    occupancy counters (``num_rendered``, ``num_truncated``).
    """
    from dmesh2_renderer_tpu import geometry as G
    from dmesh2_renderer_tpu.functional import render
    from dmesh2_renderer_tpu.ops import reference as ref_ops
    from dmesh2_renderer_tpu.ops.binning import (
        bin_faces,
        build_face_table_from_corners,
        gather_face_corners,
        gather_stream,
    )
    from dmesh2_renderer_tpu.ops.pallas_bwd import (
        composite_backward,
        scatter_entry_grads,
    )
    from dmesh2_renderer_tpu.ops.pallas_fwd import composite_forward
    from dmesh2_renderer_tpu.utils.config import RasterConfig

    cfg = config or RasterConfig()
    tau = float(aa_temperature)
    b = mv.shape[0]
    pm = jnp.zeros((b, 2), jnp.int32)
    if cfg.vertex_sort_mode == "static":
        from dmesh2_renderer_tpu.utils.segments import static_vertex_table

        vtable = static_vertex_table(faces, verts.shape[0])
    else:
        vtable = None

    def say(name, ms):
        if verbose:
            print(f"{name:42s} {ms:9.2f} ms", flush=True)

    # The prep/pack stages mirror ops/rasterize._pipeline exactly (incl.
    # the consolidated corner gather and the fused/split prep_mode split)
    # so the stage table attributes the same computation the e2e path runs.
    def prep(verts):
        verts_ndc, verts_image = G.compute_verts_ndc_image(
            verts, mv, proj, width, height
        )
        if cfg.prep_mode == "fused":
            from dmesh2_renderer_tpu.geometry import tri_area2

            v9, c9, z, fv_img = gather_face_corners(
                verts, verts_color, verts_ndc, faces, verts_image
            )
            p0, p1, p2 = (fv_img[..., 0, :], fv_img[..., 1, :],
                          fv_img[..., 2, :])
            neg = tri_area2(p0, p1, p2) < 0.0
            q1 = jnp.where(neg[..., None], p2, p1)
            q2 = jnp.where(neg[..., None], p1, p2)
            aa_verts = jnp.stack([p0, q1, q2], axis=-2)
        else:
            aa_verts = G.face_aa_verts_ccw(verts_image, faces,
                                           cfg.max_vertex_valence, vtable)
            v9, c9, z = gather_face_corners(verts, verts_color, verts_ndc,
                                            faces)
        depth01, _, _, alive = ref_ops.face_depth01_from_z(z)
        return verts_ndc, aa_verts, depth01, alive, v9, c9, z

    (verts_ndc, aa_verts, depth01, alive, v9, c9, z), t_prep = time_jitted(
        prep, verts, iters=iters)
    say("geometry preprocess", t_prep)

    ray_o, ray_d = G.init_rays(mv, proj, width, height)
    ray_o_cam = ray_o[:, 0, 0, :]

    binning, t_bin = time_jitted(
        lambda aav, d, al: bin_faces(
            aav, d, al, pm, width, height, cfg.binning_capacity,
            cfg.max_tiles_per_face, num_giant_faces=cfg.num_giant_faces,
            giant_tiles=cfg.giant_tiles, exact_tile_cull=cfg.exact_tile_cull,
        ),
        aa_verts, depth01, alive, iters=iters)
    say("bin_faces", t_bin)

    def pack(e, v9, c9, z, aav):
        table = build_face_table_from_corners(
            v9, c9, z, faces_opacity, faces_intense, aav,
            interpret=cfg.interpret,
        )
        return gather_stream(table, e)

    stream, t_pack = time_jitted(
        pack, binning.entry_bf, v9, c9, z, aa_verts, iters=iters)
    say("pack_face_stream", t_pack)

    fwd_out, t_fwd = time_jitted(
        lambda s, st, ct: composite_forward(
            s, st, ct, ray_o_cam, ray_d, background, pm, width, height, tau,
            chunk=cfg.face_chunk, interpret=cfg.interpret,
            subchunks=cfg.fwd_subchunks),
        stream, binning.tile_starts, binning.tile_counts, iters=iters)
    color, depth, final_t, prev_t, _, nc_tile = fwd_out
    say("composite_forward", t_fwd)

    # Contributing-entry count: what grad_compact_capacity must cover (plus
    # headroom) for lossless backward compaction.
    n_contributing = int(jnp.sum(
        jnp.minimum(binning.tile_counts, jnp.maximum(nc_tile, 0))))
    say("contributing entries", float(n_contributing))

    g_color = jnp.ones_like(color)
    g_depth = jnp.ones_like(depth)
    grad_records, t_bwd = time_jitted(
        lambda s, st, ct, nc: composite_backward(
            s, st, ct, nc, ray_o_cam, ray_d, background, pm, color, depth,
            final_t, prev_t, g_color, g_depth, jnp.zeros_like(g_depth),
            width, height, tau, chunk=cfg.face_chunk,
            interpret=cfg.interpret, blocked=True,
            subchunks=cfg.bwd_subchunks),
        stream, binning.tile_starts, binning.tile_counts, nc_tile,
        iters=iters)
    say("composite_backward", t_bwd)

    # Match the production backward exactly (ops/rasterize.py:162-172):
    # giant tier + valence cap included, so the profiled stage is the same
    # computation the e2e path runs.
    from dmesh2_renderer_tpu.utils.config import TILE_X, TILE_Y

    gx = -(-width // TILE_X)
    gy = -(-height // TILE_Y)
    kt2 = (gx * gy if cfg.giant_tiles is None
           else min(cfg.giant_tiles, gx * gy))

    def scatter_stage(gr, e, gid, st, ct, nc):
        keep = None
        if cfg.grad_compact_capacity:
            from dmesh2_renderer_tpu.ops.binning import contributing_mask

            keep, _ = contributing_mask(st, ct, nc, e.shape[0])
        return scatter_entry_grads(
            gr, e, faces, verts.shape[0], b,
            max_tiles_per_face=cfg.max_tiles_per_face,
            max_vertex_valence=cfg.max_vertex_valence,
            giant_ids=gid if cfg.num_giant_faces > 0 else None,
            giant_seg_len=cfg.max_tiles_per_face + kt2,
            keep=keep, compact_capacity=cfg.grad_compact_capacity,
            sort_mode=cfg.grad_sort_mode, vtable=vtable)

    _, t_scatter = time_jitted(
        scatter_stage, grad_records, binning.entry_bf, binning.giant_ids,
        binning.tile_starts, binning.tile_counts, nc_tile, iters=iters)
    say("scatter_entry_grads", t_scatter)

    def loss_fn(verts, verts_color, faces_opacity, faces_intense):
        c, d, _ = render(verts, faces, verts_color, faces_opacity,
                         faces_intense, mv, proj, background, width, height,
                         tau, cfg)
        return jnp.sum(c) + jnp.sum(d)

    _, t_e2e_fwd = time_jitted(
        loss_fn, verts, verts_color, faces_opacity, faces_intense,
        iters=iters)
    say("e2e forward", t_e2e_fwd)
    _, t_e2e = time_jitted(
        jax.grad(loss_fn, argnums=(0, 1, 2, 3)),
        verts, verts_color, faces_opacity, faces_intense, iters=iters)
    say("e2e fwd+bwd", t_e2e)

    stages = {
        "prep": t_prep, "binning": t_bin, "pack": t_pack,
        "fwd_kernel": t_fwd, "bwd_kernel": t_bwd, "scatter": t_scatter,
    }
    accounted = sum(stages.values())
    return {
        "stages_ms": {k: round(v, 2) for k, v in stages.items()},
        "e2e_fwd_ms": round(t_e2e_fwd, 2),
        "e2e_ms": round(t_e2e, 2),
        "unattributed_ms": round(t_e2e - accounted, 2),
        "num_rendered": int(binning.num_rendered),
        "num_truncated": int(binning.num_truncated),
        # Entries actually in the sorted stream (post Kt/giant/cull, pre
        # capacity clamp at most capacity): what binning_capacity must cover.
        "num_binned": int(jnp.sum(binning.tile_counts)),
        "num_contributing": n_contributing,
    }
