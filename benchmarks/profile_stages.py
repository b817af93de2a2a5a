"""Stage-by-stage timing of the headline config (1M tris @ 1080p, fwd+bwd).

Answers "where do the milliseconds go": each pipeline stage is jitted and
timed in isolation on realistic intermediates, then cross-checked against
the end-to-end iteration time. Timing forces a scalar host readback
(block_until_ready is unreliable through the remote tunnel).

Usage: python benchmarks/profile_stages.py [--small]
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmesh2_renderer_tpu import geometry as G
from dmesh2_renderer_tpu.functional import render
from dmesh2_renderer_tpu.ops import reference as ref_ops
from dmesh2_renderer_tpu.ops.binning import bin_faces, pack_face_stream
from dmesh2_renderer_tpu.ops.pallas_bwd import (
    composite_backward,
    scatter_entry_grads,
)
from dmesh2_renderer_tpu.ops.pallas_fwd import composite_forward
from dmesh2_renderer_tpu.utils.config import RasterConfig
from dmesh2_renderer_tpu.utils.meshes import orbit_cameras, triangle_soup

ITERS = int(os.environ.get("PROF_ITERS", "5"))


def _force(out):
    return float(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def timeit(name, fn, *args):
    fn_j = jax.jit(fn)
    _force(fn_j(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn_j(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:42s} {dt:9.2f} ms", flush=True)
    return fn_j(*args), dt


def main():
    small = "--small" in sys.argv
    if small:
        w, h, n_faces, capacity, kt = 512, 512, 65536, 1 << 19, 16
    else:
        w, h, n_faces, capacity, kt = 1920, 1080, 1_000_000, 6 * (1 << 20), 16
    tau = 1.0
    cfg = RasterConfig(binning_capacity=capacity, max_tiles_per_face=kt,
                       num_giant_faces=8192, giant_tiles=32,
                       interpret=jax.default_backend() == "cpu")

    verts_np, faces_np = triangle_soup(n_faces, size=0.02)
    mv, proj = orbit_cameras(1, radius=3.0)
    faces = jnp.asarray(faces_np)
    f = faces.shape[0]
    verts = jnp.asarray(verts_np)
    vc = jnp.abs(verts) % 1.0
    op = jnp.full((f,), 0.5, jnp.float32)
    it_ = jnp.ones((1, f), jnp.float32)
    mv, proj = jnp.asarray(mv), jnp.asarray(proj)
    bg = jnp.zeros((3,), jnp.float32)
    pm = jnp.zeros((1, 2), jnp.int32)

    print(f"== profile: {n_faces} faces @ {w}x{h}, capacity {capacity}, "
          f"Kt {kt}, backend {jax.default_backend()} ==")

    # --- stage inputs (computed once) ---
    def prep(verts):
        verts_ndc, verts_image = G.compute_verts_ndc_image(verts, mv, proj, w, h)
        tris = G.face_aa_triangles(verts_image, faces)
        depth01, _, _, alive = ref_ops.face_depth01(verts_ndc, faces)
        return verts_ndc, tris.verts, depth01, alive

    (verts_ndc, aa_verts, depth01, alive), t_prep = timeit(
        "geometry preprocess (NDC+AA tris+depth)", prep, verts)

    ray_o, ray_d = G.init_rays(mv, proj, w, h)
    ray_o_cam = ray_o[:, 0, 0, :]

    binning, t_bin = timeit(
        "bin_faces (keys+sort+ranges)",
        lambda aav, d, al: bin_faces(aav, d, al, pm, w, h, capacity, kt,
                                     num_giant_faces=cfg.num_giant_faces,
                                     giant_tiles=cfg.giant_tiles),
        aa_verts, depth01, alive)
    print(f"    num_rendered={int(binning.num_rendered)} "
          f"num_truncated={int(binning.num_truncated)} capacity={capacity}")

    from dmesh2_renderer_tpu.ops.binning import build_face_table, gather_stream

    table, t_table = timeit(
        "  pack: build_face_table",
        lambda: build_face_table(verts, faces, vc, op, verts_ndc, it_,
                                 aa_verts))
    _, t_gather = timeit(
        "  pack: gather_stream", lambda e: gather_stream(table, e),
        binning.entry_bf)
    stream, t_pack = timeit(
        "pack_face_stream (table+gather)",
        lambda e: pack_face_stream(e, verts, faces, vc, op, verts_ndc, it_,
                                   aa_verts),
        binning.entry_bf)

    fwd_out, t_fwd = timeit(
        "composite_forward (Pallas)",
        lambda s, st, ct: composite_forward(
            s, st, ct, ray_o_cam, ray_d, bg, pm, w, h, tau),
        stream, binning.tile_starts, binning.tile_counts)
    color, depth, final_t, prev_t, _, nc_tile = fwd_out

    g_color = jnp.ones_like(color)
    g_depth = jnp.ones_like(depth)
    grad_records, t_bwd = timeit(
        "composite_backward (Pallas)",
        lambda s, st, ct, nc: composite_backward(
            s, st, ct, nc, ray_o_cam, ray_d, bg, pm, color, depth,
            final_t, prev_t, g_color, g_depth, jnp.zeros_like(g_depth),
            w, h, tau),
        stream, binning.tile_starts, binning.tile_counts, nc_tile)

    _, t_scatter = timeit(
        "scatter_entry_grads (sort+scan+reduce)",
        lambda gr, e: scatter_entry_grads(gr, e, faces, verts.shape[0], 1,
                                          max_tiles_per_face=kt),
        grad_records, binning.entry_bf)

    # --- end-to-end cross-check ---
    def loss_fn(verts, vc, op, it_):
        c, d, _ = render(verts, faces, vc, op, it_, mv, proj, bg, w, h,
                         tau, cfg)
        return jnp.sum(c) + jnp.sum(d)

    _, t_e2e_fwd = timeit("e2e forward (render)", loss_fn, verts, vc, op, it_)
    _, t_e2e = timeit("e2e fwd+bwd (jax.grad)",
                      jax.grad(loss_fn, argnums=(0, 1, 2, 3)),
                      verts, vc, op, it_)

    stages = dict(prep=t_prep, binning=t_bin, pack=t_pack, fwd_kernel=t_fwd,
                  bwd_kernel=t_bwd, scatter=t_scatter)
    accounted = sum(stages.values())
    print(f"{'sum of stages':42s} {accounted:9.2f} ms")
    print(f"{'e2e fwd+bwd':42s} {t_e2e:9.2f} ms   "
          f"(unattributed {t_e2e - accounted:+.2f})")
    print(json.dumps({"stages_ms": {k: round(v, 2) for k, v in stages.items()},
                      "e2e_ms": round(t_e2e, 2),
                      "e2e_fwd_ms": round(t_e2e_fwd, 2)}))


if __name__ == "__main__":
    main()
