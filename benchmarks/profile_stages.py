"""Stage-by-stage timing of the headline config (1M tris @ 1080p, fwd+bwd).

Thin CLI over :func:`dmesh2_renderer_tpu.utils.profiling.profile_render`
(the library observability API): answers "where do the milliseconds go" for
the benchmark scene, printing the per-stage table and one JSON line.

Usage: python benchmarks/profile_stages.py [--small]
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.common import enable_compile_cache

enable_compile_cache()

from dmesh2_renderer_tpu.utils.config import RasterConfig
from dmesh2_renderer_tpu.utils.meshes import orbit_cameras, triangle_soup
from dmesh2_renderer_tpu.utils.profiling import profile_render

ITERS = int(os.environ.get("PROF_ITERS", "5"))


def main():
    small = "--small" in sys.argv
    if small:
        w, h, n_faces, capacity, kt = 512, 512, 65536, 1 << 19, 16
    else:
        # Same capacity as bench.py's headline (num_binned = 3.96M with the
        # SAT cull; ~230k headroom) so this table explains that number.
        w, h, n_faces, capacity, kt = 1920, 1080, 1_000_000, 32 * (1 << 17), 12
    tau = 1.0
    # Mirror bench.py's headline config (cull + grad compaction) so the
    # stage table explains the number the driver records.
    cfg = RasterConfig(binning_capacity=capacity, max_tiles_per_face=kt,
                       num_giant_faces=16384, giant_tiles=40,
                       grad_compact_capacity=None if small else 1 << 21,
                       exact_tile_cull=True,
                       # Same A/B env knobs as bench.py (tpu_queue.sh 2b).
                       grad_sort_mode=os.environ.get(
                           "BENCH_GRAD_SORT_MODE", "payload"),
                       vertex_sort_mode=os.environ.get(
                           "BENCH_VERTEX_SORT_MODE", "static"),
                       fwd_subchunks=int(os.environ.get(
                           "BENCH_FWD_SUBCHUNKS", "2")),
                       bwd_subchunks=int(os.environ.get(
                           "BENCH_BWD_SUBCHUNKS", "2")),
                       prep_mode=os.environ.get("BENCH_PREP_MODE", "split"),
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

    print(f"== profile: {n_faces} faces @ {w}x{h}, capacity {capacity}, "
          f"Kt {kt}, backend {jax.default_backend()} ==")
    report = profile_render(verts, faces, vc, op, it_, mv, proj, bg, w, h,
                            tau, cfg, iters=ITERS, verbose=True)
    accounted = sum(report["stages_ms"].values())
    print(f"{'sum of stages':42s} {accounted:9.2f} ms")
    print(f"{'e2e fwd+bwd':42s} {report['e2e_ms']:9.2f} ms   "
          f"(unattributed {report['unattributed_ms']:+.2f})")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
