"""Single-process A/B over the headline config's knobs (one tunnel init).

Runs the headline fwd+bwd step (bench.py's scene: 1M tris, 1080p, tau=1)
once per knob variant and prints one JSON line each. The knobs are the
on-chip decision tree queued during the round-3 outage (docs/DESIGN.md,
benchmarks/tpu_queue.sh): grad_sort_mode, vertex_sort_mode, fwd/bwd
subchunks, prep_mode. Winners get adopted as bench.py defaults.

Results are also appended to benchmarks/results/ab_headline.jsonl (the
committed on-chip evidence ledger) with a timestamp and backend tag.

Run: python benchmarks/ab_headline.py [--iters N] [--variants a,b,...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.common import enable_compile_cache, probe_backend

# The tunnel outage playbook (bench.py): probe in a bounded subprocess
# BEFORE importing jax, else an outage hangs this process 5h+ with no
# artifact.
probe_backend(artifact={"harness": "ab_headline", "value": 0.0})

import jax
import jax.numpy as jnp

enable_compile_cache()

from dmesh2_renderer_tpu.functional import render
from dmesh2_renderer_tpu.utils.config import RasterConfig
from dmesh2_renderer_tpu.utils.meshes import orbit_cameras, triangle_soup

VARIANTS = {
    "base": {},
    "iota": {"grad_sort_mode": "iota"},
    "static": {"vertex_sort_mode": "static"},
    "iota+static": {"grad_sort_mode": "iota", "vertex_sort_mode": "static"},
    "fwd2": {"fwd_subchunks": 2},
    "bwd2": {"bwd_subchunks": 2},
    "fwd2+bwd2": {"fwd_subchunks": 2, "bwd_subchunks": 2},
    "fused": {"prep_mode": "fused"},
    "static+fwd2+bwd2": {"vertex_sort_mode": "static",
                         "fwd_subchunks": 2, "bwd_subchunks": 2},
    "static+bwd2": {"vertex_sort_mode": "static", "bwd_subchunks": 2},
    "static+fwd4+bwd4": {"vertex_sort_mode": "static",
                         "fwd_subchunks": 4, "bwd_subchunks": 4},
    # Gradient-sort split width (CPU micro: P=8 beat P=15 by ~26%;
    # benchmarks/results/micro_sort_split.jsonl -- needs the on-chip vote).
    "adopted+split8": {"vertex_sort_mode": "static",
                       "fwd_subchunks": 2, "bwd_subchunks": 2,
                       "grad_sort_split": 8},
    "adopted+split10": {"vertex_sort_mode": "static",
                        "fwd_subchunks": 2, "bwd_subchunks": 2,
                        "grad_sort_split": 10},
}

_LEDGER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "ab_headline.jsonl")


def _ledger_append(line: dict) -> None:
    try:
        os.makedirs(os.path.dirname(_LEDGER), exist_ok=True)
        with open(_LEDGER, "a") as f:
            f.write(json.dumps(line) + "\n")
    except OSError:
        pass  # the stdout line is the primary artifact


def main():
    iters = 5
    names = list(VARIANTS)
    for i, a in enumerate(sys.argv[1:], 1):
        if a == "--iters":
            iters = int(sys.argv[i + 1])
        if a == "--variants":
            names = sys.argv[i + 1].split(",")
    unknown = [n for n in names if n not in VARIANTS]
    if unknown:
        print(json.dumps({"warning": "unknown variants skipped",
                          "unknown": unknown,
                          "known": list(VARIANTS)}), flush=True)
        names = [n for n in names if n in VARIANTS]

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        width, height, n_faces, capacity = 1920, 1080, 1_000_000, 32 * (1 << 17)
    else:  # CPU smoke scale (interpret-mode 1M@1080p is infeasible)
        width, height, n_faces, capacity = 256, 256, 1280, 1 << 14
    verts_np, faces_np = triangle_soup(n_faces, size=0.02)
    mv, proj = orbit_cameras(1, radius=3.0)
    faces = jnp.asarray(faces_np)
    f = faces.shape[0]
    verts = jnp.asarray(verts_np)
    verts_color = jnp.abs(verts) % 1.0
    faces_opacity = jnp.full((f,), 0.5, jnp.float32)
    faces_intense = jnp.ones((1, f), jnp.float32)
    mv_j, proj_j = jnp.asarray(mv), jnp.asarray(proj)
    background = jnp.zeros((3,), jnp.float32)
    args = (verts, verts_color, faces_opacity, faces_intense)

    stamp = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    results = {}
    for name in names:
        overrides = VARIANTS[name]
        config = RasterConfig(
            binning_capacity=capacity,
            max_tiles_per_face=12, num_giant_faces=16384, giant_tiles=40,
            grad_compact_capacity=1 << 21, exact_tile_cull=True,
            interpret=not on_tpu,
            **overrides,
        )

        def loss_fn(verts, verts_color, faces_opacity, faces_intense,
                    _config=config):
            color, depth, _aux = render(
                verts, faces, verts_color, faces_opacity, faces_intense,
                mv_j, proj_j, background, width, height,
                aa_temperature=1.0, config=_config,
            )
            return jnp.sum(color) + jnp.sum(depth)

        grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3)))
        t0 = time.perf_counter()
        out = grad_fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = grad_fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        dt = (time.perf_counter() - t0) / iters
        results[name] = dt * 1e3
        line = {
            "variant": name, "ms_per_iter": round(dt * 1e3, 1),
            "mpix_s": round(width * height / dt / 1e6, 3),
            "compile_s": round(compile_s, 1), "overrides": overrides,
        }
        print(json.dumps(line), flush=True)
        _ledger_append({"ts": stamp, "backend": jax.default_backend(),
                        "iters": iters, **line})

    if results:
        best = min(results, key=results.get)
        summary = {"best": best, "ms": round(results[best], 1)}
        print(json.dumps(summary), flush=True)
        _ledger_append({"ts": stamp, "backend": jax.default_backend(),
                        **summary})


if __name__ == "__main__":
    main()
