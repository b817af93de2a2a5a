"""End-to-end DMesh++-style inverse rendering (BASELINE.md config 5).

Optimizes vertex positions, colors, and opacities of an icosphere to match
target renders of a displaced "bumpy" target shape from 16 orbit cameras,
views sharded across all available devices. Demonstrates the full training
stack: functional render -> sharded grads -> optax -> checkpoint/resume.

Run: python examples/fit_mesh.py [--steps 200] [--size 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from dmesh2_renderer_tpu.functional import render
from dmesh2_renderer_tpu.parallel.data_parallel import SceneParams
from dmesh2_renderer_tpu.train import Trainer
from dmesh2_renderer_tpu.utils.config import RasterConfig
from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--checkpoint", type=str, default="/tmp/fit_mesh.npz")
    ap.add_argument("--grid", action="store_true",
                    help="2-D (view x pixel-band) device mesh instead of "
                         "pure view data-parallel")
    args = ap.parse_args()

    hw, b = args.size, args.views
    verts_np, faces_np = icosphere(3)
    faces = jnp.asarray(faces_np)
    f = faces.shape[0]
    mv, proj = orbit_cameras(b)
    mv, proj = jnp.asarray(mv), jnp.asarray(proj)
    # Scene-probed static capacities (margin absorbs optimization-time
    # vertex drift; Trainer warns if geometry ever outgrows them).
    from dmesh2_renderer_tpu import suggest_config

    cfg = suggest_config(
        verts_np, faces_np, mv, proj, hw, hw,
        base=RasterConfig(interpret=jax.default_backend() == "cpu"),
        margin=2.0,
    )
    it = jnp.ones((b, f), jnp.float32)
    bg = jnp.zeros((3,), jnp.float32)

    # Target: radially displaced sphere with position-derived colors.
    rng = np.random.default_rng(0)
    bump = 1.0 + 0.25 * np.sin(4.0 * verts_np[:, 0]) * np.cos(4.0 * verts_np[:, 1])
    target_verts = jnp.asarray(verts_np * bump[:, None])
    target_color = jnp.abs(target_verts) % 1.0
    tgt, _, _ = render(target_verts, faces, target_color,
                       jnp.full((f,), 0.95), it, mv, proj, bg, hw, hw, 1.0, cfg)
    tgt = jax.lax.stop_gradient(tgt)

    params = SceneParams(
        verts=jnp.asarray(verts_np),
        verts_color=jnp.full((verts_np.shape[0], 3), 0.5, jnp.float32),
        faces_opacity=jnp.full((f,), 0.5, jnp.float32),
    )
    if args.grid and len(jax.devices()) >= 2:
        # Half the devices on views, two pixel bands per view: the 2-D
        # deployment shape (parallel/patch_parallel.py).
        n = len(jax.devices()) // 2 * 2
        mesh = Mesh(np.array(jax.devices()[:n]).reshape(n // 2, 2),
                    ("dp", "sp"))
    else:
        if args.grid:
            print("--grid needs >= 2 devices; falling back to view DP")
        mesh = Mesh(np.array(jax.devices()), ("dp",))
    trainer = Trainer(mesh, optax.adam(5e-3), faces, hw, hw, 1.0, cfg,
                      checkpoint_path=args.checkpoint, checkpoint_every=50)
    state = trainer.init_state(params)
    print(f"devices={len(jax.devices())} start_step={int(state.step)}")

    t0 = time.time()
    for i in range(args.steps):
        state, loss = trainer.step(state, it, mv, proj, tgt, bg)
        if i % 10 == 0:
            print(f"step {int(state.step):4d} loss {float(loss):.6f} "
                  f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)", flush=True)
    # Capacity contract: nothing was silently dropped during the fit (the
    # Trainer also warns per step via check_render_stats).
    stats = trainer.last_stats
    assert int(stats.num_truncated) == 0, "binning truncated geometry"
    if cfg.grad_compact_capacity:
        assert int(stats.num_grad_contributing) <= cfg.grad_compact_capacity, \
            "backward compaction dropped gradient rows"
    if args.checkpoint:
        from dmesh2_renderer_tpu.train import save_checkpoint

        save_checkpoint(args.checkpoint, state)
    suffix = f" (saved {args.checkpoint})" if args.checkpoint else ""
    print(f"final loss {float(loss):.6f}{suffix}")


if __name__ == "__main__":
    main()
