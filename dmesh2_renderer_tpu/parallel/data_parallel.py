"""Multi-chip view parallelism: shard_map over cameras + psum of shared grads.

The reference is single-GPU; its only batch axis is B cameras rendered in one
launch (grid.z = B, ``cuda_impl/renderer.cu:131``). The natural TPU scaling
axis is the same one: shard views across chips with ``shard_map`` over a
``jax.sharding.Mesh`` and all-reduce the gradients of the *shared* scene
parameters (verts / colors / opacities are identical across views, so their
gradient is a pure data-parallel ``psum`` riding ICI). No parameter state is
sharded: scene parameters are tiny next to per-view framebuffers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from dmesh2_renderer_tpu.functional import render
from dmesh2_renderer_tpu.utils.config import RasterConfig


class SceneParams(NamedTuple):
    """Differentiable scene state of the DMesh++ optimization loop."""

    verts: jnp.ndarray          # (P, 3)
    verts_color: jnp.ndarray    # (P, 3)
    faces_opacity: jnp.ndarray  # (F,)


def make_view_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(devices, (axis,))


def render_views_sharded(
    mesh: Mesh,
    verts, faces, verts_color, faces_opacity, faces_intense,
    mv, proj, background,
    width: int, height: int,
    aa_temperature: float = 1.0,
    config: RasterConfig | None = None,
    axis: str = "dp",
):
    """Render B views sharded across the mesh's view axis.

    Returns (color (B, H, W, 3), depth (B, H, W)) sharded along axis 0.
    """
    config = config or RasterConfig()

    def shard_fn(fi_s, mv_s, proj_s):
        color, depth, _aux = render(
            verts, faces, verts_color, faces_opacity, fi_s, mv_s, proj_s,
            background, width, height, aa_temperature, config,
        )
        return color, depth

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return fn(faces_intense, mv, proj)


def make_sharded_train_step(
    mesh: Mesh,
    optimizer,
    faces,
    width: int,
    height: int,
    aa_temperature: float = 1.0,
    config: RasterConfig | None = None,
    axis: str = "dp",
    depth_weight: float = 0.0,
):
    """Build a jitted multi-view inverse-rendering train step.

    Views (cameras + target images + per-view intensities) are sharded across
    chips; scene parameters are replicated and their gradients all-reduced
    with ``psum`` before a replicated optax update -- BASELINE.md config 5
    (the 64-view end-to-end optimization loop), TPU-native.

    Returns step(params: SceneParams, opt_state, faces_intense, mv, proj,
    target_color, background) -> (params, opt_state, loss).
    """
    config = config or RasterConfig()

    def local_loss(params: SceneParams, fi_s, mv_s, proj_s, tgt_s, background):
        color, depth, _aux = render(
            params.verts, faces, params.verts_color, params.faces_opacity,
            fi_s, mv_s, proj_s, background, width, height, aa_temperature, config,
        )
        loss = jnp.mean((color - tgt_s) ** 2)
        if depth_weight:
            loss = loss + depth_weight * jnp.mean(depth**2)
        return loss

    def shard_fn(params, fi_s, mv_s, proj_s, tgt_s, background):
        loss, grads = jax.value_and_grad(local_loss)(
            params, fi_s, mv_s, proj_s, tgt_s, background
        )
        # Shared-parameter gradients: pure DP all-reduce over ICI.
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, axis), grads)
        loss = jax.lax.pmean(loss, axis)
        return loss, grads

    sharded_grads = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(params, opt_state, faces_intense, mv, proj, target_color, background):
        loss, grads = sharded_grads(
            params, faces_intense, mv, proj, target_color, background
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step
