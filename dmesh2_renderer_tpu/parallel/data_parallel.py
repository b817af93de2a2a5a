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


class RenderStats(NamedTuple):
    """Per-step capacity counters, max-reduced over the view shards.

    Surfaces the two silent-truncation conditions of the static-capacity
    design on the FUNCTIONAL path (the class API warns via Renderer.forward;
    training loops previously had no signal): geometry dropped by binning
    capacity, and gradient rows dropped by backward compaction. The contract
    being protected is the reference's -- its dynamic alloc + atomicAdd never
    drop (renderer.cu:175-183, backward.cu:495-529).
    """

    num_truncated: jnp.ndarray          # () int32: binned entries dropped
    num_grad_contributing: jnp.ndarray  # () int32: must fit grad compaction


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
    target_color, background) -> (params, opt_state, loss, stats) with
    ``stats: RenderStats`` the capacity counters max-reduced over shards
    (zero host cost unless the caller reads them).
    """
    config = config or RasterConfig()

    def local_loss(params: SceneParams, fi_s, mv_s, proj_s, tgt_s, background):
        color, depth, aux = render(
            params.verts, faces, params.verts_color, params.faces_opacity,
            fi_s, mv_s, proj_s, background, width, height, aa_temperature, config,
        )
        loss = jnp.mean((color - tgt_s) ** 2)
        if depth_weight:
            loss = loss + depth_weight * jnp.mean(depth**2)
        stats = RenderStats(aux.num_truncated, aux.num_grad_contributing)
        return loss, stats

    def shard_fn(params, fi_s, mv_s, proj_s, tgt_s, background):
        (loss, stats), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params, fi_s, mv_s, proj_s, tgt_s, background
        )
        # Shared-parameter gradients: pure DP all-reduce over ICI.
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, axis), grads)
        loss = jax.lax.pmean(loss, axis)
        stats = jax.tree.map(lambda s: jax.lax.pmax(s, axis), stats)
        return loss, grads, stats

    sharded_grads = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(params, opt_state, faces_intense, mv, proj, target_color, background):
        loss, grads, stats = sharded_grads(
            params, faces_intense, mv, proj, target_color, background
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss, stats

    return step


def generate_layers_sharded(
    mesh: Mesh,
    verts, faces, faces_existence,
    mv, proj,
    width: int, height: int,
    num_layers: int,
    config: RasterConfig | None = None,
    axis: str = "dp",
):
    """Depth-peel B views sharded across the mesh's view axis.

    The peel is non-differentiable and per-view independent (the reference
    runs it one kernel launch per batch, ``renderer.cu:509-674``), so view
    sharding is exact: each chip peels its camera subset. Returns
    (layers (B, H, W, L) int32, counts (B, H, W) int32,
    (num_rendered, num_truncated) summed over shards).
    """
    from dmesh2_renderer_tpu.functional import generate_layers

    config = config or RasterConfig()

    def shard_fn(mv_s, proj_s):
        layers, counts, (nr, nt) = generate_layers(
            verts, faces, faces_existence, mv_s, proj_s,
            width, height, num_layers, config,
        )
        return layers, counts, jax.lax.psum(nr, axis), jax.lax.psum(nt, axis)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(), P()),
        check_vma=False,
    )
    layers, counts, nr, nt = fn(mv, proj)
    return layers, counts, (nr, nt)
