"""Inverse-rendering training loop utilities: step, metrics, checkpointing.

The reference repo is a stateless leaf library -- its callers (DMesh++'s
optimization loop) own parameters and persistence (SURVEY.md section 5). A
complete framework needs that loop to exist somewhere, so this module
provides the TPU-native version: a sharded multi-view train step (views
data-parallel over the device mesh, shared scene gradients psum'd over ICI)
plus simple, dependency-light checkpoint/resume.

Checkpoints are a single .npz of the flattened (params, opt_state, step)
pytree -- portable across hosts, no orbax server/async machinery needed at
this state size (scene parameters are MBs, not GBs).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dmesh2_renderer_tpu.parallel.data_parallel import (
    RenderStats,
    SceneParams,
    make_sharded_train_step,
)
from dmesh2_renderer_tpu.utils.config import RasterConfig


def check_render_stats(stats: RenderStats, config: RasterConfig) -> None:
    """Warn when a step's capacity counters signal silent truncation.

    The functional-path analogue of Renderer.forward's overflow warnings:
    binning truncation drops geometry; gradient-compaction overflow drops
    gradient rows inside backward (the reference never drops either --
    renderer.cu:175-183 dynamic alloc, backward.cu:495-529 atomicAdd).
    Costs two scalar device->host readbacks.
    """
    import warnings

    truncated = int(stats.num_truncated)
    if truncated > 0:
        warnings.warn(
            f"binning truncated {truncated} face instances this step; the "
            "rendered image is missing geometry. Raise "
            "RasterConfig.binning_capacity (or max_tiles_per_face).",
            RuntimeWarning,
            stacklevel=3,
        )
    cap = config.grad_compact_capacity
    if cap and int(stats.num_grad_contributing) > cap:
        warnings.warn(
            f"{int(stats.num_grad_contributing)} entries contribute "
            f"gradients but grad_compact_capacity={cap}: backward dropped "
            "the excess (wrong gradients for some tiles). Raise "
            "RasterConfig.grad_compact_capacity.",
            RuntimeWarning,
            stacklevel=3,
        )


class TrainState(NamedTuple):
    params: SceneParams
    opt_state: object
    step: jnp.ndarray  # () int32


def save_checkpoint(path: str, state: TrainState) -> None:
    """Write the train state as one .npz (atomic rename)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore a train state saved by :func:`save_checkpoint`.

    ``template`` provides the pytree structure (build it exactly as at
    save time: same optimizer, same shapes).
    """
    leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(path) as data:
        if len(data.files) != len(leaves):
            raise ValueError(
                f"checkpoint has {len(data.files)} leaves, template "
                f"{len(leaves)}"
            )
        restored = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, restored)


class Trainer:
    """Multi-view inverse-rendering trainer (BASELINE.md config 5).

    Wraps the sharded train step with parameter state, periodic
    checkpointing, and resume.
    """

    def __init__(self, mesh, optimizer, faces, width, height,
                 aa_temperature=1.0, config: RasterConfig | None = None,
                 checkpoint_path: str | None = None,
                 checkpoint_every: int = 100):
        self.optimizer = optimizer
        self.config = config or RasterConfig()
        if "sp" in mesh.axis_names:
            # 2-D (view x pixel-band) mesh: shard each view's pixel rows
            # over the "sp" axis too (parallel/patch_parallel.py). Same
            # step signature; targets arrive pre-sharded on (view, row).
            from dmesh2_renderer_tpu.parallel.patch_parallel import (
                make_grid_train_step,
            )

            self.step_fn = make_grid_train_step(
                mesh, optimizer, faces, width, height, aa_temperature,
                self.config,
            )
        else:
            self.step_fn = make_sharded_train_step(
                mesh, optimizer, faces, width, height, aa_temperature,
                self.config,
            )
        self.checkpoint_path = checkpoint_path
        self.checkpoint_every = checkpoint_every
        self.last_stats: RenderStats | None = None

    def init_state(self, params: SceneParams) -> TrainState:
        state = TrainState(params, self.optimizer.init(params),
                           jnp.zeros((), jnp.int32))
        if self.checkpoint_path and os.path.exists(self.checkpoint_path):
            state = load_checkpoint(self.checkpoint_path, state)
        return state

    def step(self, state: TrainState, faces_intense, mv, proj, target_color,
             background):
        params, opt_state, loss, stats = self.step_fn(
            state.params, state.opt_state, faces_intense, mv, proj,
            target_color, background,
        )
        self.last_stats = stats
        if self.config.warn_on_overflow:
            check_render_stats(stats, self.config)
        state = TrainState(params, opt_state, state.step + 1)
        if (self.checkpoint_path
                and int(state.step) % self.checkpoint_every == 0):
            save_checkpoint(self.checkpoint_path, state)
        return state, loss
