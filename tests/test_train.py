"""Trainer: loss decreases, checkpoint/resume round-trips exactly."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from dmesh2_renderer_tpu.parallel.data_parallel import SceneParams
from dmesh2_renderer_tpu.train import Trainer, save_checkpoint, load_checkpoint
from dmesh2_renderer_tpu.utils.config import RasterConfig
from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras

# Trainer/checkpoint plumbing is backend-agnostic: run the pure-XLA
# reference compositor (cacheable) instead of interpret-mode Pallas. The
# overflow-warning test below keeps its own real-pipeline config.
CFG = RasterConfig(binning_capacity=1 << 12, interpret=True,
                   use_pallas=False)


def test_trainer_checkpoint_resume(tmp_path):
    b, hw = 4, 16  # interpret-mode walltime scales with tiles x views
    verts, faces = icosphere(0)
    mv, proj = orbit_cameras(b)
    f = faces.shape[0]
    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
    ckpt = os.path.join(tmp_path, "state.npz")

    params = SceneParams(
        verts=jnp.asarray(verts),
        verts_color=jnp.abs(jnp.asarray(verts)),
        faces_opacity=jnp.full((f,), 0.7, jnp.float32),
    )
    it = jnp.ones((b, f), jnp.float32)
    bg = jnp.zeros((3,), jnp.float32)
    tgt = jnp.zeros((b, hw, hw, 3), jnp.float32)

    tr = Trainer(mesh, optax.adam(1e-2), jnp.asarray(faces), hw, hw, 1.0, CFG,
                 checkpoint_path=ckpt, checkpoint_every=2)
    state = tr.init_state(params)
    l0 = None
    for _ in range(2):
        state, loss = tr.step(state, it, jnp.asarray(mv), jnp.asarray(proj), tgt, bg)
        l0 = l0 if l0 is not None else float(loss)
    assert float(loss) < l0
    assert os.path.exists(ckpt)

    # resume: fresh trainer restores step count + params exactly
    tr2 = Trainer(mesh, optax.adam(1e-2), jnp.asarray(faces), hw, hw, 1.0, CFG,
                  checkpoint_path=ckpt)
    state2 = tr2.init_state(params)
    assert int(state2.step) == 2
    for a, b_ in zip(jax.tree_util.tree_leaves(state2),
                     jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_checkpoint_roundtrip_scalars(tmp_path):
    from dmesh2_renderer_tpu.train import TrainState

    p = SceneParams(jnp.ones((4, 3)), jnp.zeros((4, 3)), jnp.ones((2,)))
    st = TrainState(p, (jnp.ones(3), {"m": jnp.zeros(2)}), jnp.asarray(7, jnp.int32))
    path = os.path.join(tmp_path, "c.npz")
    save_checkpoint(path, st)
    back = load_checkpoint(path, st)
    assert int(back.step) == 7
    np.testing.assert_array_equal(np.asarray(back.params.verts), np.ones((4, 3)))


def test_trainer_surfaces_compaction_overflow():
    """Overflowing grad_compact_capacity through the FUNCTIONAL/train path
    must warn (VERDICT r03 #8: the reference's atomicAdd never drops,
    backward.cu:495-529; our static compaction may -- the signal must reach
    training loops, not just Renderer.forward)."""
    import pytest

    b, hw = 1, 32
    verts, faces = icosphere(2)  # 320 faces over a 2x2-tile frame
    mv, proj = orbit_cameras(b)
    f = faces.shape[0]
    mesh = Mesh(np.array(jax.devices()[:1]), ("dp",))

    # Low opacity keeps transmittance above T_EPS deep into each tile's
    # stream, so the contributing prefix far exceeds this capacity (128 is
    # the smallest the scan-window machinery supports).
    cfg = RasterConfig(binning_capacity=1 << 12, interpret=True,
                       grad_compact_capacity=128)
    params = SceneParams(
        verts=jnp.asarray(verts),
        verts_color=jnp.abs(jnp.asarray(verts)),
        faces_opacity=jnp.full((f,), 0.2, jnp.float32),
    )
    it = jnp.ones((b, f), jnp.float32)
    bg = jnp.zeros((3,), jnp.float32)
    tgt = jnp.zeros((b, hw, hw, 3), jnp.float32)

    tr = Trainer(mesh, optax.adam(1e-2), jnp.asarray(faces), hw, hw, 1.0, cfg)
    state = tr.init_state(params)
    with pytest.warns(RuntimeWarning, match="grad_compact_capacity"):
        state, _loss = tr.step(state, it, jnp.asarray(mv), jnp.asarray(proj),
                               tgt, bg)
    assert int(tr.last_stats.num_grad_contributing) > 128


def test_trainer_grid_mesh_step():
    """A Trainer given a 2-D ("dp", "sp") mesh routes through
    make_grid_train_step (pixel rows sharded too) and trains: the numerical
    equivalence with the unsharded step is pinned by
    test_patch_parallel.test_grid_train_step_matches_unsharded_grad."""
    b, hw = 2, 16
    verts, faces = icosphere(0)
    mv, proj = orbit_cameras(b)
    f = faces.shape[0]
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "sp"))

    params = SceneParams(
        verts=jnp.asarray(verts),
        verts_color=jnp.abs(jnp.asarray(verts)),
        faces_opacity=jnp.full((f,), 0.7, jnp.float32),
    )
    it = jnp.ones((b, f), jnp.float32)
    bg = jnp.zeros((3,), jnp.float32)
    tgt = jnp.zeros((b, hw, hw, 3), jnp.float32)

    tr = Trainer(mesh, optax.adam(1e-2), jnp.asarray(faces), hw, hw, 1.0, CFG)
    state = tr.init_state(params)
    l0 = None
    for _ in range(2):
        state, loss = tr.step(state, it, jnp.asarray(mv), jnp.asarray(proj),
                              tgt, bg)
        l0 = l0 if l0 is not None else float(loss)
    assert np.isfinite(float(loss)) and float(loss) < l0
    assert int(state.step) == 2
