"""Multi-chip view parallelism on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from dmesh2_renderer_tpu.functional import render
from dmesh2_renderer_tpu.parallel.data_parallel import (
    SceneParams,
    make_sharded_train_step,
    render_views_sharded,
)
from dmesh2_renderer_tpu.utils.config import RasterConfig
from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras

CFG = RasterConfig(binning_capacity=1 << 12, interpret=True)


def _scene(b):
    verts, faces = icosphere(0)
    mv, proj = orbit_cameras(b)
    f = faces.shape[0]
    return (jnp.asarray(verts), jnp.asarray(faces),
            jnp.abs(jnp.asarray(verts)), jnp.full((f,), 0.7, jnp.float32),
            jnp.ones((b, f), jnp.float32), jnp.asarray(mv), jnp.asarray(proj),
            jnp.zeros((3,), jnp.float32))


def test_sharded_render_matches_single_device():
    b, hw = 8, 32
    verts, faces, vc, op, it, mv, proj, bg = _scene(b)
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    c_sh, d_sh = render_views_sharded(
        mesh, verts, faces, vc, op, it, mv, proj, bg, hw, hw, 1.0, CFG
    )
    c_ref, d_ref, _ = render(verts, faces, vc, op, it, mv, proj, bg, hw, hw, 1.0, CFG)
    np.testing.assert_allclose(np.asarray(c_sh), np.asarray(c_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref), atol=1e-6)


def test_sharded_train_step_decreases_loss():
    import optax

    b, hw = 8, 32
    verts, faces, vc, op, it, mv, proj, bg = _scene(b)
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    params = SceneParams(verts=verts, verts_color=vc, faces_opacity=op)
    optimizer = optax.adam(5e-2)
    opt_state = optimizer.init(params)
    step = make_sharded_train_step(mesh, optimizer, faces, hw, hw, 1.0, CFG)
    target = jnp.zeros((b, hw, hw, 3), jnp.float32)

    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, it, mv, proj, target, bg)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()
