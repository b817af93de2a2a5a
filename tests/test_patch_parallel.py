"""Spatial pixel sharding on the 8-device virtual CPU mesh.

Band compositing is per-pixel independent, so the sharded frame must equal
the single-chip render exactly (unlike the face axis, which re-associates
the over operator); the 2-D (view x band) grid step must reproduce
unsharded jax.grad of the same mean loss (pins the two-axis pmean scaling).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from dmesh2_renderer_tpu.functional import render
from dmesh2_renderer_tpu.parallel.data_parallel import SceneParams
from dmesh2_renderer_tpu.parallel.patch_parallel import (
    make_grid_train_step,
    render_pixels_sharded,
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


@pytest.mark.slow
def test_pixel_sharded_render_matches_single_device():
    # 2 bands of 8 rows: band height < the 16-px tile and a non-tile-aligned
    # band origin (y0 = 8) both exercise the patch windowing, not just the
    # sharding. Slow-marked: the fast-set spatial-sharding coverage is the
    # (2, 2) grid-step test below, which drives the same patch windows
    # through forward AND backward; this adds the bit-exact forward
    # stitching check against the single-chip frame.
    b, hw = 2, 16
    verts, faces, vc, op, it, mv, proj, bg = _scene(b)
    mesh = Mesh(np.array(jax.devices()[:2]), ("sp",))
    c_sh, d_sh, stats = render_pixels_sharded(
        mesh, verts, faces, vc, op, it, mv, proj, bg, hw, hw, 1.0, CFG
    )
    c_ref, d_ref, _ = render(verts, faces, vc, op, it, mv, proj, bg,
                             hw, hw, 1.0, CFG)
    assert c_sh.shape == c_ref.shape and d_sh.shape == d_ref.shape
    np.testing.assert_allclose(np.asarray(c_sh), np.asarray(c_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref), atol=1e-6)
    assert int(stats.num_truncated) == 0


def test_pixel_shard_requires_divisible_height():
    verts, faces, vc, op, it, mv, proj, bg = _scene(1)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    with pytest.raises(ValueError, match="bands"):
        render_pixels_sharded(
            mesh, verts, faces, vc, op, it, mv, proj, bg, 32, 30, 1.0, CFG
        )


def test_grid_train_step_matches_unsharded_grad():
    """(dp=2, sp=2) grid: one step's loss and updated params must match the
    unsharded value_and_grad + optax update of the same mean loss."""
    b, hw = 2, 32
    verts, faces, vc, op, it, mv, proj, bg = _scene(b)
    params = SceneParams(verts=verts, verts_color=vc, faces_opacity=op)
    target = 0.3 * jnp.ones((b, hw, hw, 3), jnp.float32)
    optimizer = optax.sgd(1e-2)
    opt_state = optimizer.init(params)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "sp"))
    step = make_grid_train_step(mesh, optimizer, faces, hw, hw, 1.0, CFG)
    p_sh, _, loss_sh, stats = step(params, opt_state, it, mv, proj, target, bg)

    def loss_fn(params):
        color, _, _ = render(
            params.verts, faces, params.verts_color, params.faces_opacity,
            it, mv, proj, bg, hw, hw, 1.0, CFG,
        )
        return jnp.mean((color - target) ** 2)

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params)
    updates, _ = optimizer.update(grads_ref, opt_state, params)
    p_ref = jax.tree.map(lambda p, u: p + u, params, updates)

    # rtol: the two-axis pmean re-associates the pixel sum (observed 1.3e-6).
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    for name, a, r in zip(params._fields, p_sh, p_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=5e-7, err_msg=name
        )
    assert int(stats.num_grad_contributing) >= 0


def test_pure_pixel_mesh_train_step():
    """A 1-D ("sp",) mesh (make_pixel_mesh) must build and run a step:
    views replicate, only the pixel rows shard (regression: the grid step
    used to hard-require a "dp" axis)."""
    b, hw = 2, 16
    verts, faces, vc, op, it, mv, proj, bg = _scene(b)
    params = SceneParams(verts=verts, verts_color=vc, faces_opacity=op)
    optimizer = optax.sgd(1e-2)
    mesh = Mesh(np.array(jax.devices()[:2]), ("sp",))
    step = make_grid_train_step(mesh, optimizer, faces, hw, hw, 1.0, CFG)
    target = 0.3 * jnp.ones((b, hw, hw, 3), jnp.float32)
    p, _, loss, _stats = step(params, optimizer.init(params), it, mv, proj,
                              target, bg)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(x)).all() for x in p)


def test_patch_args_must_pair():
    from dmesh2_renderer_tpu.functional import render_partial

    verts, faces, vc, op, it, mv, proj, bg = _scene(1)
    with pytest.raises(ValueError, match="together"):
        render_partial(verts, faces, vc, op, it, mv, proj, bg, 16, 16, 1.0,
                       CFG, patch_origin=(0, 8))
