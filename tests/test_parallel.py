"""Multi-chip view parallelism on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dmesh2_renderer_tpu.functional import render
from dmesh2_renderer_tpu.parallel.data_parallel import (
    SceneParams,
    make_sharded_train_step,
    render_views_sharded,
)
from dmesh2_renderer_tpu.utils.config import RasterConfig
from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras

# These tests pin SHARDING semantics (shard_map specs, psum/pmean scaling),
# which are backend-agnostic -- so they run the pure-XLA reference
# compositor (use_pallas=False), which the persistent compile cache makes
# near-free, instead of the per-run interpret-mode Pallas path. Fast-set
# Pallas-under-shard_map coverage lives in
# test_patch_parallel.test_grid_train_step_matches_unsharded_grad.
CFG = RasterConfig(binning_capacity=1 << 12, interpret=True,
                   use_pallas=False)


def _scene(b):
    verts, faces = icosphere(0)
    mv, proj = orbit_cameras(b)
    f = faces.shape[0]
    return (jnp.asarray(verts), jnp.asarray(faces),
            jnp.abs(jnp.asarray(verts)), jnp.full((f,), 0.7, jnp.float32),
            jnp.ones((b, f), jnp.float32), jnp.asarray(mv), jnp.asarray(proj),
            jnp.zeros((3,), jnp.float32))


def test_sharded_render_matches_single_device():
    # 4 shards is the smallest mesh that still exercises multi-device
    # sharding semantics; the slow-marked grads test runs 8 x 32x32.
    b, hw = 4, 16
    verts, faces, vc, op, it, mv, proj, bg = _scene(b)
    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
    c_sh, d_sh = render_views_sharded(
        mesh, verts, faces, vc, op, it, mv, proj, bg, hw, hw, 1.0, CFG
    )
    c_ref, d_ref, _ = render(verts, faces, vc, op, it, mv, proj, bg, hw, hw, 1.0, CFG)
    np.testing.assert_allclose(np.asarray(c_sh), np.asarray(c_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref), atol=1e-6)


@pytest.mark.slow
def test_sharded_grads_match_single_device_grad():
    """The psum/pmean path must reproduce unsharded jax.grad of the SAME
    mean loss (pins the pmean scaling: a mean-vs-sum mistake fails at 1e-6).
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    b, hw = 8, 32
    verts, faces, vc, op, it, mv, proj, bg = _scene(b)
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    params = SceneParams(verts=verts, verts_color=vc, faces_opacity=op)
    target = 0.3 * jnp.ones((b, hw, hw, 3), jnp.float32)

    def local_loss(params, fi_s, mv_s, proj_s, tgt_s):
        color, _, _ = render(
            params.verts, faces, params.verts_color, params.faces_opacity,
            fi_s, mv_s, proj_s, bg, hw, hw, 1.0, CFG,
        )
        return jnp.mean((color - tgt_s) ** 2)

    def shard_fn(params, fi_s, mv_s, proj_s, tgt_s):
        loss, grads = jax.value_and_grad(local_loss)(
            params, fi_s, mv_s, proj_s, tgt_s
        )
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, "dp"), grads)
        return jax.lax.pmean(loss, "dp"), grads

    loss_sh, grads_sh = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P(), P()),
        check_vma=False,
    )(params, it, mv, proj, target)

    loss_ref, grads_ref = jax.value_and_grad(local_loss)(
        params, it, mv, proj, target
    )
    # per-shard mean + pmean reassociates the reduction vs one global mean
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), atol=1e-6)
    for name, a, b_ in zip(SceneParams._fields, grads_sh, grads_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-6, err_msg=name
        )


@pytest.mark.slow
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
        params, opt_state, loss, stats = step(params, opt_state, it, mv, proj, target, bg)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_sharded_peel_matches_single_device():
    """View-sharded depth peel: face-ID layers are INTEGER output, so the
    sharded result must equal the unsharded one exactly."""
    from dmesh2_renderer_tpu.functional import generate_layers
    from dmesh2_renderer_tpu.parallel.data_parallel import (
        generate_layers_sharded,
    )

    b, hw, L = 2, 16, 4
    verts, faces, _vc, _op, _it, mv, proj, _bg = _scene(b)
    fe = jnp.ones((faces.shape[0],), jnp.int32)
    cfg = RasterConfig(binning_capacity=1 << 12, interpret=True)
    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))
    l_sh, c_sh, (nr, nt) = generate_layers_sharded(
        mesh, verts, faces, fe, mv, proj, hw, hw, L, cfg
    )
    l_ref, c_ref, (nr_ref, nt_ref) = generate_layers(
        verts, faces, fe, mv, proj, hw, hw, L, cfg
    )
    np.testing.assert_array_equal(np.asarray(l_sh), np.asarray(l_ref))
    np.testing.assert_array_equal(np.asarray(c_sh), np.asarray(c_ref))
    assert int(nr) == int(nr_ref) and int(nt) == int(nt_ref)
    assert int(c_ref.max()) >= 2  # the scene actually has layered hits
