"""Face-list sharding (depth slabs + associative compositing) vs single-device.

The sharded render must reproduce the single-device image to float noise
(slab compositing is exact when slabs are global depth ranks), and the
sharded train step's gradients must match unsharded jax.grad of the same
loss -- including the d(loss)/d(final_t) path through the combine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dmesh2_renderer_tpu.functional import render
from dmesh2_renderer_tpu.parallel import (
    SceneParams,
    make_face_mesh,
    make_face_sharded_train_step,
    render_faces_sharded,
)
from dmesh2_renderer_tpu.utils.config import RasterConfig
from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def _scene(width=32, height=32, b=2):
    verts_np, faces_np = icosphere(1)
    rng = np.random.default_rng(7)
    verts_np = verts_np + rng.normal(scale=1e-3, size=verts_np.shape).astype(
        np.float32)
    mv, proj = orbit_cameras(b)
    f = faces_np.shape[0]
    vc = rng.uniform(size=(verts_np.shape[0], 3)).astype(np.float32)
    fo = rng.uniform(0.3, 0.95, size=(f,)).astype(np.float32)
    fi = rng.uniform(0.5, 1.0, size=(b, f)).astype(np.float32)
    bg = np.asarray([0.1, 0.2, 0.3], np.float32)
    return (jnp.asarray(verts_np), jnp.asarray(faces_np), jnp.asarray(vc),
            jnp.asarray(fo), jnp.asarray(fi), jnp.asarray(mv),
            jnp.asarray(proj), jnp.asarray(bg))


def test_face_sharded_render_matches_single_device():
    """B=8 views on 8 chips: the per-chip view loop is a lax.scan, so the
    pipeline compiles once regardless of B (VERDICT round-2 item 7); 16x16
    keeps interpret-mode runtime comparable to the 2-view 32x32 grads test."""
    width = height = 16
    verts, faces, vc, fo, fi, mv, proj, bg = _scene(width, height, b=8)
    # Backend-agnostic slab/compositing semantics: pure-XLA compositor
    # (cacheable) instead of interpret-mode Pallas (see test_parallel.py).
    cfg = RasterConfig(binning_capacity=1 << 12, interpret=True,
                       use_pallas=False)

    ref_color, ref_depth, _ = jax.jit(
        lambda: render(verts, faces, vc, fo, fi, mv, proj, bg,
                       width, height, 1.0, cfg))()

    mesh = make_face_mesh(8)
    color, depth, (nr, nt) = render_faces_sharded(
        mesh, verts, faces, vc, fo, fi, mv, proj, bg, width, height, 1.0, cfg)

    assert int(nt) == 0
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref_color),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref_depth),
                               atol=2e-5)


def test_face_sharded_grads_match_unsharded():
    """Kept in the FAST set: the only sharded-gradient parity coverage there
    (the data-parallel grads test is the slow-marked heavyweight variant)."""
    width = height = 16
    verts, faces, vc, fo, fi, mv, proj, bg = _scene(width, height)
    # Backend-agnostic slab/compositing semantics: pure-XLA compositor
    # (cacheable) instead of interpret-mode Pallas (see test_parallel.py).
    cfg = RasterConfig(binning_capacity=1 << 12, interpret=True,
                       use_pallas=False)
    rng = np.random.default_rng(11)
    tgt = jnp.asarray(
        rng.uniform(size=(2, height, width, 3)).astype(np.float32))

    params = SceneParams(verts, vc, fo)

    def ref_loss(params):
        color, _, _ = render(params.verts, faces, params.verts_color,
                             params.faces_opacity, fi, mv, proj, bg,
                             width, height, 1.0, cfg)
        return jnp.mean((color - tgt) ** 2)

    ref_l, ref_g = jax.jit(jax.value_and_grad(ref_loss))(params)

    # One step with lr=1 checks BOTH the loss and the gradients (the update
    # equals -lr * grad for sgd); a second sgd(0) step would compile the
    # whole sharded pipeline twice for no extra coverage.
    lr = 1.0
    mesh = make_face_mesh(8)
    opt2 = optax.sgd(lr)
    step2 = make_face_sharded_train_step(mesh, opt2, faces, width, height,
                                         1.0, cfg)
    upd_params, _, loss = step2(params, opt2.init(params), fi, mv, proj, tgt,
                                bg)
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-6)
    for name, got, want in zip(
        SceneParams._fields,
        jax.tree.leaves(jax.tree.map(lambda a, b: (a - b) / -lr,
                                     upd_params, params)),
        jax.tree.leaves(ref_g),
    ):
        scale = max(float(jnp.abs(want).max()), 1e-3)
        err = float(jnp.abs(got - want).max())
        assert err < 5e-5 * scale + 1e-7, f"{name}: {err:.3e} vs {scale:.3e}"
