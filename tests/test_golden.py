"""Golden regression fixtures: pin the current forward images and gradients.

Guards future performance refactors of the binning / kernel / reduction
pipeline: any change to the numbers produced for this fixed icosphere scene
(2 views, 48x48, tau in {0, 1}) must be a conscious decision (regenerate
with the script in this file's docstring history or rewrite the .npz).

IMPORTANT: these fixtures pin THIS REPO'S OWN outputs (generated on the CPU
backend in interpret mode) as a drift tripwire. They are NOT the "gradient
parity vs CUDA reference" metric of SURVEY.md section 4.4 -- the CUDA
reference cannot run in this TPU-only environment, so no cross-implementation
golden data exists. Cross-checking is instead done structurally: Pallas vs
the pure-XLA reference compositor (test_pallas_fwd/test_pallas_bwd), analytic
grads vs jax.grad and finite differences (test_aa, test_reference_render).

Tolerances allow float reassociation (e.g., scan restructuring) but catch
semantic drift.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmesh2_renderer_tpu.functional import render
from dmesh2_renderer_tpu.utils.config import RasterConfig
from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_icosphere.npz")


@pytest.mark.parametrize("tau", [pytest.param(0.0, marks=pytest.mark.slow), 1.0])
def test_matches_golden(tau):
    verts, faces = icosphere(1)
    mv, proj = orbit_cameras(2)
    f = faces.shape[0]
    cfg = RasterConfig(binning_capacity=1 << 13, interpret=True)
    vc = np.abs(verts)
    op = np.full(f, 0.7, np.float32)
    it_ = np.ones((2, f), np.float32)
    bg = np.asarray([0.1, 0.2, 0.3], np.float32)

    def loss(v, c, o):
        col, dep, _ = render(jnp.asarray(v), jnp.asarray(faces), jnp.asarray(c),
                             jnp.asarray(o), jnp.asarray(it_), jnp.asarray(mv),
                             jnp.asarray(proj), jnp.asarray(bg), 48, 48, tau, cfg)
        return jnp.sum(jnp.sin(col * 3.0)) + jnp.sum(dep * dep), (col, dep)

    (_, (col, dep)) = jax.jit(lambda *a: loss(*a))(verts, vc, op)
    g = jax.jit(jax.grad(lambda *a: loss(*a)[0], argnums=(0, 1, 2)))(verts, vc, op)

    ref = np.load(GOLDEN)
    k = f"tau{int(tau)}"
    np.testing.assert_allclose(np.asarray(col), ref[f"{k}_color"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(dep), ref[f"{k}_depth"], atol=1e-5)
    for name, got in zip(("dverts", "dcolor", "dop"), g):
        want = ref[f"{k}_{name}"]
        scale = max(np.abs(want).max(), 1.0)
        err = np.abs(np.asarray(got) - want).max()
        assert err < 2e-3 * scale, f"{name}: {err:.3e} vs scale {scale:.3e}"
