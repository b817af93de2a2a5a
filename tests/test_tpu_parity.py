"""On-chip parity: verify the REAL TPU lowering, not just interpret mode.

Every other test runs Pallas in interpreter mode on a forced-CPU backend;
a Mosaic lowering divergence would ship unnoticed. This suite renders the
golden icosphere scene with the native Pallas kernels ON THE CHIP and
compares against (a) the pure-XLA reference compositor on the same chip
(images, color/opacity gradients) and (b) the interpreter-mode Pallas
kernels (vertex gradients, where Pallas-vs-reference differs by documented
subgradient choices at barycentric clamp boundaries but Pallas-vs-Pallas
must agree to float tolerance).

Run with: DMESH2_TPU_TESTS=1 python -m pytest tests/test_tpu_parity.py -q
(skipped entirely under the default forced-CPU test configuration).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmesh2_renderer_tpu.functional import render
from dmesh2_renderer_tpu.utils.config import RasterConfig
from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras, tet_grid

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="needs the real TPU backend (DMESH2_TPU_TESTS=1)",
)


def _scene(b=2):
    verts, faces = icosphere(1)
    mv, proj = orbit_cameras(b)
    f = faces.shape[0]
    return dict(
        verts=jnp.asarray(verts), faces=jnp.asarray(faces),
        vc=jnp.abs(jnp.asarray(verts)),
        op=jnp.full((f,), 0.7, jnp.float32),
        it=jnp.ones((b, f), jnp.float32),
        mv=jnp.asarray(mv), proj=jnp.asarray(proj),
        bg=jnp.asarray([0.1, 0.2, 0.3], jnp.float32),
    )


def _run(s, cfg, hw=64, tau=1.0):
    def loss(v, c, o):
        col, dep, _ = render(v, s["faces"], c, o, s["it"], s["mv"], s["proj"],
                             s["bg"], hw, hw, tau, cfg)
        return jnp.sum(col * col) + jnp.sum(dep), (col, dep)

    (_, (col, dep)), g = jax.jit(
        jax.value_and_grad(loss, argnums=(0, 1, 2), has_aux=True)
    )(s["verts"], s["vc"], s["op"])
    return col, dep, g


@pytest.mark.parametrize("tau", [0.0, 1.0])
def test_onchip_pallas_matches_reference_compositor(tau):
    s = _scene()
    col_p, dep_p, g_p = _run(s, RasterConfig(binning_capacity=1 << 14), tau=tau)
    col_r, dep_r, g_r = _run(
        s, RasterConfig(binning_capacity=1 << 14, use_pallas=False), tau=tau
    )
    np.testing.assert_allclose(np.asarray(col_p), np.asarray(col_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dep_p), np.asarray(dep_r), atol=1e-5)
    # color / opacity grads: same math on both paths.
    for name, a, b in (("color", g_p[1], g_r[1]), ("op", g_p[2], g_r[2])):
        scale = max(float(jnp.abs(b).max()), 1.0)
        err = float(jnp.abs(a - b).max())
        assert err < 1e-4 * scale, (name, err, scale)


def test_onchip_pallas_matches_interpret_mode():
    """Native Mosaic lowering vs interpreter semantics of the SAME kernels."""
    s = _scene()
    _, _, g_native = _run(s, RasterConfig(binning_capacity=1 << 14))
    _, _, g_interp = _run(
        s, RasterConfig(binning_capacity=1 << 14, interpret=True)
    )
    for name, a, b in zip(("verts", "color", "op"), g_native, g_interp):
        scale = max(float(jnp.abs(b).max()), 1.0)
        err = float(jnp.abs(a - b).max())
        assert err < 1e-4 * scale, (name, err, scale)


def test_onchip_peel_matches_interpret_mode():
    from dmesh2_renderer_tpu.models.layered import LayeredRenderer

    verts, tets, faces, face_tets, tet_faces = tet_grid(res=2)
    mv, proj = orbit_cameras(1)
    ex = jnp.ones((faces.shape[0],), jnp.int32)
    idx = jnp.zeros((1,), jnp.int32)
    args = (idx, jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(tets),
            jnp.asarray(face_tets), jnp.asarray(tet_faces), ex, 8)

    ln, cn = LayeredRenderer(
        jnp.asarray(mv), jnp.asarray(proj), 64, 64,
        config=RasterConfig(binning_capacity=1 << 14),
    ).generate(*args)
    li, ci = LayeredRenderer(
        jnp.asarray(mv), jnp.asarray(proj), 64, 64,
        config=RasterConfig(binning_capacity=1 << 14, interpret=True),
    ).generate(*args)
    np.testing.assert_array_equal(np.asarray(ln), np.asarray(li))
    np.testing.assert_array_equal(np.asarray(cn), np.asarray(ci))


def test_onchip_fwd_subchunks_matches_full_blocks():
    """Mosaic lowering of the piece-granular forward (fwd_subchunks=2:
    scalar-selected static lane slices + part-gated DMA) vs the full-block
    kernel on the real chip. Images and gradients must agree to
    reassociation noise (the interpret-mode equivalence is
    test_pallas_fwd.test_fwd_subchunks_match_full_blocks)."""
    s = _scene()
    col1, dep1, g1 = _run(s, RasterConfig(binning_capacity=1 << 14))
    col2, dep2, g2 = _run(
        s, RasterConfig(binning_capacity=1 << 14, fwd_subchunks=2)
    )
    np.testing.assert_allclose(np.asarray(col2), np.asarray(col1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dep2), np.asarray(dep1), atol=1e-5)
    for name, a, b in zip(("verts", "color", "op"), g2, g1):
        scale = max(float(jnp.abs(b).max()), 1.0)
        err = float(jnp.abs(a - b).max())
        assert err < 1e-4 * scale, (name, err, scale)


def test_onchip_bwd_subchunks_matches_full_blocks():
    """Mosaic lowering of the piece-granular backward (bwd_subchunks=2:
    gated piece bodies with VMEM-scratch blend carries) vs the full-block
    kernel on the real chip. Gradients must agree to reassociation noise
    (the interpret-mode equivalence is
    test_pallas_bwd.test_bwd_subchunks_match_full_blocks)."""
    s = _scene()
    _, _, g1 = _run(s, RasterConfig(binning_capacity=1 << 14))
    _, _, g2 = _run(
        s, RasterConfig(binning_capacity=1 << 14, bwd_subchunks=2)
    )
    for name, a, b in zip(("verts", "color", "op"), g2, g1):
        scale = max(float(jnp.abs(b).max()), 1.0)
        err = float(jnp.abs(a - b).max())
        assert err < 1e-4 * scale, (name, err, scale)
