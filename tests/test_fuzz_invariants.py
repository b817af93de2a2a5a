"""Randomized invariant checks over adversarial scene fuzz.

The reference crashes or silently misbehaves only at its validated C++
boundary (render.cu:62-118); everything that reaches the kernels is assumed
well-formed. This suite instead feeds the WHOLE pipeline structurally nasty
but type-valid scenes -- zero-area faces from duplicated vertices,
behind-camera geometry, opacity exactly 0/1, empty-coverage views -- and
asserts the invariants the design documents: outputs finite and bounded,
gradients finite, aux counters coherent. Degenerate-input behavior is where
masked branch-free math (aa.py, geometry.py clamps) differs most from the
reference's early-returning scalar code, so this is the cheapest place to
catch a regression in the masks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmesh2_renderer_tpu.functional import render
from dmesh2_renderer_tpu.utils.config import RasterConfig
from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras

CFG = RasterConfig(binning_capacity=1 << 12, interpret=True)


def _fuzz_scene(seed: int):
    rng = np.random.default_rng(seed)
    verts_np, faces_np = icosphere(1)
    p = verts_np.shape[0]

    # Structural nastiness, seed-dependent:
    verts_np = verts_np + rng.normal(scale=0.05, size=verts_np.shape)
    if seed % 3 == 0:
        # duplicate-vertex faces -> zero screen area, zero MT denominator
        k = rng.integers(0, faces_np.shape[0], size=6)
        faces_np = faces_np.copy()
        faces_np[k, 1] = faces_np[k, 0]
    if seed % 3 == 1:
        # a clump far behind the camera and one near the w-clamp plane
        verts_np[: p // 4] = verts_np[: p // 4] * 80.0
    f = faces_np.shape[0]

    op = rng.uniform(size=(f,)).astype(np.float32)
    op[: f // 8] = 0.0       # fully transparent
    op[f // 8: f // 4] = 1.0  # fully opaque (alpha == 1 backward case)

    b = 2
    mv, proj = orbit_cameras(b)
    return (
        jnp.asarray(verts_np, jnp.float32), jnp.asarray(faces_np),
        jnp.asarray(rng.uniform(size=(p, 3)).astype(np.float32)),
        jnp.asarray(op),
        jnp.asarray(rng.uniform(0.5, 1.5, size=(b, f)).astype(np.float32)),
        jnp.asarray(mv), jnp.asarray(proj),
        jnp.asarray(rng.uniform(size=(3,)).astype(np.float32)),
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_render_and_grads_finite_on_fuzz_scenes(seed):
    args = _fuzz_scene(seed)
    hw = 16  # interpret-mode cost is per-run; size is suite-budget-bound

    color, depth, aux = render(*args, hw, hw, 1.0, CFG)
    color, depth = np.asarray(color), np.asarray(depth)
    assert np.isfinite(color).all() and np.isfinite(depth).all()
    # Blend is convex over face colors (intensity-scaled, here <= 1.5) and
    # the background; depth remaps into [0, 1].
    assert color.min() >= 0.0 and color.max() <= 1.6
    assert depth.min() >= -1e-5 and depth.max() <= 1.0 + 1e-5
    # Counter coherence: truncation never exceeds the emission count.
    assert 0 <= int(aux.num_truncated) <= int(aux.num_rendered)

    def loss(v, c, o, it):
        col, dep, _ = render(v, args[1], c, o, it, args[5], args[6], args[7],
                             hw, hw, 1.0, CFG)
        return jnp.sum(col * 0.3) + jnp.sum(dep) * 0.1

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
        args[0], args[2], args[3], args[4]
    )
    for name, g in zip(("verts", "color", "opacity", "intensity"), grads):
        g = np.asarray(g)
        assert np.isfinite(g).all(), f"non-finite grad: {name}"
    # Fully transparent faces still get a (finite) opacity gradient -- the
    # revival path DMesh++ relies on (d alpha / d op = coverage != 0).
    g_op = np.asarray(grads[2])
    f = args[3].shape[0]
    assert np.abs(g_op[: f // 8]).max() > 0.0
