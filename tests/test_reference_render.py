"""Behavioral tests of the pure-XLA reference compositor.

These pin the blending semantics of the CUDA reference kernel
(``cuda_impl/forward.cu:139-432``) on constructed scenes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmesh2_renderer_tpu import geometry as G
from dmesh2_renderer_tpu.ops.reference import render_reference
from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras


def _scene_two_triangles():
    """Two plane triangles: red near the camera, blue behind it.

    ``orbit_cameras(1)`` places the camera at (3, 0.9, 0) looking at the
    origin, so larger world x is nearer to the camera.
    """
    verts = np.array(
        [
            # near triangle (closer to camera at x=+3)
            [1.0, -0.5, -0.5], [1.0, -0.5, 0.75], [1.0, 0.75, 0.0],
            # far triangle
            [0.0, -0.5, -0.75], [0.0, -0.5, 0.5], [0.0, 0.5, 0.0],
        ],
        dtype=np.float32,
    )
    faces = np.array([[0, 1, 2], [3, 4, 5]], dtype=np.int32)
    colors = np.array(
        [[1, 0, 0], [1, 0, 0], [1, 0, 0], [0, 0, 1], [0, 0, 1], [0, 0, 1]],
        dtype=np.float32,
    )
    return verts, faces, colors


def _render(verts, faces, colors, opacity, width=32, height=32, tau=1.0,
            intense=None, bg=(0.0, 0.0, 0.0), patch_min=None, n_cam=1,
            patch_w=None, patch_h=None):
    mv, proj = orbit_cameras(max(n_cam, 1))
    mv, proj = jnp.asarray(mv[:n_cam]), jnp.asarray(proj[:n_cam])
    vj = jnp.asarray(verts)
    fj = jnp.asarray(faces)
    ray_o, ray_d = G.init_rays(mv, proj, width, height)
    verts_ndc, verts_image = G.compute_verts_ndc_image(vj, mv, proj, width, height)
    tris = G.face_aa_triangles(verts_image, fj)
    b = n_cam
    pm = jnp.zeros((b, 2), jnp.int32) if patch_min is None else jnp.asarray(patch_min)
    pw = width if patch_w is None else patch_w
    ph = height if patch_h is None else patch_h
    if patch_min is not None or patch_w is not None:
        ray_o, ray_d = G.select_rays(ray_o, ray_d, jnp.arange(b), pm, pw, ph)
    fi = jnp.ones((b, faces.shape[0]), jnp.float32) if intense is None else jnp.asarray(intense)
    return render_reference(
        vj, fj, jnp.asarray(colors), jnp.asarray(opacity), verts_ndc, fi,
        tris.verts, jnp.asarray(bg, dtype=jnp.float32), pm, ray_o, ray_d, tau,
    )


def test_occlusion_opaque_front_wins():
    verts, faces, colors = _scene_two_triangles()
    color, _, _ = _render(verts, faces, colors, np.ones(2, np.float32))
    c = np.asarray(color[0, 16, 16])
    np.testing.assert_allclose(c, [1.0, 0.0, 0.0], atol=1e-5)


def test_semi_transparent_blend():
    verts, faces, colors = _scene_two_triangles()
    color, _, _ = _render(verts, faces, colors, np.array([0.5, 1.0], np.float32))
    c = np.asarray(color[0, 16, 16])
    # 0.5 red over opaque blue: C = 0.5*red + 0.5*blue
    np.testing.assert_allclose(c, [0.5, 0.0, 0.5], atol=1e-5)


def test_background_composites_into_unhit_pixels():
    verts, faces, colors = _scene_two_triangles()
    color, depth, aux = _render(
        verts, faces, colors, np.ones(2, np.float32), bg=(0.2, 0.4, 0.6)
    )
    np.testing.assert_allclose(np.asarray(color[0, 0, 0]), [0.2, 0.4, 0.6], atol=1e-5)
    # unhit raw depth = T * 1.0 = 1
    np.testing.assert_allclose(float(depth[0, 0, 0]), 1.0, atol=1e-6)
    assert float(aux.final_t[0, 0, 0]) == 1.0


def test_depth_ordering_front_before_back():
    verts, faces, colors = _scene_two_triangles()
    _, depth, _ = _render(verts, faces, colors, np.ones(2, np.float32))
    # center: near triangle NDC z is smaller than far triangle's
    _, depth_far_only, _ = _render(
        verts, faces, colors, np.array([0.0, 1.0], np.float32)
    )
    assert float(depth[0, 16, 16]) < float(depth_far_only[0, 16, 16])


def test_intensity_scales_color():
    verts, faces, colors = _scene_two_triangles()
    inten = np.array([[0.5, 1.0]], np.float32)
    color, _, _ = _render(verts, faces, colors, np.ones(2, np.float32), intense=inten)
    np.testing.assert_allclose(np.asarray(color[0, 16, 16]), [0.5, 0.0, 0.0], atol=1e-5)


def test_tau_zero_equals_hard_coverage():
    verts, faces = icosphere(1)
    rng = np.random.default_rng(0)
    colors = rng.uniform(size=(verts.shape[0], 3)).astype(np.float32)
    op = np.full(faces.shape[0], 0.8, np.float32)
    c0, d0, _ = _render(verts, faces, colors, op, tau=0.0)
    c1, d1, _ = _render(verts, faces, colors, op, tau=1.0)
    # interior pixels agree (AA only affects edges); center of the sphere
    assert np.allclose(np.asarray(c0[0, 16, 16]), np.asarray(c1[0, 16, 16]), atol=5e-2)
    # but images are not identical (edges differ)
    assert not np.allclose(np.asarray(c0), np.asarray(c1), atol=1e-4)


def test_patch_matches_full_frame():
    verts, faces = icosphere(1)
    rng = np.random.default_rng(1)
    colors = rng.uniform(size=(verts.shape[0], 3)).astype(np.float32)
    op = np.full(faces.shape[0], 0.6, np.float32)
    full, dfull, _ = _render(verts, faces, colors, op, width=32, height=32)
    patch, dpatch, _ = _render(
        verts, faces, colors, op, width=32, height=32,
        patch_min=np.array([[8, 4]], np.int32), patch_w=16, patch_h=16,
    )
    np.testing.assert_allclose(
        np.asarray(patch[0]), np.asarray(full[0, 4:20, 8:24]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dpatch[0]), np.asarray(dfull[0, 4:20, 8:24]), atol=1e-5
    )


@pytest.mark.slow
def test_grad_flows_and_finite():
    verts, faces = icosphere(1)
    rng = np.random.default_rng(2)
    colors = rng.uniform(size=(verts.shape[0], 3)).astype(np.float32)
    op = np.full(faces.shape[0], 0.7, np.float32)

    def loss(v, c, o):
        color, depth, _ = _render(np.asarray(v), faces, c, o, width=24, height=24)
        return jnp.sum(color**2) + jnp.sum(depth**2)

    # differentiate through projection + AA + compositing end to end
    mv, proj = orbit_cameras(1)
    mv, proj = jnp.asarray(mv), jnp.asarray(proj)

    def full_loss(v):
        ray_o, ray_d = G.init_rays(mv, proj, 24, 24)
        verts_ndc, verts_image = G.compute_verts_ndc_image(v, mv, proj, 24, 24)
        tris = G.face_aa_triangles(verts_image, jnp.asarray(faces))
        color, depth, _ = render_reference(
            v, jnp.asarray(faces), jnp.asarray(colors), jnp.asarray(op),
            verts_ndc, jnp.ones((1, faces.shape[0]), jnp.float32), tris.verts,
            jnp.zeros(3, jnp.float32), jnp.zeros((1, 2), jnp.int32),
            ray_o, ray_d, 1.0,
        )
        return jnp.sum(color**2) + jnp.sum(depth**2)

    g = jax.grad(full_loss)(jnp.asarray(verts))
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0.0
