"""suggest_config: probe-derived static capacities cover the scene."""

import jax.numpy as jnp
import numpy as np

from dmesh2_renderer_tpu.functional import render
from dmesh2_renderer_tpu.utils.autotune import scene_binning_stats, suggest_config
from dmesh2_renderer_tpu.utils.config import RasterConfig
from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras


def _scene(b=2, giant=False):
    verts_np, faces_np = icosphere(1)
    if giant:
        # One frame-filling triangle in the x = 0 plane (perpendicular to
        # the orbit cameras' view axes): forces the giant tier (footprint
        # far above any percentile Kt).
        verts_np = np.concatenate([
            verts_np,
            np.array([[0.0, -9.0, -9.0], [0.0, 9.0, -9.0], [0.0, 0.0, 12.0]],
                     np.float32),
        ])
        p = verts_np.shape[0]
        faces_np = np.concatenate(
            [faces_np, np.array([[p - 3, p - 2, p - 1]], np.int32)])
    mv, proj = orbit_cameras(b)
    return verts_np, faces_np, mv, proj


def test_stats_shapes_and_bounds():
    verts, faces, mv, proj = _scene()
    s = scene_binning_stats(verts, faces, mv, proj, 128, 128)
    assert s["total_emissions"] > 0
    assert 1 <= s["max_tiles"] <= s["grid"][0] * s["grid"][1]
    assert s["tiles_hist"].shape == (mv.shape[0] * faces.shape[0],)


def test_suggested_config_renders_without_truncation():
    for giant in (False, True):
        verts, faces, mv, proj = _scene(giant=giant)
        base = RasterConfig(interpret=True)
        cfg = suggest_config(verts, faces, mv, proj, 128, 128, base=base)
        assert cfg.interpret  # base knobs carry through
        f = faces.shape[0]
        color, _, aux = render(
            jnp.asarray(verts), jnp.asarray(faces),
            jnp.abs(jnp.asarray(verts))[:, :3] % 1.0,
            jnp.full((f,), 0.7, jnp.float32),
            jnp.ones((mv.shape[0], f), jnp.float32),
            jnp.asarray(mv), jnp.asarray(proj),
            jnp.zeros((3,), jnp.float32), 128, 128, 1.0, cfg,
        )
        assert int(aux.num_truncated) == 0, (giant, int(aux.num_truncated))
        assert np.isfinite(np.asarray(color)).all()
        if giant:
            assert cfg.num_giant_faces >= 16
        # Capacity is scene-sized, not a blind default: within 4x of the
        # true emission need (margin + rounding), not orders of magnitude.
        assert cfg.binning_capacity <= 4 * max(int(aux.num_rendered), 1024)


def test_suggest_config_selects_static_vertex_mode():
    """suggest_config is always handed concrete faces, so it should pick the
    measured-faster valence-table mode -- while honoring an explicit base
    override to a non-default mode."""
    import dataclasses

    from dmesh2_renderer_tpu.utils.autotune import suggest_config
    from dmesh2_renderer_tpu.utils.config import RasterConfig
    from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras

    verts, faces = icosphere(1)
    mv, proj = orbit_cameras(1)
    cfg = suggest_config(verts, faces, mv, proj, 64, 64)
    assert cfg.vertex_sort_mode == "static"
