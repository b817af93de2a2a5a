"""The observability API runs the real pipeline and accounts every stage."""

import jax.numpy as jnp
import numpy as np
import pytest

from dmesh2_renderer_tpu.utils.config import RasterConfig
from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras
from dmesh2_renderer_tpu.utils.profiling import profile_render


@pytest.mark.slow
def test_profile_render_reports_all_stages():
    verts_np, faces_np = icosphere(1)
    verts = jnp.asarray(verts_np)
    faces = jnp.asarray(faces_np)
    f = faces.shape[0]
    mv, proj = orbit_cameras(1, radius=3.0)
    cfg = RasterConfig(binning_capacity=1 << 12, max_tiles_per_face=16,
                       interpret=True)
    report = profile_render(
        verts, faces, jnp.abs(verts) % 1.0, jnp.full((f,), 0.7),
        jnp.ones((1, f)), jnp.asarray(mv), jnp.asarray(proj),
        jnp.zeros((3,)), 64, 64, 1.0, cfg, iters=1,
    )
    assert set(report["stages_ms"]) == {
        "prep", "binning", "pack", "fwd_kernel", "bwd_kernel", "scatter"
    }
    assert all(np.isfinite(v) and v >= 0 for v in report["stages_ms"].values())
    assert report["e2e_ms"] > 0 and report["e2e_fwd_ms"] > 0
    assert report["num_rendered"] > 0
    assert report["num_truncated"] == 0
