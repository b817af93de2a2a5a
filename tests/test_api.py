"""API-surface tests: patch rendering, validation, aux reporting.

Covers the reference behaviors of patch windows (``__init__.py:264-302``,
``renderer.cu:130-132``) and host-side shape validation
(``render.cu:62-118``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmesh2_renderer_tpu.models.renderer import Renderer
from dmesh2_renderer_tpu.utils.config import RasterConfig
from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras

CFG = RasterConfig(binning_capacity=1 << 13, interpret=True)


def _renderer(b=2, hw=48):
    verts, faces = icosphere(1)
    mv, proj = orbit_cameras(b)
    r = Renderer(mv, proj, hw, hw, config=CFG)
    f = faces.shape[0]
    args = dict(
        verts=jnp.asarray(verts), faces=jnp.asarray(faces),
        verts_color=jnp.abs(jnp.asarray(verts)),
        faces_opacity=jnp.full((f,), 0.7, jnp.float32),
        faces_intense=jnp.ones((b, f), jnp.float32),
        background=jnp.asarray([0.1, 0.2, 0.3], jnp.float32),
    )
    return r, args, b, hw


def test_patch_equals_full_frame_window():
    """Per-view patch rendering must equal the same window of a full render
    (the reference's patch contract, renderer.cu:130-132)."""
    r, a, b, hw = _renderer()
    full_c, full_d = r.forward(
        jnp.arange(b), jnp.zeros((b, 2), jnp.int32), hw, hw,
        a["verts"], a["faces"], a["verts_color"], a["faces_opacity"],
        a["faces_intense"], a["background"], 1.0,
    )
    pw = ph = 16
    pmin = jnp.asarray([[8, 4], [16, 16]], jnp.int32)
    patch_c, patch_d = r.forward(
        jnp.arange(b), pmin, pw, ph,
        a["verts"], a["faces"], a["verts_color"], a["faces_opacity"],
        a["faces_intense"], a["background"], 1.0,
    )
    for bi in range(b):
        x0, y0 = int(pmin[bi, 0]), int(pmin[bi, 1])
        np.testing.assert_allclose(
            np.asarray(patch_c[bi]),
            np.asarray(full_c[bi, y0:y0 + ph, x0:x0 + pw]),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(patch_d[bi]),
            np.asarray(full_d[bi, y0:y0 + ph, x0:x0 + pw]),
            atol=1e-5,
        )


def test_validation_errors():
    r, a, b, hw = _renderer()
    idx = jnp.arange(b)
    pm = jnp.zeros((b, 2), jnp.int32)

    with pytest.raises(ValueError, match="verts_color"):
        r.forward(idx, pm, hw, hw, a["verts"], a["faces"],
                  a["verts_color"][:, :2], a["faces_opacity"],
                  a["faces_intense"], a["background"], 1.0)
    with pytest.raises(ValueError, match="aa_temperature"):
        r.forward(idx, pm, hw, hw, a["verts"], a["faces"], a["verts_color"],
                  a["faces_opacity"], a["faces_intense"], a["background"], 1.5)
    with pytest.raises(ValueError, match="faces_intense"):
        r.forward(idx, pm, hw, hw, a["verts"], a["faces"], a["verts_color"],
                  a["faces_opacity"], a["faces_intense"][:1], a["background"], 1.0)
    with pytest.raises(ValueError, match="mv must be"):
        Renderer(np.eye(4), np.eye(4), 32, 32)


def test_overflow_reported_and_finite():
    import warnings

    r, a, b, hw = _renderer()
    small = Renderer(np.asarray(r.mv), np.asarray(r.proj), hw, hw,
                     config=RasterConfig(binning_capacity=128, interpret=True))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        c, d = small.forward(
            jnp.arange(b), jnp.zeros((b, 2), jnp.int32), hw, hw,
            a["verts"], a["faces"], a["verts_color"], a["faces_opacity"],
            a["faces_intense"], a["background"], 1.0,
        )
    assert int(small.last_aux.num_truncated) > 0
    assert any(issubclass(w.category, RuntimeWarning)
               and "truncated" in str(w.message) for w in caught)
    assert bool(jnp.isfinite(c).all()) and bool(jnp.isfinite(d).all())


def test_vertex_valence_guard():
    """A pole vertex with valence beyond the scan cap must fail LOUDLY (the
    segmented gradient scans would silently truncate its gradient sum), and
    render with exact gradients once the cap is raised (VERDICT contract:
    atomicAdd never truncates, backward.cu:495-529)."""
    import pytest

    from dmesh2_renderer_tpu.functional import render as frender
    from dmesh2_renderer_tpu.utils.validate import check_vertex_valence

    # Cone fan: vertex 0 (apex) shared by 12 faces (valence 12 > cap 8);
    # rim in the y-z plane, apex toward camera 0 at (+3r, ..) so the fan
    # faces the camera.
    n = 12
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    rim = np.stack([np.zeros(n), np.cos(ang) * 0.5,
                    np.sin(ang) * 0.5], axis=1).astype(np.float32)
    verts = np.concatenate(
        [np.asarray([[0.5, 0.0, 0.0]], np.float32), rim], axis=0)
    faces = np.asarray(
        [[0, 1 + i, 1 + (i + 1) % n] for i in range(n)], np.int32)

    with pytest.raises(ValueError, match="max_vertex_valence"):
        check_vertex_valence(faces, 8)
    assert check_vertex_valence(faces, 16)

    mv, proj = orbit_cameras(1)
    cfg_low = RasterConfig(binning_capacity=4096, max_vertex_valence=8,
                           interpret=True)
    with pytest.raises(ValueError, match="max_vertex_valence"):
        frender(jnp.asarray(verts), jnp.asarray(faces),
                jnp.abs(jnp.asarray(verts)) % 1.0,
                jnp.full((n,), 0.7, jnp.float32),
                jnp.ones((1, n), jnp.float32), jnp.asarray(mv),
                jnp.asarray(proj), jnp.zeros((3,), jnp.float32),
                32, 32, 1.0, cfg_low)

    # With a sufficient cap, pole-vertex gradients agree with jax.grad of
    # the pure-XLA reference compositor.
    cfg_lo = RasterConfig(binning_capacity=4096, max_vertex_valence=16,
                          interpret=True)
    cfg_hi = RasterConfig(binning_capacity=4096, max_vertex_valence=64,
                          interpret=True)

    def loss(v, cfg):
        c, d, _ = frender(v, jnp.asarray(faces),
                          jnp.abs(jnp.asarray(verts)) % 1.0,
                          jnp.full((n,), 0.7, jnp.float32),
                          jnp.ones((1, n), jnp.float32), jnp.asarray(mv),
                          jnp.asarray(proj), jnp.zeros((3,), jnp.float32),
                          32, 32, 1.0, cfg)
        return jnp.sum(c) + jnp.sum(d)

    g16 = jax.grad(lambda v: loss(v, cfg_lo))(jnp.asarray(verts))
    g64 = jax.grad(lambda v: loss(v, cfg_hi))(jnp.asarray(verts))
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g64),
                               rtol=1e-5, atol=1e-6)
    assert np.abs(np.asarray(g16)[0]).max() > 0.0  # pole actually has grads


def test_valence_cache_revalidates_same_shape_swap():
    """Swapping in a DIFFERENT topology at the same (F, 3) shape must re-run
    the valence guard (advisor round-3: the old shape-keyed cache skipped it
    and silently truncated gradients)."""
    import pytest

    from dmesh2_renderer_tpu.utils.validate import _ValenceCache

    cache = _ValenceCache()
    ok = np.asarray([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)  # valence 1
    bad = np.asarray([[0, 1, 2], [0, 2, 3], [0, 3, 1]], np.int32)  # valence 3
    assert cache.check(ok, 2)
    assert cache.check(ok, 2)  # identity fast path
    with pytest.raises(ValueError, match="max_vertex_valence"):
        cache.check(bad, 2)    # same shape, different content: re-validated
    # A copy with identical content hits the digest cache (no raise, passes).
    assert cache.check(ok.copy(), 2)


def test_grad_sort_mode_validated():
    import pytest

    with pytest.raises(ValueError, match="grad_sort_mode"):
        RasterConfig(grad_sort_mode="ioat")
    RasterConfig(grad_sort_mode="iota")  # valid modes construct fine
    RasterConfig(grad_sort_mode="payload")


def test_prep_modes_agree_end_to_end():
    """prep_mode="fused" (AA corners riding the consolidated corner gather
    inside rasterize) must produce the same image AND the same d verts as
    prep_mode="split" (geometry.face_aa_verts_ccw outside) -- in both
    vertex_sort_mode reductions. Values are identical by construction;
    gradients agree to reassociation noise."""
    from dmesh2_renderer_tpu.functional import render as frender

    verts, faces = icosphere(1)
    mv, proj = orbit_cameras(2)
    f = faces.shape[0]

    def loss(v, cfg):
        c, d, _ = frender(v, jnp.asarray(faces), jnp.abs(v) % 1.0,
                          jnp.full((f,), 0.6, jnp.float32),
                          jnp.ones((2, f), jnp.float32), jnp.asarray(mv),
                          jnp.asarray(proj), jnp.zeros((3,), jnp.float32),
                          32, 32, 1.0, cfg)
        return jnp.sum(c * c) + jnp.sum(d * d)

    v = jnp.asarray(verts)
    cfgs = {
        "split": RasterConfig(binning_capacity=4096, interpret=True),
        "fused": RasterConfig(binning_capacity=4096, interpret=True,
                              prep_mode="fused"),
        "fused_static": RasterConfig(binning_capacity=4096, interpret=True,
                                     prep_mode="fused",
                                     vertex_sort_mode="static"),
    }
    out = {k: jax.value_and_grad(lambda x: loss(x, c))(v)
           for k, c in cfgs.items()}
    ref_l, ref_g = out["split"]
    for k in ("fused", "fused_static"):
        l, g = out[k]
        np.testing.assert_allclose(float(l), float(ref_l), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref_g),
                                   rtol=2e-6, atol=2e-6)


def test_banded_render_matches_full_frame():
    """lax.map'ed band rendering (the memory-bounded single-chip path) must
    stitch to the full-frame image exactly."""
    from dmesh2_renderer_tpu.functional import render, render_banded

    r, a, b, hw = _renderer()
    args = (a["verts"], a["faces"], a["verts_color"], a["faces_opacity"],
            a["faces_intense"], jnp.asarray(r.mv), jnp.asarray(r.proj),
            a["background"])
    c_full, d_full, _ = render(*args, hw, hw, 1.0, CFG)
    c_band, d_band, aux = render_banded(*args, hw, hw, bands=4,
                                        aa_temperature=1.0, config=CFG)
    # atol: lax.map changes XLA fusion of the ray/blend math (observed
    # ~1.3e-6 abs on background pixels); per-pixel math is identical.
    np.testing.assert_allclose(np.asarray(c_band), np.asarray(c_full),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(d_band), np.asarray(d_full),
                               atol=5e-6)
    assert int(aux.num_truncated) == 0

    with pytest.raises(ValueError, match="bands"):
        render_banded(*args, hw, hw - 1, bands=4, config=CFG)
