"""Analytic backward kernel vs golden JAX-AD gradients of the reference.

The reference compositor is differentiated by JAX AD (the same math the CUDA
hand-written backward implements); the Pallas backward kernel must reproduce
those gradients to ~1e-4 (the BASELINE.md north-star tolerance).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmesh2_renderer_tpu import geometry as G
from dmesh2_renderer_tpu.ops.binning import bin_faces, pack_face_stream
from dmesh2_renderer_tpu.ops.pallas_bwd import composite_backward, scatter_entry_grads
from dmesh2_renderer_tpu.ops.pallas_fwd import composite_forward
from dmesh2_renderer_tpu.ops.reference import face_depth01, render_reference
from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras


@functools.lru_cache(maxsize=2)
def _scene(width=32, height=32, b=2, seed=0):
    verts_np, faces_np = icosphere(1)
    # Break the icosphere's lattice symmetry: exact vertex-on-pixel-boundary
    # configurations are measure-zero subgradient ties where analytic / AD /
    # FD gradients legitimately differ (the CUDA reference flags these as
    # error codes E00-E05 and skips the face entirely).
    jrng = np.random.default_rng(12345)
    verts_np = verts_np + jrng.normal(scale=1e-3, size=verts_np.shape).astype(np.float32)
    mv, proj = orbit_cameras(b)
    verts, faces = jnp.asarray(verts_np), jnp.asarray(faces_np)
    mvj, projj = jnp.asarray(mv), jnp.asarray(proj)
    ray_o, ray_d = G.init_rays(mvj, projj, width, height)
    verts_ndc, verts_image = G.compute_verts_ndc_image(verts, mvj, projj, width, height)
    tris = G.face_aa_triangles(verts_image, faces)
    rng = np.random.default_rng(seed)
    vc = jnp.asarray(rng.uniform(size=(verts.shape[0], 3)).astype(np.float32))
    fo = jnp.asarray(rng.uniform(0.3, 0.95, size=(faces.shape[0],)).astype(np.float32))
    fi = jnp.asarray(rng.uniform(0.5, 1.0, size=(b, faces.shape[0])).astype(np.float32))
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    pm = jnp.zeros((b, 2), jnp.int32)
    gc = jnp.asarray(rng.normal(size=(b, height, width, 3)).astype(np.float32))
    gd = jnp.asarray(rng.normal(size=(b, height, width)).astype(np.float32))
    return verts, faces, vc, fo, verts_ndc, fi, tris, bg, pm, ray_o, ray_d, gc, gd


@pytest.mark.parametrize(
    "tau",
    [1.0, pytest.param(0.0, marks=pytest.mark.slow),
     pytest.param(0.5, marks=pytest.mark.slow)],
)
def test_backward_matches_autodiff(tau):
    # 32x16 = a 2x1 tile grid per view x 2 views: tile-neighbor handling in
    # x and the batch axis stay covered at half the interpret-mode walltime.
    width, height = 32, 16
    (verts, faces, vc, fo, verts_ndc, fi, tris, bg, pm, ray_o, ray_d, gc, gd) = _scene(
        width=32, height=16)

    def loss(verts_, vc_, fo_, ndc_, fi_, aa_):
        color, depth, _ = render_reference(
            verts_, faces, vc_, fo_, ndc_, fi_, aa_, bg, pm, ray_o, ray_d, tau
        )
        return jnp.sum(color * gc) + jnp.sum(depth * gd)

    golden = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(
        verts, vc, fo, verts_ndc, fi, tris.verts
    )

    depth01, _, _, alive = face_depth01(verts_ndc, faces)
    binning = bin_faces(tris.verts, depth01, alive, pm, width, height,
                        capacity=1024, max_tiles_per_face=64)  # 80 faces x <=4 tiles x B=2
    stream = pack_face_stream(binning.entry_bf, verts, faces, vc, fo, verts_ndc, fi, tris.verts, interpret=True)
    ray_o_cam = ray_o[:, 0, 0, :]
    color, depth, ft, pt, _, nc_tile = composite_forward(
        stream, binning.tile_starts, binning.tile_counts, ray_o_cam, ray_d,
        bg, pm, width, height, tau, chunk=128, interpret=True,
    )
    grad_records = composite_backward(
        stream, binning.tile_starts, binning.tile_counts, nc_tile, ray_o_cam,
        ray_d, bg, pm, color, depth, ft, pt, gc, gd, jnp.zeros_like(gd),
        width, height, tau, chunk=128, interpret=True,
    )
    d_verts, d_vcolor, d_op, d_vndc_z, d_int, d_aa = scatter_entry_grads(
        grad_records, binning.entry_bf, faces, verts.shape[0], 2
    )

    g_verts, g_vcolor, g_op, g_ndc, g_int, g_aa = (np.asarray(x) for x in golden)

    def check(name, got, want, atol):
        got, want = np.asarray(got), np.asarray(want)
        scale = max(np.abs(want).max(), 1.0)
        err = np.abs(got - want).max()
        assert err < atol * scale, f"{name}: max err {err:.3e} (scale {scale:.3e})"

    check("verts_color", d_vcolor, g_vcolor, 2e-5)
    check("faces_opacity", d_op, g_op, 2e-5)
    check("faces_intense", d_int, g_int, 2e-5)
    check("verts_ndc_z", d_vndc_z, g_ndc[..., 2], 2e-5)
    check("aa_face_verts", d_aa, g_aa, 5e-4)
    check("verts", d_verts, g_verts, 5e-4)
    # the (B,P,3) ndc grad is z-only in the kernel path; x/y flow through
    # aa_face_verts instead (verts_image is not an input here)
    np.testing.assert_allclose(g_ndc[..., :2], 0.0, atol=1e-7)


def test_grad_compaction_matches_uncompacted():
    """Backward residual compaction (RasterConfig.grad_compact_capacity) must
    leave every gradient equivalent: compaction only drops entries whose
    records the kernel's saturation mask already zeroes (the entry-level
    n_contrib skip, backward.cu:219-221). Row positions inside the segmented
    gradient scans shift, so sums reassociate -- equality is to f32
    accumulation-order noise (~1e-5 relative), not bitwise. High opacities
    force early saturation so the compacted stream is genuinely smaller."""
    from dmesh2_renderer_tpu.functional import render
    from dmesh2_renderer_tpu.utils.config import RasterConfig
    from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras

    verts_np, faces_np = icosphere(1)
    rng = np.random.default_rng(7)
    verts_np = verts_np + rng.normal(scale=1e-3, size=verts_np.shape).astype(np.float32)
    f = faces_np.shape[0]
    mv, proj = orbit_cameras(1)
    args = (
        jnp.asarray(verts_np), jnp.asarray(faces_np),
        jnp.asarray(rng.uniform(size=(verts_np.shape[0], 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.85, 0.99, size=(f,)).astype(np.float32)),
        jnp.ones((1, f), jnp.float32), jnp.asarray(mv), jnp.asarray(proj),
        jnp.asarray([0.1, 0.2, 0.3], jnp.float32),
    )

    def loss(v, c, o, cfg):
        col, dep, _ = render(v, args[1], c, o, args[4], args[5], args[6],
                             args[7], 32, 32, 1.0, cfg)
        return jnp.sum(col * jnp.cos(col)) + jnp.sum(dep * 0.3)

    cfg_off = RasterConfig(binning_capacity=2048, interpret=True)
    cfg_on = RasterConfig(binning_capacity=2048, interpret=True,
                          grad_compact_capacity=512)
    g_off = jax.grad(loss, argnums=(0, 1, 2))(args[0], args[2], args[3], cfg_off)
    g_on = jax.grad(loss, argnums=(0, 1, 2))(args[0], args[2], args[3], cfg_on)
    for a, b_ in zip(g_off, g_on):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-5, atol=1e-6)

    # Overflow path: a tiny compact capacity truncates but must stay finite.
    cfg_tiny = RasterConfig(binning_capacity=2048, interpret=True,
                            grad_compact_capacity=128)
    g_tiny = jax.grad(loss, argnums=(0,))(args[0], args[2], args[3], cfg_tiny)
    assert np.isfinite(np.asarray(g_tiny[0])).all()


@pytest.mark.parametrize(
    "sc", [2, pytest.param(4, marks=pytest.mark.slow)])
def test_bwd_subchunks_match_full_blocks(sc):
    """bwd_subchunks in {2, 4} must reproduce the full-block backward's
    gradients to reassociation noise: piece boundaries only re-chunk the
    blend replay (carries move through VMEM scratch instead of loop state),
    and the piece-level skip only drops pieces whose first rank is already
    past the tile's max contributor -- records the saturation mask zeroes
    anyway. High opacities force early saturation so tail pieces genuinely
    get skipped."""
    from dmesh2_renderer_tpu.functional import render
    from dmesh2_renderer_tpu.utils.config import RasterConfig
    from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras

    verts_np, faces_np = icosphere(1)
    rng = np.random.default_rng(13)
    verts_np = verts_np + rng.normal(scale=1e-3, size=verts_np.shape).astype(
        np.float32)
    f = faces_np.shape[0]
    mv, proj = orbit_cameras(1)
    args = (
        jnp.asarray(verts_np), jnp.asarray(faces_np),
        jnp.asarray(rng.uniform(size=(verts_np.shape[0], 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.85, 0.99, size=(f,)).astype(np.float32)),
        jnp.ones((1, f), jnp.float32), jnp.asarray(mv), jnp.asarray(proj),
        jnp.asarray([0.1, 0.2, 0.3], jnp.float32),
    )

    def loss(v, c, o, cfg):
        col, dep, _ = render(v, args[1], c, o, args[4], args[5], args[6],
                             args[7], 32, 32, 1.0, cfg)
        return jnp.sum(col * jnp.cos(col)) + jnp.sum(dep * 0.3)

    # sc=4 (3+ piece iteration) rides the slow set; the fast set pins the
    # piece-boundary logic with sc=2 (suite-budget trade, VERDICT r04 #9).
    grads = {}
    for s in (1, sc):
        cfg = RasterConfig(binning_capacity=2048, interpret=True,
                           bwd_subchunks=s)
        grads[s] = jax.grad(loss, argnums=(0, 1, 2))(
            args[0], args[2], args[3], cfg)
    for name, a, b in zip(("verts", "color", "op"), grads[sc], grads[1]):
        got, want = np.asarray(a), np.asarray(b)
        scale = max(np.abs(want).max(), 1.0)
        err = np.abs(got - want).max()
        assert err < 2e-5 * scale, f"sc={sc} {name}: {err:.3e}"


def test_scatter_sort_modes_agree():
    """sort_mode="iota" (2-op sort + compacted-prefix gather) must reduce to
    the same six gradients as the payload-carry sort; both are followed by
    permutation-invariant per-segment sums, so equality is to reassociation
    noise."""
    rng = np.random.default_rng(5)
    f, b, r, cap = 97, 2, 1024, 512
    faces = jnp.asarray(rng.integers(0, 60, (f, 3)).astype(np.int32))
    bf = b * f
    entry = jnp.asarray(rng.integers(0, bf, (r,)).astype(np.int32))
    recs = jnp.asarray(rng.normal(size=(r, 32)).astype(np.float32))
    keep = jnp.asarray(rng.uniform(size=(r,)) < 0.4)
    out = {}
    for mode in ("payload", "iota"):
        out[mode] = jax.jit(
            lambda g, e, k: scatter_entry_grads(
                g, e, faces, 60, b, max_tiles_per_face=16,
                keep=k, compact_capacity=cap, sort_mode=mode),
            static_argnames=(),
        )(recs, entry, keep)
    for a, b_ in zip(out["payload"], out["iota"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-6, atol=2e-6)


def test_scatter_static_vertex_table_agrees():
    """vertex_sort_mode="static" (host-precomputed valence-table gather +
    dense sum) must reduce to the same six gradients as the runtime 3F-row
    payload sort -- both aggregate the same per-vertex contribution sets."""
    from dmesh2_renderer_tpu.utils.segments import static_vertex_table

    rng = np.random.default_rng(7)
    f, b, r = 97, 2, 1024
    faces = jnp.asarray(rng.integers(0, 60, (f, 3)).astype(np.int32))
    bf = b * f
    entry = jnp.asarray(rng.integers(0, bf, (r,)).astype(np.int32))
    recs = jnp.asarray(rng.normal(size=(r, 32)).astype(np.float32))
    vtable = static_vertex_table(faces, 60)
    assert vtable is not None and vtable.shape[0] == 60
    base = jax.jit(lambda g, e: scatter_entry_grads(
        g, e, faces, 60, b, max_tiles_per_face=16))(recs, entry)
    stat = jax.jit(lambda g, e, t: scatter_entry_grads(
        g, e, faces, 60, b, max_tiles_per_face=16,
        vtable=t))(recs, entry, vtable)
    for a, b_ in zip(base, stat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-6, atol=2e-6)


def test_static_vertex_table_end_to_end_grads():
    """Full functional-path gradients with vertex_sort_mode="static" match
    the default runtime-sort mode (exercises BOTH reduction sites: the
    scatter and geometry.face_aa_verts_ccw's backward)."""
    from dmesh2_renderer_tpu.functional import render as frender
    from dmesh2_renderer_tpu.utils.meshes import icosphere, orbit_cameras

    verts, faces = icosphere(1)
    mv, proj = orbit_cameras(1)
    f = faces.shape[0]

    def loss(v, cfg):
        c, d, _ = frender(v, jnp.asarray(faces), jnp.abs(v) % 1.0,
                          jnp.full((f,), 0.6, jnp.float32),
                          jnp.ones((1, f), jnp.float32), jnp.asarray(mv),
                          jnp.asarray(proj), jnp.zeros((3,), jnp.float32),
                          32, 32, 1.0, cfg)
        return jnp.sum(c * c) + jnp.sum(d)

    from dmesh2_renderer_tpu.utils.config import RasterConfig
    cfg_sort = RasterConfig(binning_capacity=4096, interpret=True)
    cfg_stat = RasterConfig(binning_capacity=4096, interpret=True,
                            vertex_sort_mode="static")
    v = jnp.asarray(verts)
    g_sort = jax.grad(lambda x: loss(x, cfg_sort))(v)
    g_stat = jax.grad(lambda x: loss(x, cfg_stat))(v)
    np.testing.assert_allclose(np.asarray(g_sort), np.asarray(g_stat),
                               rtol=2e-6, atol=2e-6)


def test_static_vertex_table_cache_bounded():
    """The host-precompute cache must evict: each entry pins a (V, maxval)
    device table, and topology-rewiring training would otherwise leak
    device memory one topology at a time."""
    from dmesh2_renderer_tpu.utils import segments

    before = dict(segments._vertex_order_cache["by_digest"])
    try:
        tops = []
        for k in range(segments._VERTEX_ORDER_CACHE_SIZE + 3):
            f = np.array([[0, 1, 2], [1, 2, 3 + k]], np.int32)
            tops.append(f)
            vtable = segments.static_vertex_table(f, 4 + k)
            assert vtable.shape[0] == 4 + k
        assert (len(segments._vertex_order_cache["by_digest"])
                <= segments._VERTEX_ORDER_CACHE_SIZE)
        assert (len(segments._vertex_order_cache["by_id"])
                <= segments._VERTEX_ORDER_CACHE_SIZE)
    finally:
        segments._vertex_order_cache["by_digest"].clear()
        segments._vertex_order_cache["by_digest"].update(before)


def test_static_vertex_table_safe_across_traces():
    """The same topology used from TWO separate jit traces must not leak
    trace-local constants through the digest cache (regression: the round-5
    on-chip A/B sweep crashed with UnexpectedTracerError on its second
    static-mode variant -- jnp.asarray under an active trace yields tracers,
    which the cache then served to the next trace)."""
    from dmesh2_renderer_tpu.utils import segments

    faces = jnp.asarray(np.array([[0, 1, 2], [2, 1, 3]], np.int32))
    x = jnp.arange(7, dtype=jnp.float32)  # 3F=6 corner rows + sentinel

    def use(x):
        vtable = segments.static_vertex_table(faces, 4)
        return jnp.sum(x[vtable])

    a = jax.jit(use)(x)
    b = jax.jit(lambda y: use(y) * 2.0)(x)  # distinct trace, same digest
    np.testing.assert_allclose(float(b), 2 * float(a), rtol=1e-6)
    # Eager call afterwards still works and returns a device array.
    vtable = segments.static_vertex_table(faces, 4)
    assert isinstance(vtable, jax.Array) and not isinstance(
        vtable, jax.core.Tracer)


def test_static_vertex_table_contents():
    """Table rows enumerate exactly each vertex's corner slots (sentinel-
    padded), and vertex_table_reduce reproduces a dense scatter-add."""
    from dmesh2_renderer_tpu.utils import segments

    rng = np.random.default_rng(11)
    f, v = 23, 17
    faces = rng.integers(0, v, (f, 3)).astype(np.int32)
    vtable = np.asarray(segments.static_vertex_table(faces, v))
    vids = np.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
    for vert in range(v):
        got = sorted(i for i in vtable[vert] if i < 3 * f)
        want = sorted(np.nonzero(vids == vert)[0].tolist())
        assert got == want, f"vertex {vert}"
    contrib = rng.normal(size=(3 * f, 5)).astype(np.float32)
    want = np.zeros((v, 5), np.float32)
    np.add.at(want, vids, contrib)
    got = np.asarray(segments.vertex_table_reduce(
        jnp.asarray(contrib), jnp.asarray(vtable), v))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_static_vertex_table_skew_fallback():
    """A pathologically skewed valence distribution (one pole vertex in a
    huge fan) must return None so callers fall back to the runtime sort
    instead of materializing a (V, maxval) table larger than 4x3F."""
    from dmesh2_renderer_tpu.utils import segments

    n = 64  # fan: vertex 0 in every face, V = n + 1, maxval = n
    faces = np.stack([np.zeros(n, np.int32),
                      np.arange(1, n + 1, dtype=np.int32),
                      np.roll(np.arange(1, n + 1, dtype=np.int32), 1)], 1)
    assert segments.static_vertex_table(faces, 4 * n) is None


def test_scatter_static_table_wide_batch_agrees():
    """n_batch > 9 makes the vertex contrib wider than one 15-column gather
    piece -- the table path must split and still match the runtime sort."""
    from dmesh2_renderer_tpu.utils.segments import static_vertex_table

    rng = np.random.default_rng(19)
    f, b, r = 53, 12, 512  # contrib width 6 + 12 = 18 -> two pieces
    faces = jnp.asarray(rng.integers(0, 40, (f, 3)).astype(np.int32))
    bf = b * f
    entry = jnp.asarray(rng.integers(0, bf, (r,)).astype(np.int32))
    recs = jnp.asarray(rng.normal(size=(r, 32)).astype(np.float32))
    vtable = static_vertex_table(faces, 40)
    base = jax.jit(lambda g, e: scatter_entry_grads(
        g, e, faces, 40, b, max_tiles_per_face=16))(recs, entry)
    stat = jax.jit(lambda g, e, t: scatter_entry_grads(
        g, e, faces, 40, b, max_tiles_per_face=16,
        vtable=t))(recs, entry, vtable)
    for a, b_ in zip(base, stat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-6, atol=2e-6)


def test_scatter_entry_grads_sort_split_invariant():
    """scatter_entry_grads (the op-level consumer of the split sorts, on
    BOTH grad_sort_mode paths) returns identical gradients for every
    sort_split width -- the plumbing behind RasterConfig.grad_sort_split."""
    rng = np.random.default_rng(23)
    f, b, r = 53, 2, 768
    faces = jnp.asarray(rng.integers(0, 40, (f, 3)).astype(np.int32))
    entry = jnp.asarray(rng.integers(0, b * f, (r,)).astype(np.int32))
    recs = jnp.asarray(rng.normal(size=(r, 32)).astype(np.float32))
    base = jax.jit(lambda g, e: scatter_entry_grads(
        g, e, faces, 40, b, max_tiles_per_face=16))(recs, entry)
    for mode in ("payload", "iota"):
        for split in (8, 10, 29):
            got = jax.jit(lambda g, e: scatter_entry_grads(
                g, e, faces, 40, b, max_tiles_per_face=16,
                sort_mode=mode, sort_split=split))(recs, entry)
            for a, b_ in zip(base, got):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b_), rtol=2e-6, atol=2e-6,
                    err_msg=f"mode={mode} split={split}")


def test_sort_split_and_tail_lowering_invariant():
    """The face reduction is invariant to sort_rows_by_key's max_payloads
    split (splits may permute rows WITHIN a key segment -- consumers are
    per-segment sums) and to segment_tails' gather lowering (per-piece vs
    one concatenated row gather of the same acc rows, which is exact).
    Guards adopting a different split width / tail lowering from
    benchmarks/micro_sort_split.py."""
    from dmesh2_renderer_tpu.utils.segments import (
        segment_tails, segmented_prefix_sum, sort_rows_by_key)

    rng = np.random.default_rng(7)
    r, n_seg, w = 2048, 97, 29
    keys = jnp.asarray(rng.integers(0, n_seg, (r,)).astype(np.int32))
    cols = [jnp.asarray(rng.normal(size=(r,)).astype(np.float32))
            for _ in range(w)]

    def face_sums(max_payloads, wide_tails):
        sk, pieces = sort_rows_by_key(keys, cols, max_payloads=max_payloads)
        accs = [segmented_prefix_sum(p, sk, 64) for p in pieces]
        if wide_tails:
            accs = jnp.concatenate(accs, axis=1)
        return segment_tails(accs, sk, n_seg)[:, :w]

    want = np.zeros((n_seg, w), np.float32)
    np.add.at(want, np.asarray(keys), np.stack([np.asarray(c) for c in cols], 1))
    base = face_sums(15, False)
    np.testing.assert_allclose(np.asarray(base), want, rtol=2e-5, atol=2e-5)
    for mp, wt in ((5, False), (8, True), (15, True), (29, False)):
        got = face_sums(mp, wt)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   rtol=2e-5, atol=2e-5, err_msg=f"P={mp} wide={wt}")
