"""Face-list parallelism: depth-slab sharding + associative compositing.

The view axis (data_parallel.py) stops helping when a SINGLE frame's face
list outgrows one chip. This module shards the FACE list itself -- the
renderer's long axis (SURVEY.md section 5): every chip bins and composites a
disjoint slab of faces, and the per-chip partial framebuffers merge with the
associative ``over`` operator

    C = C_a + T_a * C_b        T = T_a * T_b

(front-to-back alpha compositing is associative, ``forward.cu:402-415``).

Correctness hinges on slab assignment: partials compose to the exact
single-chip image only if, per pixel, every face on chip k is in front of
every face on chip k+1. The renderer's global depth test is the per-face
mean-z sort key (``forward.cu:62-68``), so slabs are RANKS of that key:
chip k owns ranks [k*F/n, (k+1)*F/n) of the per-view stable argsort. The
one deviation from a single-chip render: two faces whose QUANTIZED sort
depths tie inside one tile compose in slab order here vs emission order
there -- inside the depth quantization noise the global depth test already
carries (ops/binning.py).

Gradients: the per-chip partials leave shard_map SHARDED along a leading
slab axis and the combine is ordinary global jnp, so jax.grad simply flows
through the shard_map transpose; the rasterizer's differentiable ``final_t``
output (ops/pallas_bwd.py bg_dot path) carries d(loss)/dT into alpha, and
shared-parameter gradients all-reduce over ICI automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from dmesh2_renderer_tpu.functional import render_partial
from dmesh2_renderer_tpu.parallel.data_parallel import SceneParams
from dmesh2_renderer_tpu.utils.config import RasterConfig


def make_face_mesh(n_devices: int | None = None, axis: str = "fp") -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(devices, (axis,))


def _depth_slab_order(verts, faces, mv, proj, width, height):
    """Per-view stable depth ranks: (B, F) face ids sorted by the global
    mean-z key (dead faces last), the same key binning sorts tiles by."""
    from dmesh2_renderer_tpu import geometry as G
    from dmesh2_renderer_tpu.ops.reference import face_depth01

    verts_ndc, _ = G.compute_verts_ndc_image(verts, mv, proj, width, height)
    depth01, _, _, alive = face_depth01(verts_ndc, faces)
    key = jnp.where(alive, depth01, jnp.inf)
    return jnp.argsort(key, axis=-1, stable=True).astype(jnp.int32)


def _render_slab(params: SceneParams, faces, faces_intense, mv, proj, order,
                 width, height, aa_temperature, config, n, axis):
    """Per-chip body: render this chip's depth slab of every view with a
    zero background, returning background-free partials
    (Cn (B,H,W,3), Dn (B,H,W), T (B,H,W), counters).

    Slabs differ per view, so views render as a ``lax.scan`` over the view
    axis: the pipeline traces and compiles ONCE regardless of B (a Python
    loop here unrolled B copies of the whole rasterizer -- a compile-time
    wall at the 64-view benchmark scale)."""
    k = jax.lax.axis_index(axis)
    b, f = faces_intense.shape
    fsub = -(-f // n)

    # Pad ranks up to n*fsub with a dummy degenerate face (id F, opacity 0).
    pad = jnp.full((b, n * fsub - f), f, jnp.int32)
    order = jnp.concatenate([order, pad], axis=1)
    faces_pad = jnp.concatenate([faces, jnp.zeros((1, 3), faces.dtype)])
    fo_pad = jnp.concatenate(
        [params.faces_opacity, jnp.zeros((1,), params.faces_opacity.dtype)]
    )
    fi_pad = jnp.concatenate(
        [faces_intense, jnp.zeros((b, 1), faces_intense.dtype)], axis=1
    )
    slab_ids = jax.lax.dynamic_slice(order, (0, k * fsub), (b, fsub))

    bg0 = jnp.zeros((3,), params.verts.dtype)

    def body(carry, per_view):
        ids, mv1, proj1, fi_row = per_view
        color, depth_raw, final_t, aux = render_partial(
            params.verts, faces_pad[ids], params.verts_color, fo_pad[ids],
            fi_row[ids][None, :], mv1[None], proj1[None], bg0,
            width, height, aa_temperature, config,
        )
        nr, nt = carry
        out = (color[0], depth_raw[0] - final_t[0], final_t[0])
        return (nr + aux.num_rendered, nt + aux.num_truncated), out

    zero = jnp.zeros((), jnp.int32)
    (num_rendered, num_truncated), (cn, dn, t) = jax.lax.scan(
        body, (zero, zero), (slab_ids, mv, proj, fi_pad)
    )
    return cn, dn, t, num_rendered, num_truncated


def _make_partials_fn(mesh, width, height, aa_temperature, config, axis):
    """shard_map'ed per-slab renderer: replicated inputs -> partials
    SHARDED on a leading slab axis (combine stays global jnp, so AD is
    correct by construction). The depth-slab order is computed OUTSIDE
    shard_map -- one global projection+argsort instead of one per chip."""
    n = mesh.shape[axis]

    def shard_fn(params, faces, fi, mv, proj, order):
        cn, dn, t, nr, nt = _render_slab(
            params, faces, fi, mv, proj, order, width, height,
            aa_temperature, config, n, axis,
        )
        return (cn[None], dn[None], t[None], nr[None], nt[None])

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,
    )

    def fn(params, faces, fi, mv, proj):
        order = _depth_slab_order(params.verts, faces, mv, proj, width,
                                  height)
        return sharded(params, faces, fi, mv, proj, order)

    return fn


def _composite_slabs(all_c, all_d, all_t):
    """Fold (n, B, H, W, ...) slab partials front-to-back."""
    n = all_c.shape[0]
    c, d, tt = all_c[0], all_d[0], all_t[0]
    for k in range(1, n):
        c = c + tt[..., None] * all_c[k]
        d = d + tt * all_d[k]
        tt = tt * all_t[k]
    return c, d, tt


def render_faces_sharded(
    mesh: Mesh,
    verts, faces, verts_color, faces_opacity, faces_intense,
    mv, proj, background,
    width: int, height: int,
    aa_temperature: float = 1.0,
    config: RasterConfig | None = None,
    axis: str = "fp",
):
    """Render B views with the FACE list sharded across the mesh.

    ``config.binning_capacity`` applies PER CHIP (each chip bins only its
    ~F/n faces). Returns (color (B, H, W, 3), depth (B, H, W) in [0, 1],
    (num_rendered, num_truncated)).
    """
    config = config or RasterConfig()
    params = SceneParams(verts, verts_color, faces_opacity)
    fn = _make_partials_fn(mesh, width, height, aa_temperature, config, axis)
    all_c, all_d, all_t, nr, nt = fn(params, faces, faces_intense, mv, proj)
    c, d, tt = _composite_slabs(all_c, all_d, all_t)
    color = c + tt[..., None] * background[None, None, None, :]
    depth = 1.0 - ((d + tt) + 1.0) / 2.0
    return color, depth, (nr.sum(), nt.sum())


def make_face_sharded_train_step(
    mesh: Mesh,
    optimizer,
    faces,
    width: int,
    height: int,
    aa_temperature: float = 1.0,
    config: RasterConfig | None = None,
    axis: str = "fp",
):
    """Build a jitted train step with the face list sharded across chips.

    Each chip renders its depth slab of every view; the slab partials merge
    into the full differentiable image outside shard_map, so jax.grad
    all-reduces shared-scene gradients through the shard_map transpose.
    Returns step(params, opt_state, faces_intense, mv, proj, target_color,
    background) -> (params, opt_state, loss).
    """
    config = config or RasterConfig()
    fn = _make_partials_fn(mesh, width, height, aa_temperature, config, axis)

    def loss_fn(params: SceneParams, fi, mv, proj, tgt, background):
        all_c, all_d, all_t, _, _ = fn(params, faces, fi, mv, proj)
        c, _, tt = _composite_slabs(all_c, all_d, all_t)
        color = c + tt[..., None] * background[None, None, None, :]
        return jnp.mean((color - tgt) ** 2)

    @jax.jit
    def step(params, opt_state, faces_intense, mv, proj, target_color,
             background):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, faces_intense, mv, proj, target_color, background
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step
