"""User-facing Renderer: the differentiable multi-view triangle renderer.

API mirror of the reference ``Renderer`` (``dmesh2_renderer/__init__.py:
179-380``): hold a batch of cameras, precompute per-pixel rays once, and per
call project vertices, build the screen-space AA triangles, slice patch rays,
rasterize, and remap depth. Gradients for ``aa_face_verts`` / ``verts_ndc``
flow back through the jnp preprocessing to ``verts`` exactly as the torch ops
chain in the reference (the dual gradient path, ``__init__.py:332-344``).

Differences (deliberate, documented):
  * ``device`` is accepted but ignored -- JAX manages placement; shard with
    ``dmesh2_renderer_tpu.parallel`` for multi-chip.
  * ``aa_grad_buffer_size`` is accepted but unused: the TPU backward
    rematerializes the closed-form AA clip instead of buffering K entries
    per pixel (see ops/rasterize.py).
  * ``forward`` additionally exposes the binning statistics of the last call
    via ``self.last_aux`` (overflow accounting replaces the reference's
    dynamic buffer resizing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dmesh2_renderer_tpu import geometry as G
from dmesh2_renderer_tpu.ops.rasterize import make_rasterizer
from dmesh2_renderer_tpu.utils.config import RasterConfig
from dmesh2_renderer_tpu.utils.segments import static_vertex_table
from dmesh2_renderer_tpu.utils.validate import (
    check_cameras,
    check_render_args,
    valence_cache,
)


class Renderer:
    def __init__(self, mv, proj, width, height, device=None,
                 aa_grad_buffer_size: int = 20, config: RasterConfig | None = None):
        check_cameras(mv, proj)
        self.mv = jnp.asarray(mv, dtype=jnp.float32)          # (B, 4, 4)
        self.proj = jnp.asarray(proj, dtype=jnp.float32)      # (B, 4, 4)
        self.width = int(width)
        self.height = int(height)
        self.device = device
        self.num_batch = self.mv.shape[0]
        self.aa_grad_buffer_size = aa_grad_buffer_size  # parity arg; unused
        self.config = config or RasterConfig()
        self.last_aux = None
        # One jitted pipeline per (patch shape, tau): without this, every
        # preprocessing op dispatches eagerly (very expensive on remote
        # backends -- measured ~30 ms per dispatch through a TPU tunnel).
        self._fwd_cache = {}

        # Per-pixel camera rays, precomputed once (__init__.py:198-237).
        self.ray_o, self.ray_d = G.init_rays(self.mv, self.proj, self.width, self.height)

    def _get_fwd(self, pw: int, ph: int, tau: float):
        key = (pw, ph, tau)
        fwd = self._fwd_cache.get(key)
        if fwd is None:
            width, height = self.width, self.height
            rasterize = make_rasterizer(pw, ph, tau, self.config)

            @jax.jit
            def fwd(verts, faces, verts_color, faces_opacity, faces_intense,
                    background, mv_all, proj_all, batch_mvp_idx, batch_patch_min,
                    ray_o_full, ray_d_full, vtable):
                b_mv = mv_all[batch_mvp_idx]
                b_proj = proj_all[batch_mvp_idx]
                verts_ndc, verts_image = G.compute_verts_ndc_image(
                    verts, b_mv, b_proj, width, height
                )
                if self.config.prep_mode == "fused":
                    # AA corners ride the rasterizer's consolidated corner
                    # gather (RasterConfig.prep_mode docstring).
                    aa_verts, img = None, verts_image
                else:
                    aa_verts = G.face_aa_verts_ccw(
                        verts_image, faces, self.config.max_vertex_valence,
                        vtable,
                    )
                    img = None
                ray_o, ray_d = G.select_rays(
                    ray_o_full, ray_d_full, batch_mvp_idx, batch_patch_min,
                    pw, ph,
                )
                color, depth_raw, _final_t, aux = rasterize(
                    verts, verts_color, faces_opacity, verts_ndc,
                    faces_intense, aa_verts, faces, background,
                    batch_patch_min, ray_o[:, 0, 0, :], ray_d, vtable,
                    img,
                )
                return color, 1.0 - (depth_raw + 1.0) / 2.0, aux

            self._fwd_cache[key] = fwd
        return fwd

    def compute_verts_ndc_image(self, verts, mv, proj):
        return G.compute_verts_ndc_image(verts, mv, proj, self.width, self.height)

    def forward(
        self,
        batch_mvp_idx,        # (B,) int camera indices
        batch_patch_min,      # (B, 2) int patch origins
        patch_width: int,
        patch_height: int,
        verts,                # (P, 3)
        faces,                # (F, 3) int
        verts_color,          # (P, 3)
        faces_opacity,        # (F,)
        faces_intense,        # (B, F)
        background,           # (3,)
        aa_temperature: float = 1.0,
    ):
        """Render. Returns (color (B, ph, pw, 3), depth (B, ph, pw) in [0, 1],
        larger = nearer -- the reference's remap, __init__.py:377-378)."""
        batch_mvp_idx = jnp.asarray(batch_mvp_idx, dtype=jnp.int32)
        batch_patch_min = jnp.asarray(batch_patch_min, dtype=jnp.int32)
        check_render_args(
            verts, faces, verts_color, faces_opacity, faces_intense,
            background, batch_mvp_idx.shape[0], aa_temperature,
        )
        verts = jnp.asarray(verts, dtype=jnp.float32)
        # Valence check (gradient-truncation contract; see
        # utils.validate.check_vertex_valence). Memoized on object identity
        # + content digest, so swapping in a DIFFERENT same-shape topology
        # re-validates while the steady-state cost is zero. Run on the RAW
        # caller object BEFORE jnp.asarray: the conversion mints a fresh
        # array every call, which would demote the id fast path to a
        # per-frame device->host transfer + sha1 of the full buffer.
        # Callers that mutate the faces buffer IN PLACE should re-check
        # themselves.
        # Host-precomputed valence table (cached per topology, same
        # raw-object reasoning): turns the backward's 3F-row sorts + scans
        # into one fixed gather + dense sum, exact for any valence. Only the
        # runtime-sort path needs the bounded-scan truncation guard.
        vtable = (static_vertex_table(faces, verts.shape[0])
                  if self.config.vertex_sort_mode == "static" else None)
        if vtable is None:
            valence_cache.check(faces, self.config.max_vertex_valence)
        faces = jnp.asarray(faces, dtype=jnp.int32)

        fwd = self._get_fwd(int(patch_width), int(patch_height),
                            float(aa_temperature))
        color, depth, aux = fwd(
            verts,
            faces,
            jnp.asarray(verts_color, dtype=jnp.float32),
            jnp.asarray(faces_opacity, dtype=jnp.float32),
            jnp.asarray(faces_intense, dtype=jnp.float32),
            jnp.asarray(background, dtype=jnp.float32),
            self.mv,
            self.proj,
            batch_mvp_idx,
            batch_patch_min,
            self.ray_o,
            self.ray_d,
            vtable,
        )
        self.last_aux = aux
        if self.config.warn_on_overflow:
            truncated = int(aux.num_truncated)
            if truncated > 0:
                import warnings

                warnings.warn(
                    f"binning truncated {truncated} of "
                    f"{int(aux.num_rendered)} face instances; the rendered "
                    "image is missing geometry. Raise "
                    "RasterConfig.binning_capacity (or max_tiles_per_face "
                    "for faces spanning many tiles).",
                    RuntimeWarning,
                    stacklevel=2,
                )
            cap2 = self.config.grad_compact_capacity
            if cap2 and int(aux.num_grad_contributing) > cap2:
                import warnings

                warnings.warn(
                    f"{int(aux.num_grad_contributing)} entries contribute "
                    f"gradients but grad_compact_capacity={cap2}: backward "
                    "drops the excess (wrong gradients for some tiles). "
                    "Raise RasterConfig.grad_compact_capacity.",
                    RuntimeWarning,
                    stacklevel=2,
                )
        return color, depth

    __call__ = forward
