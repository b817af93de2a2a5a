"""LayeredRenderer: exact depth peeling (non-differentiable).

API mirror of the reference ``LayeredRenderer`` (``dmesh2_renderer/
__init__.py:388-451``): same constructor and ``generate`` signature including
the tetrahedral adjacency tensors, which the TPU peel does not need (see
ops/peel.py for the redesign rationale) but which are accepted for parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dmesh2_renderer_tpu.functional import peel_pipeline
from dmesh2_renderer_tpu.models.renderer import Renderer
from dmesh2_renderer_tpu.utils.config import RasterConfig


class LayeredRenderer(Renderer):
    def __init__(self, mv, proj, width, height, device=None,
                 config: RasterConfig | None = None):
        super().__init__(mv, proj, width, height, device=device, config=config)
        self._gen_cache = {}

    def _get_gen(self, num_layers: int):
        gen = self._gen_cache.get(num_layers)
        if gen is None:
            width, height = self.width, self.height
            cfg = self.config

            @jax.jit
            def gen(batch_mvp_idx, verts, faces, faces_existence,
                    mv_all, proj_all, ray_o_full, ray_d_full):
                layers, counts, (nr, nt) = peel_pipeline(
                    verts, faces, faces_existence,
                    mv_all[batch_mvp_idx], proj_all[batch_mvp_idx],
                    ray_o_full[batch_mvp_idx], ray_d_full[batch_mvp_idx],
                    width, height, num_layers, cfg,
                )
                return layers, counts, nr, nt

            self._gen_cache[num_layers] = gen
        return gen

    def generate(
        self,
        batch_mvp_idx,       # (B,) int camera indices
        verts,               # (P, 3)
        faces,               # (F, 3) int
        tets,                # (T, 4) int   -- accepted for API parity
        face_tets,           # (F, 2) int   -- accepted for API parity
        tet_faces,           # (T, 4) int   -- accepted for API parity
        faces_existence,     # (F,) int
        num_layers: int,
    ):
        """Returns (render_layers (B, H, W, L) int32 face IDs, -1 padded,
        render_layers_cnt (B, H, W) int32)."""
        from dmesh2_renderer_tpu.utils.validate import check_layered_args

        check_layered_args(verts, faces, tets, face_tets, tet_faces,
                           faces_existence)
        del tets, face_tets, tet_faces  # peel needs no adjacency
        batch_mvp_idx = jnp.asarray(batch_mvp_idx, dtype=jnp.int32)
        verts = jnp.asarray(verts, dtype=jnp.float32)
        faces = jnp.asarray(faces, dtype=jnp.int32)
        faces_existence = jnp.asarray(faces_existence, dtype=jnp.int32)

        gen = self._get_gen(int(num_layers))
        layers, counts, num_rendered, num_truncated = gen(
            batch_mvp_idx, verts, faces, faces_existence,
            self.mv, self.proj, self.ray_o, self.ray_d,
        )
        self.last_aux = (num_rendered, num_truncated)
        return layers, counts
