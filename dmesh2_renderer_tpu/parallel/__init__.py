from dmesh2_renderer_tpu.parallel.data_parallel import (
    RenderStats,
    SceneParams,
    generate_layers_sharded,
    make_sharded_train_step,
    make_view_mesh,
    render_views_sharded,
)
from dmesh2_renderer_tpu.parallel.face_parallel import (
    make_face_mesh,
    make_face_sharded_train_step,
    render_faces_sharded,
)
from dmesh2_renderer_tpu.parallel.patch_parallel import (
    make_grid_train_step,
    make_pixel_mesh,
    render_pixels_sharded,
)

__all__ = [
    "generate_layers_sharded",
    "make_grid_train_step",
    "make_pixel_mesh",
    "render_pixels_sharded",
    "RenderStats",
    "SceneParams",
    "make_sharded_train_step",
    "make_view_mesh",
    "render_views_sharded",
    "make_face_mesh",
    "make_face_sharded_train_step",
    "render_faces_sharded",
]
