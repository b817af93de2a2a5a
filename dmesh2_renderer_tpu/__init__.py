"""dmesh2_renderer_tpu: TPU-native differentiable triangle rasterizer.

Top-level API mirroring the reference package (``dmesh2_renderer``
exposes ``Renderer`` and ``LayeredRenderer`` at module level):

  * :class:`Renderer` -- differentiable multi-view renderer with AA
    visibility gradients (class API, precomputed rays).
  * :class:`LayeredRenderer` -- exact depth peeling (non-differentiable).
  * :func:`render` -- pure-function full-frame render (jit / shard_map /
    grad friendly).
  * :class:`RasterConfig` -- static configuration (binning capacity etc).
  * :func:`suggest_config` -- scene-probed static capacities (the
    TPU-native replacement for the reference's dynamic buffer resizing).
"""

from dmesh2_renderer_tpu.functional import render
from dmesh2_renderer_tpu.models.layered import LayeredRenderer
from dmesh2_renderer_tpu.models.renderer import Renderer
from dmesh2_renderer_tpu.utils.autotune import suggest_config
from dmesh2_renderer_tpu.utils.config import RasterConfig

__all__ = ["Renderer", "LayeredRenderer", "render", "RasterConfig",
           "suggest_config"]
__version__ = "0.1.0"
