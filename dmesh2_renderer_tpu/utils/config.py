"""Global constants for the TPU-native dmesh2 renderer.

These mirror the compile-time configuration of the CUDA reference
(``cuda_impl/config.h:4-5``, ``cuda_impl/auxiliary.h:9-11``) where a constant
is behavioral (tile size, early-termination threshold), and add the
TPU-specific knobs that replace the reference's dynamic device allocations
(static binning capacity, faces-per-chunk streamed into VMEM).
"""

from __future__ import annotations

import dataclasses

# Tile size in pixels. The reference uses 16x16 CUDA blocks
# (cuda_impl/config.h:4-5). We keep 16x16 *pixels per tile* because the tile
# size is behavioral (it determines binning granularity), but on TPU a tile's
# 256 pixels are laid out as an (^, 256) vector block: sublanes carry
# per-face/-channel data, 256 pixels ride the lane dimension (2 x 128 lanes).
TILE_X = 16
TILE_Y = 16
TILE_PIXELS = TILE_X * TILE_Y  # 256

# Early-termination threshold on transmittance, identical to the reference
# (cuda_impl/auxiliary.h:9, used at forward.cu:412).
T_EPS = 1e-4

# Degenerate-edge epsilon used by the AA triangle precompute
# (dmesh2_renderer/pyrenderer.py:4).
AA_EPS = 1e-3

# w-clamping epsilon in projection (dmesh2_renderer/__init__.py:253-255).
W_EPS = 1e-4

# Ray-direction normalization epsilon (dmesh2_renderer/__init__.py:236).
RAY_NORM_EPS = 1e-6

# Default number of (duplicated) face instances a frame may bin. The CUDA
# reference sizes this buffer dynamically after a device->host readback of the
# prefix sum (cuda_impl/renderer.cu:174-183); XLA requires a static capacity,
# so the renderer rounds the requested capacity up to a power of two and
# reports the true instance count for overflow accounting.
DEFAULT_BINNING_CAPACITY = 1 << 18

# Default static cap on how many tiles a single face may be binned into.
# Faces touching more tiles than this are truncated (reported via overflow).
DEFAULT_MAX_TILES_PER_FACE = 64

# Entries per face-stream DMA block. Mosaic can only DMA-slice HBM arrays at
# 128-lane granularity, so the stream is stored as (NB, record_width, 128)
# field-major blocks and tile segments are 128-entry aligned (binning.py).
STREAM_BLOCK = 128

# Faces streamed per chunk from HBM into VMEM inside the compositing kernels
# (the TPU analogue of the reference's 256-face shared-memory staging rounds,
# cuda_impl/forward.cu:228-304). Must equal STREAM_BLOCK in the blocked
# stream layout.
DEFAULT_FACE_CHUNK = STREAM_BLOCK

# Width of one face record in the packed face-stream table (f32 words).
FACE_RECORD_WIDTH = 32

# Width of one per-entry gradient record emitted by the backward kernel.
GRAD_RECORD_WIDTH = 32


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static (trace-time) configuration of one rasterization call."""

    binning_capacity: int = DEFAULT_BINNING_CAPACITY
    max_tiles_per_face: int = DEFAULT_MAX_TILES_PER_FACE
    face_chunk: int = DEFAULT_FACE_CHUNK
    # Giant-face tier: up to this many faces whose tile rect exceeds
    # max_tiles_per_face additionally emit their remaining tiles, up to
    # giant_tiles each (None = the full tile grid, i.e. a camera-filling
    # triangle is fully covered, matching the reference's unbounded
    # duplication, renderer.cu:415-465). 0 disables the tier (oversized
    # faces are clipped to their first max_tiles_per_face tiles, reported
    # via num_truncated).
    num_giant_faces: int = 64
    giant_tiles: int | None = None
    # Exact triangle-vs-tile SAT cull on top of the reference's bbox-rect
    # duplication (renderer.cu:415-465): slots whose tile box the screen
    # triangle does not intersect are dropped at binning time, shrinking
    # every R-sized downstream stage ~20-40% on thin-triangle scenes with
    # identical rendered output -- such entries never pass the kernels' AA/
    # inside tests. Off by default for exact reference emission parity: the
    # one behavioral corner is tau=0 "phantom" coverage from faces crossing
    # the near plane (clamped-projection screen triangles misplace them;
    # the cull drops more of those than the bbox rect does). Only the
    # Renderer pipeline uses it; the LayeredRenderer peel always bins by
    # rect (its hit test is 3-D, not screen-space).
    exact_tile_cull: bool = False
    # Forward-kernel sub-chunk factor (1, 2, or 4): evaluate each 128-entry
    # stream block in ``fwd_subchunks`` pieces so the whole-tile early exit
    # and the tile-tail cutoff act at 128/fwd_subchunks-entry granularity.
    # The headline's mean contributing prefix is ~130 entries/tile, so full
    # 128-blocks overshoot the exit by ~1.5x in (face,pixel) pairs
    # (docs/DESIGN.md roofline, lever 2); finer pieces trade that masked
    # math for more loop steps. DMA stays per 128-block. A/B on chip.
    fwd_subchunks: int = 1
    # Same lever for the backward kernel: pieces of the last active block
    # wholly past the tile's max contributor rank skip the (heavier)
    # gradient math instead of evaluating it fully masked -- the
    # finer-than-tile analogue of the reference's per-pixel n_contrib skip
    # (backward.cu:219-221). DMA stays per 128-block. A/B on chip.
    bwd_subchunks: int = 1
    # How the geometry preprocess feeds the rasterizer:
    #   "split"  -- the caller gathers screen-space AA corners itself
    #               (geometry.face_aa_verts_ccw, its own 3F-row gather with a
    #               custom sort-reduction VJP) and passes (B, F, 3, 2).
    #   "fused"  -- the caller passes verts_image (B, P, 2) and the AA corner
    #               columns ride the pipeline's ONE consolidated corner gather
    #               (binning.gather_face_corners), eliminating a whole 3F-row
    #               gather per step; the rasterize backward then runs the same
    #               valence-bounded sort reduction to return d verts_image.
    # Values and gradients are identical; per-site measurement decides
    # (benchmarks/micro_prep.py p3 vs p0, BENCH_PREP_MODE A/B in bench.py).
    prep_mode: str = "split"
    # Use the Pallas kernels; False falls back to the pure-XLA reference
    # compositor (slow; used by tests and as executable documentation).
    use_pallas: bool = True
    # Run Pallas kernels in interpreter mode (CPU testing).
    interpret: bool = False
    # Gradient-reduction segmented-scan depth for EVERY face->shared-vertex
    # reduction (both the kernel-grad scatter, ops/pallas_bwd, and the
    # screen-space AA chain, geometry.face_aa_verts_ccw): vertices with more
    # incident faces than this get a truncated gradient sum. Real meshes sit
    # at valence ~6; 256 leaves a wide margin while keeping the scan at 8
    # passes instead of log2(3F). The eager APIs validate the true max
    # valence against this cap (utils.validate.check_vertex_valence) and
    # raise instead of truncating.
    max_vertex_valence: int = 256
    # Backward-pass residual compaction: before the gradient kernel + the
    # entry-grad reduction, the sorted entry stream is compacted to each
    # tile's CONTRIBUTING prefix (ranks below the forward pass's per-tile
    # n_contrib; later entries have exactly-zero gradients) -- shrinking
    # every R-sized backward sort/scan several-fold at heavy overdraw. This
    # sets the compacted stream's static capacity. None disables compaction
    # (backward runs on the full binning stream). If the contributing count
    # ever exceeds this, trailing rows lose their gradients; the forward
    # pass reports the count (RasterAux.num_grad_contributing) and
    # Renderer.forward warns when it exceeds this cap (the TPU runtime has
    # no host callbacks, so the backward cannot print). Size it from the
    # profiler's reported contributing count (benchmarks/profile_stages.py)
    # with headroom.
    grad_compact_capacity: int | None = None
    # How the entry-grad reduction orders its records (ops/pallas_bwd
    # scatter_entry_grads): "payload" carries the 29 gradient columns as
    # lax.sort payload operands; "iota" sorts (key, iota) and gathers the
    # columns through the compacted prefix of the permutation (only
    # worthwhile with grad_compact_capacity set). Per-site measurement
    # decides (benchmarks/micro_scatter_stages.py).
    grad_sort_mode: str = "payload"
    # Payload-sort split width: how many gradient columns ride EACH lax.sort
    # alongside the key (grad_sort_mode="payload" only). 15 -> two sorts of
    # <=16 operands; 8 -> four sorts of <=9 operands. Narrower sorts compile
    # and (on some backends) run faster, at the cost of re-sorting the key;
    # splits may permute rows within an equal-key segment, which is safe
    # because consumers only take per-segment sums. Measured per backend via
    # benchmarks/micro_sort_split.py + ab_headline.py.
    grad_sort_split: int = 15
    # How face->shared-vertex gradient reductions aggregate their 3F rows:
    # "sort" runs the runtime payload sort + valence-bounded segmented scan
    # + segment tails (utils/segments.sort_rows_by_key); "static" replaces
    # the whole chain with a host-precomputed (V, maxval) valence-table
    # gather + dense sum over the concrete ``faces`` (utils/segments.
    # static_vertex_table) -- measured 80 -> 21 ms at the 1M-face headline,
    # exact for ANY valence (no max_vertex_valence truncation) -- at both
    # reduction sites (ops/pallas_bwd.scatter_entry_grads and
    # geometry.face_aa_verts_ccw). Falls back to "sort" when faces reaches
    # the op as a tracer with no precomputed table plumbed through, or when
    # the topology's valence distribution is so skewed the padded table
    # would exceed 4x the 3F corner rows.
    vertex_sort_mode: str = "sort"
    # Renderer.forward checks the overflow counter after each call and warns
    # when binning truncated instances (missing geometry). Costs one scalar
    # device->host readback per call; set False in throughput-critical loops
    # and check Renderer.last_aux yourself.
    warn_on_overflow: bool = True

    def __post_init__(self):
        if self.grad_sort_mode not in ("payload", "iota"):
            raise ValueError(
                f"grad_sort_mode must be 'payload' or 'iota', got "
                f"{self.grad_sort_mode!r}"
            )
        if not (1 <= self.grad_sort_split <= 29):
            raise ValueError(
                f"grad_sort_split must be in [1, 29], got "
                f"{self.grad_sort_split!r}"
            )
        if self.vertex_sort_mode not in ("sort", "static"):
            raise ValueError(
                f"vertex_sort_mode must be 'sort' or 'static', got "
                f"{self.vertex_sort_mode!r}"
            )
        if self.fwd_subchunks not in (1, 2, 4):
            raise ValueError(
                f"fwd_subchunks must be 1, 2, or 4, got {self.fwd_subchunks!r}"
            )
        if self.bwd_subchunks not in (1, 2, 4):
            raise ValueError(
                f"bwd_subchunks must be 1, 2, or 4, got {self.bwd_subchunks!r}"
            )
        if self.prep_mode not in ("split", "fused"):
            raise ValueError(
                f"prep_mode must be 'split' or 'fused', got {self.prep_mode!r}"
            )
