"""Pallas backward compositing kernel (analytic gradients).

TPU-native counterpart of the CUDA backward kernel ``BACKWARD::renderCUDA<3>``
(``cuda_impl/backward.cu:17-532``), re-derived for a front-to-back sweep:

  CUDA (back-to-front)                  TPU (this kernel, front-to-back)
  ------------------------------------  ------------------------------------
  T recovered by division T/(1-a)       T_before carried forward exactly as
  (backward.cu:340-347)                 in the forward pass (no division)
  accum_rec suffix recurrence           suffix = total - prefix: with
  (backward.cu:362-374)                 C_nobg = out_color - T_final*bg known
                                        from the forward residuals,
                                        accum_rec_i = (C_nobg - P_i)/T_after_i
  oarea ring buffer + overflow          AA overlap + gradient recomputed in
  recompute (backward.cu:241-284)       closed form for every face -- pure
                                        rematerialization, no K-buffer at all
  atomicAdd scatter to 6 grad tensors   per-entry gradient records written to
  (backward.cu:495-529)                 the entry's slot in a dense (R, 32)
                                        table; deterministic segment-sum
                                        scatter happens in XLA afterwards

The gradient math (alpha/color/depth/background terms, barycentric-clamp
Jacobian, Moller-Trumbore uv Jacobians) mirrors backward.cu:350-529 and
auxiliary.h:245-357 exactly; only the traversal order and the AA gradient
source differ.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmesh2_renderer_tpu.aa import tri_box_edge_weights_xy
from dmesh2_renderer_tpu.geometry import clamp_bary_uv_grad
from dmesh2_renderer_tpu.utils.config import (
    FACE_RECORD_WIDTH,
    GRAD_RECORD_WIDTH,
    T_EPS,
    TILE_PIXELS,
    TILE_X,
    TILE_Y,
)
from dmesh2_renderer_tpu.ops.binning import REC_AA, REC_C, REC_IN, REC_OP, REC_V, REC_Z
from dmesh2_renderer_tpu.utils.segments import (
    segmented_prefix_sum as _segmented_prefix_sum,
    segment_tails as _segment_tails,
    sort_rows_by_key,
)
from dmesh2_renderer_tpu.ops.pallas_fwd import (
    _col,
    _cumsum_incl,
    blend_scan,
    chunk_face_quantities,
    tile_pack,
)


def _bwd_kernel(
    # scalar prefetch
    starts_ref, counts_ref, pm_ref, ray_o_ref, ncmax_ref,
    # inputs
    stream_ref,   # (NB, 32, 128) HBM field-major blocks
    ray_d_ref,    # (1, 4, 256) VMEM block
    gin_ref,      # (1, 8, 256) VMEM block: [gr, gg, gb, gd, gT, pad...]
    res_ref,      # (1, 8, 256) VMEM block: [Cnr, Cng, Cnb, Dn, Tfin, pTfin, -, -]
    bg_ref,       # (1, 4) VMEM
    # outputs
    gout_ref,     # (NB, 32, 128) HBM: per-entry gradient record blocks
    # scratch
    buf_ref,      # (32, 128) VMEM: one stream block
    grad_ref,     # (32, 128) VMEM: one gradient block
    old_ref,      # (32, 128) VMEM: previous tile's records in a shared block
    carry_ref,    # (8, 256) VMEM: blend-replay carries (subchunks > 1 only)
    sem_in,
    sem_out,
    *,
    grid_x: int,
    grid_y: int,
    chunk: int,
    aa_temperature: float,
    subchunks: int = 1,
):
    t = pl.program_id(0)
    tiles_per_batch = grid_x * grid_y
    b = t // tiles_per_batch
    rem = t - b * tiles_per_batch
    ty = rem // grid_x
    tx = rem - ty * grid_x

    start = starts_ref[t]
    count = counts_ref[t]
    blk0 = start // chunk
    h0 = start - blk0 * chunk  # head rows in the first block: previous tile

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIXELS), 1)
    xx = lane % TILE_X
    yy = lane // TILE_X
    px0 = (pm_ref[2 * b] + tx * TILE_X + xx).astype(jnp.float32)
    py0 = (pm_ref[2 * b + 1] + ty * TILE_Y + yy).astype(jnp.float32)

    rdx = ray_d_ref[0, 0:1, :]
    rdy = ray_d_ref[0, 1:2, :]
    rdz = ray_d_ref[0, 2:3, :]
    ox = ray_o_ref[3 * b]
    oy = ray_o_ref[3 * b + 1]
    oz = ray_o_ref[3 * b + 2]

    g_r = gin_ref[0, 0:1, :]
    g_g = gin_ref[0, 1:2, :]
    g_b = gin_ref[0, 2:3, :]
    g_d = gin_ref[0, 3:4, :]
    g_t = gin_ref[0, 4:5, :]   # cotangent of final_T (face-parallel combine)
    cn_r = res_ref[0, 0:1, :]
    cn_g = res_ref[0, 1:2, :]
    cn_b = res_ref[0, 2:3, :]
    dn = res_ref[0, 3:4, :]
    t_fin = res_ref[0, 4:5, :]
    pt_fin = res_ref[0, 5:6, :]
    # background-term dot product (backward.cu:389-394). A final_T output
    # cotangent rides the same dT/dalpha = -T_fin/(1-a) machinery, so it
    # simply adds to the dot.
    bg_dot = (
        bg_ref[0:1, 0:1] * g_r + bg_ref[0:1, 1:2] * g_g
        + bg_ref[0:1, 2:3] * g_b + g_d + g_t
    )

    nblocks = pl.cdiv(count + h0, chunk)
    # Blocks containing any contributing rank (< per-tile max n_contrib from
    # the forward pass) get the full gradient evaluation; the rest only write
    # zeros -- the tile-level analogue of the reference's per-pixel n_contrib
    # skip (backward.cu:219-221). With ``subchunks > 1`` the skip also acts
    # at (chunk/subchunks)-entry PIECE granularity inside the last active
    # block, trimming its tail pieces (the backward counterpart of the
    # forward's fwd_subchunks early exit; DMA stays whole-block). Block 0
    # always runs so the head merge below happens even for saturated tiles.
    ncmax = ncmax_ref[t]
    nactive = jnp.minimum(pl.cdiv(ncmax + h0, chunk), nblocks)
    n_heavy = jnp.minimum(jnp.maximum(nactive, 1), nblocks)

    # Double-buffered stream DMA (see pallas_fwd). No drain needed: this is
    # a fori loop, so every started block is waited by its own iteration.
    def get_dma(slot, i):
        return pltpu.make_async_copy(
            stream_ref.at[blk0 + i], buf_ref.at[slot], sem_in.at[slot]
        )

    @pl.when(n_heavy > 0)
    def _():
        get_dma(0, 0).start()

    def piece_grads(buf, rank0, carry):
        """Gradient records for one C-entry piece (C = chunk, or chunk /
        subchunks when piece-granular). ``buf`` is entries-major (C, 32);
        ``carry`` = (t_run, p_r, p_g, p_b, p_d) blend-replay prefixes.
        Returns (rec (C, GRAD_RECORD_WIDTH), carry')."""
        t_run, p_r, p_g, p_b, p_d = carry

        q = chunk_face_quantities(
            buf, rank0, count, rdx, rdy, rdz, ox, oy, oz, px0, py0, aa_temperature
        )

        # --- prefix-scan blend replay: T_before and post-blend prefixes ---
        # (same log-step scan as the forward kernel; see blend_scan)
        tb, active, a_eff, w, t_out = blend_scan(q.passes, q.alpha, t_run)
        pa_r = p_r + _cumsum_incl(q.ic_r * w)
        pa_g = p_g + _cumsum_incl(q.ic_g * w)
        pa_b = p_b + _cumsum_incl(q.ic_b * w)
        pa_d = p_d + _cumsum_incl(q.i_d * w)

        # --- vectorized gradient evaluation over (C, 256) ---
        ok = active.astype(jnp.float32)
        t_after = tb * (1.0 - a_eff)
        inv_after = jnp.where(t_after > 0.0, 1.0 / jnp.where(t_after > 0.0, t_after, 1.0), 0.0)

        ar_r = (cn_r - pa_r) * inv_after
        ar_g = (cn_g - pa_g) * inv_after
        ar_b = (cn_b - pa_b) * inv_after
        ar_d = (dn - pa_d) * inv_after

        # dL/dalpha (backward.cu:350-405)
        dl_da = tb * (
            (q.ic_r - ar_r) * g_r + (q.ic_g - ar_g) * g_g + (q.ic_b - ar_b) * g_b
            + (q.i_d - ar_d) * g_d
        )
        bg_den = jnp.where(a_eff < 1.0, 1.0 - a_eff, 1.0)
        bg_fac = jnp.where(a_eff < 1.0, -t_fin / bg_den, -pt_fin)
        dl_da = (dl_da + bg_fac * bg_dot) * ok

        op = _col(buf, REC_OP)
        intense = _col(buf, REC_IN)
        dl_dop = dl_da * q.ratio
        dl_dic_r = g_r * w
        dl_dic_g = g_g * w
        dl_dic_b = g_b * w
        dl_did = g_d * w
        dl_dint = (q.m_r * dl_dic_r + q.m_g * dl_dic_g + q.m_b * dl_dic_b) * ok

        i0 = 1.0 - q.uc - q.vc
        # vertex color grads (backward.cu:439-441), masked by ok via w
        dvc = []
        for ik in (i0, q.uc, q.vc):
            dvc += [ik * dl_dic_r * intense * ok,
                    ik * dl_dic_g * intense * ok,
                    ik * dl_dic_b * intense * ok]
        # vertex depth grads (backward.cu:453-455)
        dvz = [i0 * dl_did * ok, q.uc * dl_did * ok, q.vc * dl_did * ok]

        # barycentric chain (backward.cu:457-475)
        dl_di0 = (_col(buf, REC_C + 0) * dl_dic_r + _col(buf, REC_C + 1) * dl_dic_g
                  + _col(buf, REC_C + 2) * dl_dic_b) * intense + _col(buf, REC_Z + 0) * dl_did
        dl_di1 = (_col(buf, REC_C + 3) * dl_dic_r + _col(buf, REC_C + 4) * dl_dic_g
                  + _col(buf, REC_C + 5) * dl_dic_b) * intense + _col(buf, REC_Z + 1) * dl_did
        dl_di2 = (_col(buf, REC_C + 6) * dl_dic_r + _col(buf, REC_C + 7) * dl_dic_g
                  + _col(buf, REC_C + 8) * dl_dic_b) * intense + _col(buf, REC_Z + 2) * dl_did

        duc_du, duc_dv, dvc_du, dvc_dv = clamp_bary_uv_grad(q.code)
        dl_duc = dl_di1 - dl_di0
        dl_dvc = dl_di2 - dl_di0
        dl_du = dl_duc * duc_du + dl_dvc * dvc_du
        dl_dv = dl_duc * duc_dv + dl_dvc * dvc_dv

        # --- Moller-Trumbore vertex gradients, factored (auxiliary.h:245-290
        # re-derived; see geometry.ray_tri_intersection_uv_grad for the dv
        # fix). Every Jacobian term is (pixel scalar) x (cross of the ray
        # direction with a face vector), so with only THREE per-pixel scalar
        # fields
        #     s_ab = (duv*u + dvv*v)/den,  s_a3 = duv/den,  s_b1 = dvv/den
        # the pixel-reduced gradients collapse to cross products of the
        # reduced moments M_s = [sum s*rd_x, sum s*rd_y, sum s*rd_z] with
        # the face vectors:
        #     sum_px dp1 = -(M_ab x e2) - (t0 x M_b1)
        #     sum_px dp2 =  (t0 x M_a3) - (e1 x M_ab)
        #     sum_px dp0 = -dp1 - dp2 - (M_a3 x e2) - (e1 x M_b1)
        # This replaces ~100 (C, N) VPU ops of the expanded Jacobian with 3
        # field builds + 9 weighted reductions. (Offloading the reductions
        # to the MXU was measured SLOWER on v5e: the 23-field stack concat
        # plus a HIGHEST-precision (3C, N) @ (N, 4) costs more than VPU
        # lane reductions; see docs/DESIGN.md.)
        duv = dl_du * ok
        dvv = dl_dv * ok
        s_ab = (duv * q.u + dvv * q.v) * q.inv
        s_a3 = duv * q.inv
        s_b1 = dvv * q.inv

        # AA vertex grads via the shape derivative (replaces the oarea ring
        # buffer path, backward.cu:241-284, 407-415): per edge e = (a -> b),
        # d area = (dy_e, -dx_e) * (j1 at a, j2 at b) with dx/dy face-only,
        # so only the (C, N) weights j1/j2 enter the pixel reduction.
        if aa_temperature > 0.0:
            dl_doarea = dl_da * op * aa_temperature
            ax = (_col(buf, REC_AA + 0), _col(buf, REC_AA + 2), _col(buf, REC_AA + 4))
            ay = (_col(buf, REC_AA + 1), _col(buf, REC_AA + 3), _col(buf, REC_AA + 5))
            jw = tri_box_edge_weights_xy(
                ax[0], ay[0], ax[1], ay[1], ax[2], ay[2],
                px0, px0 + 1.0, py0, py0 + 1.0,
            )
            aa_fields = [dl_doarea * w for j1j2 in jw for w in j1j2]
        else:
            aa_fields = [jnp.zeros_like(dl_da)] * 6

        def red(x):
            return jnp.sum(x, axis=1, keepdims=True)

        def mom(s):
            return (red(s * rdx), red(s * rdy), red(s * rdz))

        m_ab, m_a3, m_b1 = mom(s_ab), mom(s_a3), mom(s_b1)

        # Face vectors (C, 1) for the cross-product epilogue.
        v0x, v0y, v0z = _col(buf, REC_V + 0), _col(buf, REC_V + 1), _col(buf, REC_V + 2)
        v1x, v1y, v1z = _col(buf, REC_V + 3), _col(buf, REC_V + 4), _col(buf, REC_V + 5)
        v2x, v2y, v2z = _col(buf, REC_V + 6), _col(buf, REC_V + 7), _col(buf, REC_V + 8)
        e1 = (v1x - v0x, v1y - v0y, v1z - v0z)
        e2 = (v2x - v0x, v2y - v0y, v2z - v0z)
        t0 = (ox - v0x, oy - v0y, oz - v0z)

        def cross(a, b):
            return (a[1] * b[2] - a[2] * b[1],
                    a[2] * b[0] - a[0] * b[2],
                    a[0] * b[1] - a[1] * b[0])

        c_ab_e2 = cross(m_ab, e2)
        c_t0_b1 = cross(t0, m_b1)
        c_t0_a3 = cross(t0, m_a3)
        c_e1_ab = cross(e1, m_ab)
        c_a3_e2 = cross(m_a3, e2)
        c_e1_b1 = cross(e1, m_b1)
        dp1 = [-c_ab_e2[k] - c_t0_b1[k] for k in range(3)]
        dp2 = [c_t0_a3[k] - c_e1_ab[k] for k in range(3)]
        dp0 = [-dp1[k] - dp2[k] - c_a3_e2[k] - c_e1_b1[k] for k in range(3)]

        # AA epilogue: combine the reduced edge weights with the face-only
        # edge deltas (outward normal * edge length = (dy, -dx) for CCW).
        r1 = [red(aa_fields[2 * e]) for e in range(3)]
        r2 = [red(aa_fields[2 * e + 1]) for e in range(3)]
        daa = []
        if aa_temperature > 0.0:
            for k in range(3):
                e_in, e_out = (k - 1) % 3, k  # edges ending / starting at k
                dxo = ax[(e_out + 1) % 3] - ax[e_out]
                dyo = ay[(e_out + 1) % 3] - ay[e_out]
                dxi = ax[(e_in + 1) % 3] - ax[e_in]
                dyi = ay[(e_in + 1) % 3] - ay[e_in]
                daa += [dyo * r1[e_out] + dyi * r2[e_in],
                        -dxo * r1[e_out] - dxi * r2[e_in]]
        else:
            daa = [jnp.zeros((buf.shape[0], 1), jnp.float32)] * 6

        # Column layout mirrors the face-record REC_* constants: dp at REC_V,
        # dvc at REC_C, dop/dint at REC_OP/REC_IN, dvz at REC_Z, daa at REC_AA.
        c = buf.shape[0]
        rec = jnp.concatenate(
            dp0 + dp1 + dp2
            + [red(x) for x in dvc]
            + [red(dl_dop), red(dl_dint)]
            + [red(x) for x in dvz]
            + daa
            + [jnp.zeros((c, GRAD_RECORD_WIDTH - 29), jnp.float32)],
            axis=1,
        )
        return rec, (t_out, pa_r[c - 1:c, :], pa_g[c - 1:c, :],
                     pa_b[c - 1:c, :], pa_d[c - 1:c, :])

    zeros = jnp.zeros((1, TILE_PIXELS), jnp.float32)
    ones = jnp.ones((1, TILE_PIXELS), jnp.float32)

    if subchunks == 1:
        def chunk_body(i, carry):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_heavy)
            def _():
                get_dma(jax.lax.rem(i + 1, 2), i + 1).start()

            get_dma(slot, i).wait()
            rank0 = i * chunk - h0
            rec, carry_out = piece_grads(buf_ref[slot].T, rank0, carry)
            out_block = rec.T
            # Head merge: the first block's leading rows hold the PREVIOUS
            # tile's gradient records (tile starts are unaligned); grid
            # programs run sequentially in tile order, so read-modify-write
            # preserves them.
            @pl.when(i == 0)
            def _():
                rd = pltpu.make_async_copy(gout_ref.at[blk0], old_ref, sem_out)
                rd.start()
                rd.wait()
            lane_rank = (
                jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + rank0
            )
            out_block = jnp.where(lane_rank < 0, old_ref[:, :], out_block)
            grad_ref[:, :] = out_block
            out_copy = pltpu.make_async_copy(grad_ref, gout_ref.at[blk0 + i],
                                             sem_out)
            out_copy.start()
            out_copy.wait()
            return carry_out

        jax.lax.fori_loop(0, n_heavy, chunk_body,
                          (ones, zeros, zeros, zeros, zeros))
    else:
        # Piece-granular: the heavy math runs per (chunk/subchunks)-entry
        # static lane slice, gated on the piece containing any contributing
        # rank. Blend-replay carries live in VMEM scratch because the gated
        # bodies can't return values; skipped pieces have no active rows, so
        # leaving the carries untouched is exact.
        sub = chunk // subchunks

        def chunk_body(i, _):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_heavy)
            def _():
                get_dma(jax.lax.rem(i + 1, 2), i + 1).start()

            get_dma(slot, i).wait()
            buf_f = buf_ref[slot]                      # (32, chunk)
            rank0 = i * chunk - h0
            for j in range(subchunks):
                pr0 = rank0 + j * sub

                @pl.when(pr0 < ncmax)
                def _(j=j, pr0=pr0):
                    rec, co = piece_grads(
                        buf_f[:, j * sub:(j + 1) * sub].T, pr0,
                        (carry_ref[0:1, :], carry_ref[1:2, :],
                         carry_ref[2:3, :], carry_ref[3:4, :],
                         carry_ref[4:5, :]),
                    )
                    grad_ref[:, j * sub:(j + 1) * sub] = rec.T
                    for k in range(5):
                        carry_ref[k:k + 1, :] = co[k]

                @pl.when(jnp.logical_not(pr0 < ncmax))
                def _(j=j):
                    grad_ref[:, j * sub:(j + 1) * sub] = jnp.zeros(
                        (GRAD_RECORD_WIDTH, sub), jnp.float32)

            # Head merge (see the subchunks == 1 path): whole-block RMW
            # after the pieces are assembled.
            @pl.when(i == 0)
            def _():
                rd = pltpu.make_async_copy(gout_ref.at[blk0], old_ref, sem_out)
                rd.start()
                rd.wait()
                lane_rank = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) - h0
                )
                grad_ref[:, :] = jnp.where(lane_rank < 0, old_ref[:, :],
                                           grad_ref[:, :])

            out_copy = pltpu.make_async_copy(grad_ref, gout_ref.at[blk0 + i],
                                             sem_out)
            out_copy.start()
            out_copy.wait()
            return 0

        carry_ref[0:1, :] = ones
        carry_ref[1:5, :] = jnp.zeros((4, TILE_PIXELS), jnp.float32)
        jax.lax.fori_loop(0, n_heavy, chunk_body, 0)

    # Saturated tail blocks: every rank here is past the last contributor,
    # so all gradient records are zero -- skip the evaluation entirely.
    def zero_body(i, _):
        grad_ref[:, :] = jnp.zeros((GRAD_RECORD_WIDTH, chunk), jnp.float32)
        cp = pltpu.make_async_copy(grad_ref, gout_ref.at[blk0 + i], sem_out)
        cp.start()
        cp.wait()
        return 0

    jax.lax.fori_loop(n_heavy, nblocks, zero_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("patch_width", "patch_height", "aa_temperature", "chunk",
                     "interpret", "blocked", "subchunks"),
)
def composite_backward(
    face_stream,   # (NB, 32, 128) field-major blocks (binning.block_stream)
    tile_starts,   # (T_total,)
    tile_counts,   # (T_total,)
    nc_tile,       # (T_total,) per-tile max contributor rank (fwd output)
    ray_o_cam,     # (B, 3)
    ray_d,         # (B, H, W, 3)
    background,    # (3,)
    patch_min,     # (B, 2)
    # forward outputs / residuals
    out_color,     # (B, H, W, 3)
    out_depth,     # (B, H, W)
    final_t,       # (B, H, W)
    prev_t,        # (B, H, W)
    # incoming gradients
    g_color,       # (B, H, W, 3)
    g_depth,       # (B, H, W)
    g_final_t,     # (B, H, W) cotangent of final_T (zeros when unused)
    patch_width: int,
    patch_height: int,
    aa_temperature: float,
    chunk: int = 128,
    interpret: bool = False,
    blocked: bool = False,
    subchunks: int = 1,
):
    """Per-entry gradient records in face-stream entry order.

    ``blocked=False``: (R, 32) rows. ``blocked=True``: the kernel's native
    (NB, 32, 128) field-major blocks -- pass these straight to
    scatter_entry_grads so its sort operands slice contiguous field rows
    instead of stride-32 columns of the relayout.
    """
    b, h, w, _ = ray_d.shape
    gx = -(-patch_width // TILE_X)
    gy = -(-patch_height // TILE_Y)
    t_total = b * gx * gy
    nb = face_stream.shape[0]
    assert chunk == face_stream.shape[2], "chunk must equal STREAM_BLOCK"

    stream = face_stream
    from dmesh2_renderer_tpu.ops.pallas_fwd import tile_rays

    ray_d_t = tile_rays(ray_d, gx, gy)
    gin_t = tile_pack(
        [g_color[..., 0], g_color[..., 1], g_color[..., 2], g_depth,
         g_final_t], gx, gy, rows=8,
    )
    cn = out_color - final_t[..., None] * background[None, None, None, :]
    dnm = out_depth - final_t
    res_t = tile_pack(
        [cn[..., 0], cn[..., 1], cn[..., 2], dnm, final_t, prev_t], gx, gy, rows=8
    )
    ray_o_flat = ray_o_cam.reshape(-1).astype(jnp.float32)
    bg4 = jnp.concatenate([background, jnp.zeros((1,), background.dtype)])[None, :]
    pm_flat = patch_min.reshape(-1).astype(jnp.int32)

    kernel = functools.partial(
        _bwd_kernel, grid_x=gx, grid_y=gy, chunk=chunk,
        aa_temperature=aa_temperature, subchunks=subchunks,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(t_total,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),                      # stream
            pl.BlockSpec((1, 4, TILE_PIXELS), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),                    # ray_d
            pl.BlockSpec((1, 8, TILE_PIXELS), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),                    # gin
            pl.BlockSpec((1, 8, TILE_PIXELS), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),                    # residuals
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # bg
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, FACE_RECORD_WIDTH, chunk), jnp.float32),
            pltpu.VMEM((GRAD_RECORD_WIDTH, chunk), jnp.float32),
            pltpu.VMEM((GRAD_RECORD_WIDTH, chunk), jnp.float32),
            pltpu.VMEM((8, TILE_PIXELS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    gout = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, GRAD_RECORD_WIDTH, chunk), jnp.float32),
        interpret=interpret,
    )(tile_starts, tile_counts, pm_flat, ray_o_flat,
      nc_tile.astype(jnp.int32), stream, ray_d_t, gin_t, res_t, bg4)
    if blocked:
        # Kernel-native layout: scatter_entry_grads slices field rows
        # gout[:, i, :] directly -- block-contiguous reads -- instead of
        # stride-32 column slices of the (R, 32) relayout.
        return gout
    from dmesh2_renderer_tpu.ops.binning import unblock_stream

    return unblock_stream(gout)




def scatter_entry_grads(
    grad_records,  # (R, 32) records, or (NB, 32, 128) field-major blocks
    entry_bf,      # (R,) int32 (sentinel = B*F)
    faces,         # (F, 3) int32
    n_verts: int,
    n_batch: int,
    max_tiles_per_face: int = 64,
    max_vertex_valence: int = 256,
    giant_ids=None,            # (M2,) int32 tier-2 face ids (sentinel B*F)
    giant_seg_len: int = 0,    # static bound on a tier-2 face's entry count
    keep=None,                 # (R,) bool contributing mask (binning.
                               # contributing_mask); None = keep everything
    compact_capacity: int | None = None,  # static post-sort prefix length
    sort_mode: str = "payload",  # "payload" | "iota" (see sort comment)
    sort_split: int = 15,        # payload columns per split sort (and the
                                 # gather-piece width on the iota path)
    vtable=None,               # (V, maxval) int32 host-precomputed valence
                               # table (utils/segments.static_vertex_table);
                               # None = runtime sort
):
    """Deterministic reduction of per-entry grads to the six input tensors.

    The TPU replacement for the CUDA atomicAdd aggregation
    (backward.cu:495-529). XLA TPU scatters cost ~50x a sort of the same
    size (measured), so no R-sized scatter is used: entries are SORTED by
    (batch, face) id -- each face's <= Kt tile duplicates become a contiguous
    segment -- then segment-summed with a log2(Kt)-step segmented
    Hillis-Steele scan (numerically local: no global prefix sums), and the
    per-face totals are gathered at each segment's last row. Only F-sized
    scatters remain (faces -> shared vertices). Fully deterministic.

    Residual compaction (``keep`` + ``compact_capacity``): entries outside
    a tile's contributing prefix have exactly-zero records, so their keys
    are masked to the sentinel -- they sort to the end, and every post-sort
    stage (scans, tails, ladder) runs on the static ``compact_capacity``
    prefix instead of R (~1/4 of R at the 1080p headline). The sort itself
    stays R-sized: pre-compacting its operands was measured strictly more
    expensive than the savings (an index-map + 29-column regather costs
    ~115 ms to save ~106 of sort -- benchmarks/micro_compact.py). If the
    contributing count exceeds the capacity, trailing rows drop silently
    here (the axon TPU runtime supports no host callbacks, so no
    jax.debug.print); the forward pass reports the count via
    RasterAux.num_grad_contributing and Renderer.forward warns on it.

    Returns (d_verts (P,3), d_verts_color (P,3), d_faces_opacity (F,),
    d_verts_ndc_z (B,P), d_faces_intense (B,F), d_aa_face_verts (B,F,3,2)).
    """
    if grad_records.ndim == 3:
        # Field-major blocks from composite_backward(blocked=True): field i
        # is the block-contiguous slice [:, i, :] -- no (R, 32) relayout and
        # no stride-32 column extraction ahead of the sorts.
        nb_blk, _w, blk = grad_records.shape
        r = nb_blk * blk
        cols = [grad_records[:, i, :].reshape(r) for i in range(29)]
    else:
        r = grad_records.shape[0]
        cols = [grad_records[:, i] for i in range(29)]
    f = faces.shape[0]
    bf = n_batch * f

    key = entry_bf
    r2 = r
    if keep is not None and compact_capacity is not None:
        key = jnp.where(keep, entry_bf, bf)
        r2 = min(r, compact_capacity)

    # Sort grads by entry id; sentinel/garbage rows (id == BF, including the
    # never-written tail past the last tile) sort to the end and are dropped
    # by the validity masks below.
    #
    # "payload": the 29 gradient columns ride the sort as PAYLOAD operands
    # (utils/segments.sort_rows_by_key: two sorts sharing the key; measured
    # 176 ms vs 261 ms for sort(key, iota) + FULL-R permutation gathers at
    # R = 5.25M, benchmarks/micro_sortcarry.py). The split sorts may order
    # rows differently within a segment -- irrelevant, since only
    # permutation-invariant per-segment SUMS are consumed.
    #
    # "iota": sort (key, iota) only and gather the 29 columns through the
    # COMPACTED r2-prefix of the permutation -- with compaction the gather
    # is ~r2/R the size that lost in round 2, while the sort drops from 30
    # operands to 2 (benchmarks/micro_scatter_stages.py decides per-site).
    #
    # NaN garbage is masked to zero before the scan so it cannot poison
    # real segments.
    if sort_mode == "iota":
        sbf, pos = jax.lax.sort(
            (key, jnp.arange(r, dtype=jnp.int32)), num_keys=1, is_stable=True)
        sbf, pos = sbf[:r2], pos[:r2]
        mask = (sbf < bf)[:, None]
        rec_pieces = [
            jnp.where(mask,
                      jnp.stack([cols[i][pos]
                                 for i in range(s, min(s + sort_split, 29))],
                                axis=1), 0.0)
            for s in range(0, 29, sort_split)
        ]
    else:
        sbf, rec_pieces = sort_rows_by_key(key, cols, max_payloads=sort_split)
        sbf = sbf[:r2]
        rec_pieces = [p[:r2] for p in rec_pieces]
        mask = (sbf < bf)[:, None]
        rec_pieces = [jnp.where(mask, p, 0.0) for p in rec_pieces]

    # Segmented inclusive prefix sum along rows: segments are runs of equal
    # sbf, each of length <= Kt by construction (a face is binned into at
    # most Kt tiles), so log2(Kt) shifted masked adds suffice.
    accs = [_segmented_prefix_sum(p, sbf, max_tiles_per_face)
            for p in rec_pieces]

    # Last row of each segment holds the full segment sum.
    d_face = _segment_tails(accs, sbf, bf)[:, :29]

    # Giant-tier correction: a tier-2 face has up to giant_seg_len entries,
    # far beyond the Kt-deep scan window, so its tail row only holds the sum
    # of its last ``win`` rows. The Hillis-Steele scan doubles its stride
    # while s < Kt, so the window every row holds exactly is the next power
    # of two >= Kt (for non-pow2 Kt the scan overshoots; striding the ladder
    # by Kt there would double-count rows). The full segment sum is the
    # ladder
    #   sum_j acc[last - j*win]  for  last - j*win >= first
    # (windows abut exactly; the lowest is clipped to the segment by the
    # scan's own key masking). M2 x ceil(len/win) rows -- a tiny gather.
    if giant_ids is not None and giant_ids.shape[0] > 0 and giant_seg_len > 0:
        m2 = giant_ids.shape[0]
        valid_g = giant_ids < bf
        safe_g = jnp.where(valid_g, giant_ids, 0)
        first = jnp.searchsorted(sbf, safe_g, side="left").astype(jnp.int32)
        last = jnp.searchsorted(sbf, safe_g, side="right").astype(jnp.int32) - 1
        win = 1 << max(0, (max_tiles_per_face - 1).bit_length())
        nlad = -(-giant_seg_len // win)
        pos = last[:, None] - win * jnp.arange(nlad, dtype=jnp.int32)[None, :]
        ok = (pos >= first[:, None]) & valid_g[:, None]
        posc = jnp.maximum(pos, 0).reshape(-1)
        seg = jnp.concatenate([a[posc] for a in accs], axis=1)[:, :29]
        seg = jnp.where(ok.reshape(-1)[:, None], seg, 0.0)
        tot = seg.reshape(m2, nlad, 29).sum(axis=1)
        idx = jnp.where(valid_g, safe_g, bf)
        d_face = d_face.at[idx].set(tot, mode="drop", unique_indices=True)

    d_face = d_face.reshape(n_batch, f, 29)

    # Face -> shared-vertex reduction: same sort + segmented-scan machinery
    # over the 3F face-corner incidences (an XLA scatter-add here costs 3-4x
    # more, measured). Scan depth is log2(max_vertex_valence), NOT log2(3F):
    # a vertex with more than ``max_vertex_valence`` incident faces would get
    # a truncated gradient sum, but real meshes sit at valence ~6 and the
    # default (256) leaves a 40x margin while saving ~2/3 of the scan passes
    # at 1M-face scale.
    d_fsum = d_face.sum(axis=0)                               # (F, 29)
    contrib = jnp.concatenate(
        [
            jnp.concatenate(
                [
                    d_fsum[:, REC_V + 3 * k:REC_V + 3 * k + 3],
                    d_fsum[:, REC_C + 3 * k:REC_C + 3 * k + 3],
                    d_face[:, :, REC_Z + k].T,                # (F, B)
                ],
                axis=1,
            )
            for k in range(3)
        ],
        axis=0,
    )                                                          # (3F, 6 + B)
    if vtable is not None:
        # Static topology: the whole sort + segmented scan + segment tails
        # collapses to one fixed valence-table row-gather + a dense sum
        # (80 -> 21 ms at the 1M-face headline; utils/segments.
        # static_vertex_table docstring). Exact for any valence.
        from dmesh2_renderer_tpu.utils.segments import vertex_table_reduce

        pieces = ([contrib] if 6 + n_batch <= 15 else
                  [contrib[:, s:s + 15] for s in range(0, 6 + n_batch, 15)])
        d_vert_all = vertex_table_reduce(pieces, vtable, n_verts)
    else:
        vids = jnp.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
        sv, contrib_pieces = sort_rows_by_key(
            vids, [contrib[:, i] for i in range(6 + n_batch)]
        )
        vaccs = [_segmented_prefix_sum(p, sv, min(3 * f, max_vertex_valence))
                 for p in contrib_pieces]
        d_vert_all = _segment_tails(vaccs, sv, n_verts)        # (P, 6 + B)
    d_verts = d_vert_all[:, 0:3]
    d_vcolor = d_vert_all[:, 3:6]
    d_vndc_z = d_vert_all[:, 6:6 + n_batch].T

    d_op = d_fsum[:, REC_OP]
    d_int = d_face[:, :, REC_IN]
    d_aa = d_face[:, :, REC_AA:REC_AA + 6].reshape(n_batch, f, 3, 2)
    return d_verts, d_vcolor, d_op, d_vndc_z, d_int, d_aa
