"""Segmented reductions over sorted keys (TPU scatter-add replacement).

XLA TPU scatters run far below sort/gather throughput (measured ~50x a
same-size sort; docs/DESIGN.md), so every many-to-few reduction in this
codebase is expressed as sort + segmented Hillis-Steele scan + segment-tail
extraction. Shared by the gradient reduction (ops/pallas_bwd.py) and the
screen-space AA chain (geometry.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


import collections

try:  # removed from the public jax.core namespace in jax 0.9
    from jax._src.core import trace_state_clean as _trace_state_clean
except ImportError:  # pragma: no cover - version drift fallback
    def _trace_state_clean():
        # Creating an array under an active trace yields a Tracer.
        return not isinstance(jnp.zeros((), jnp.int32), jax.core.Tracer)

# Bounded LRU on both layers: each by_digest entry pins a (V, maxval) int32
# table (~12 MB host + device at 1M faces), and DMesh-style training rewires
# topology at fixed F -- an unbounded cache would leak device memory one
# topology at a time. 4 live topologies covers any sane training loop.
_VERTEX_ORDER_CACHE_SIZE = 4
_vertex_order_cache: dict = {
    "by_id": collections.OrderedDict(),
    "by_digest": collections.OrderedDict(),
}


def _lru_put(od: "collections.OrderedDict", key, value,
             cap: int = _VERTEX_ORDER_CACHE_SIZE):
    od[key] = value
    od.move_to_end(key)
    while len(od) > cap:
        od.popitem(last=False)


def static_vertex_table(faces, n_verts: int, max_rows_factor: int = 4):
    """Host-precomputed (V, maxval) valence table into the 3F corner rows.

    Row ``v`` lists the indices (into the ``concat(faces[:,0], faces[:,1],
    faces[:,2])`` corner axis) of every face-corner incident to vertex
    ``v``, padded with the sentinel ``3F``. ``faces`` is topology -- fixed
    across training steps and concrete at the eager API boundary -- so the
    whole face->shared-vertex gradient reduction collapses from a runtime
    3F-row payload sort + segmented scan + segment tails (~80 ms at the 1M-
    face headline) to ONE fixed row-gather + a dense ``maxval``-axis sum
    (~21 ms measured: benchmarks/micro_scatter_stages.py v3 vs s6+s7,
    2026-08-19). Exact for ANY valence -- no scan-depth truncation --
    because ``maxval`` is the topology's true maximum valence.

    Returns an int32 (V, maxval) array, or None when ``faces`` is a tracer
    (inside jit with faces as an argument -- callers fall back to the
    runtime sort) or when the table would exceed ``max_rows_factor * 3F``
    rows (a pathologically skewed valence distribution would waste more
    gather volume than the sort costs). Results are memoized on object
    identity with a content-digest backstop, like the valence check
    (utils.validate).
    """
    import hashlib
    import weakref

    idkey = (id(faces), n_verts)
    in_trace = not _trace_state_clean()
    ent = _vertex_order_cache["by_id"].get(idkey)
    if ent is not None and ent[0]() is faces:
        _vertex_order_cache["by_id"].move_to_end(idkey)
        return _as_device(ent[1], in_trace)
    try:
        f = np.asarray(faces)
    except Exception:  # tracer
        return None
    digest = (f.shape, n_verts,
              hashlib.sha1(np.ascontiguousarray(f).tobytes()).hexdigest())
    out = _vertex_order_cache["by_digest"].get(digest)
    if out is None:
        nf3 = 3 * f.shape[0]
        vids = np.concatenate([f[:, 0], f[:, 1], f[:, 2]]).astype(np.int64)
        counts = np.bincount(vids, minlength=n_verts)
        maxval = int(counts.max()) if nf3 else 1
        if n_verts * max(maxval, 1) > max_rows_factor * max(nf3, 1):
            out = {"np": None, "dev": None}
        else:
            order = np.argsort(vids, kind="stable")
            sv = vids[order]
            starts = np.zeros(n_verts + 1, np.int64)
            np.cumsum(counts, out=starts[1:])
            table = np.full((n_verts, maxval), nf3, np.int32)
            table[sv, np.arange(nf3) - starts[sv]] = order.astype(np.int32)
            # Cache NUMPY + a device slot filled only OUTSIDE traces:
            # calling jnp.asarray under an active jit trace yields trace-
            # LOCAL constant tracers, and caching those leaks them into the
            # next trace (UnexpectedTracerError on the second jit using the
            # same topology -- found by the round-5 on-chip A/B sweep).
            out = {"np": table, "dev": None}
    _lru_put(_vertex_order_cache["by_digest"], digest, out)
    try:
        _lru_put(_vertex_order_cache["by_id"], idkey, (weakref.ref(faces), out))
    except TypeError:
        pass
    return _as_device(out, in_trace)


def _as_device(ent: dict, in_trace: bool):
    """Return the cached table as an array safe for the current trace state.

    Outside any trace: memoize one device copy (eager callers reuse it every
    step without re-uploading ~12 MB at 1M faces). Inside a trace: return
    the numpy array -- XLA stages it as a compile-time constant scoped to
    THIS trace, so nothing trace-local is ever cached.
    """
    if ent["np"] is None:
        return None
    if in_trace:
        return ent["np"]
    if ent["dev"] is None:
        ent["dev"] = jnp.asarray(ent["np"])
    return ent["dev"]


def vertex_table_reduce(contrib, vtable, n_verts: int):
    """Sum (3F, W) corner contributions onto (V, W) via the static table.

    ``contrib`` may be one matrix or a list of column blocks; blocks are
    gathered separately (narrow contiguous gathers beat wide ones -- the
    XLA gather pathology, docs/DESIGN.md) and concatenated. The sentinel
    row 3F gathers a zero row, so padded slots contribute nothing.
    """
    blocks = contrib if isinstance(contrib, (list, tuple)) else (contrib,)
    maxval = vtable.shape[1]
    idx = vtable.reshape(-1)
    outs = []
    for blk in blocks:
        w = blk.shape[1]
        padded = jnp.concatenate(
            [blk, jnp.zeros((1, w), blk.dtype)], axis=0)
        outs.append(padded[idx].reshape(n_verts, maxval, w).sum(axis=1))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def sort_rows_by_key(keys, cols, max_payloads: int = 15):
    """Stable-sort rows by ``keys``, carrying ``cols`` as lax.sort payloads.

    Carrying payload columns through the sort beats sort(key, iota) + a
    permutation row-gather (measured 176 vs 261 ms at 5.25M rows x 29 cols;
    benchmarks/micro_sortcarry.py). Splitting across several sorts sharing
    the key bounds compile time (a 30-operand sort does not finish
    compiling). The splits may order rows differently WITHIN a segment of
    equal keys -- callers must only consume permutation-invariant
    per-segment reductions.

    Returns (sorted_keys, [pieces]): one (R, <=max_payloads) matrix per
    split sort. Pieces stay separate on purpose -- downstream segment-tail
    gathers from NARROW matrices run far faster than from one wide one
    (same XLA gather pathology as the face tables; docs/DESIGN.md).
    """
    pieces, sk = [], None
    for s in range(0, len(cols), max_payloads):
        o = jax.lax.sort((keys, *cols[s:s + max_payloads]), num_keys=1,
                         is_stable=True)
        sk = o[0]
        pieces.append(jnp.stack(o[1:], axis=1))
    return sk, pieces


def shift_rows(x, s, fill):
    pad = jnp.full((s,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[: x.shape[0] - s]], axis=0)


def segmented_prefix_sum(rec, keys, max_run):
    """Inclusive segmented prefix sum over rows grouped by sorted ``keys``.

    Hillis-Steele with log2(max_run) shifted masked adds -- numerically
    local (each row only ever sums values from its own segment, unlike a
    global cumsum + boundary-difference, which loses precision to the
    running prefix). Rows further than 2^ceil(log2(max_run)) from their
    segment start get a truncated sum -- size max_run to the longest
    segment you need exact.
    """
    acc = rec
    s = 1
    while s < max_run:
        same = shift_rows(keys[:, None], s, -1) == keys[:, None]
        acc = acc + jnp.where(same, shift_rows(acc, s, 0.0), 0.0)
        s *= 2
    return acc


def segment_tails(acc, keys, n_out):
    """Gather each segment's last row (= its segment sum) into (n_out, W).

    ``keys`` must be sorted; out-of-range keys (sentinels) are dropped;
    segments absent from ``keys`` yield zero rows. Implemented as a
    scatter-max of positions + an n_out-row gather: cheaper than both
    searchsorted lowerings at the scales used here (measured 61 vs 80 vs
    907 ms at 6M rows -> 1M segments).

    ``acc`` may be a list/tuple of column blocks sharing ``keys``; the
    blocks are gathered per-piece and concatenated (narrow contiguous
    gathers are faster than wide ones).
    """
    r = keys.shape[0]
    pos = jnp.arange(r, dtype=jnp.int32)
    last = jnp.full((n_out,), -1, jnp.int32).at[
        jnp.minimum(keys, n_out)
    ].max(pos, mode="drop")
    safe = jnp.maximum(last, 0)
    valid = last >= 0
    accs = acc if isinstance(acc, (list, tuple)) else (acc,)
    out = [jnp.where(valid[:, None], a[safe], 0.0) for a in accs]
    return out[0] if len(out) == 1 else jnp.concatenate(out, axis=1)
