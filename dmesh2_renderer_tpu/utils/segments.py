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

# Bounded LRU on both layers: each by_digest entry pins two (3F,) int32
# DEVICE arrays (~24 MB at 1M faces), and DMesh-style training rewires
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


def static_vertex_order(faces):
    """Host-precomputed stable sort order of the 3F face-corner vertex ids.

    Every face->shared-vertex gradient reduction sorts the SAME 3F-row key
    vector ``concat(faces[:,0], faces[:,1], faces[:,2])`` at runtime -- but
    ``faces`` is topology, fixed across training steps and concrete at the
    eager API boundary. Precomputing ``argsort`` on the host turns each
    runtime 3F-row payload sort into a fixed permutation row-gather
    (RasterConfig.vertex_sort_mode="static"; A/B per-site on chip --
    benchmarks/micro_scatter_stages.py v2/v3 vs s6).

    Returns (vperm (3F,), sorted_vids (3F,)) int32 jnp arrays, or
    (None, None) when ``faces`` is a tracer (inside jit with faces as an
    argument -- callers fall back to the runtime sort). Results are memoized
    on object identity with a content-digest backstop, like the valence
    check (utils.validate).
    """
    import hashlib
    import weakref

    idkey = id(faces)
    in_trace = not _trace_state_clean()
    ent = _vertex_order_cache["by_id"].get(idkey)
    if ent is not None and ent[0]() is faces:
        _vertex_order_cache["by_id"].move_to_end(idkey)
        return _as_device(ent[1], in_trace)
    try:
        f = np.asarray(faces)
    except Exception:  # tracer
        return None, None
    digest = (f.shape, hashlib.sha1(np.ascontiguousarray(f).tobytes()).hexdigest())
    out = _vertex_order_cache["by_digest"].get(digest)
    if out is None:
        vids = np.concatenate([f[:, 0], f[:, 1], f[:, 2]]).astype(np.int32)
        perm = np.argsort(vids, kind="stable").astype(np.int32)
        # Cache NUMPY + a device slot filled only OUTSIDE traces: calling
        # jnp.asarray under an active jit trace yields trace-LOCAL constant
        # tracers, and caching those leaks them into the next trace
        # (UnexpectedTracerError on the second jit using the same topology
        # -- found by the round-5 on-chip A/B sweep, 2026-08-19).
        out = {"np": (perm, vids[perm]), "dev": None}
    _lru_put(_vertex_order_cache["by_digest"], digest, out)
    try:
        _lru_put(_vertex_order_cache["by_id"], idkey, (weakref.ref(faces), out))
    except TypeError:
        pass
    return _as_device(out, in_trace)


def _as_device(ent: dict, in_trace: bool):
    """Return the cached order as arrays safe for the current trace state.

    Outside any trace: memoize one device copy (eager callers reuse it every
    step without re-uploading ~24 MB at 1M faces). Inside a trace: return
    the numpy arrays -- XLA stages them as compile-time constants scoped to
    THIS trace, so nothing trace-local is ever cached.
    """
    if in_trace:
        return ent["np"]
    if ent["dev"] is None:
        ent["dev"] = tuple(jnp.asarray(a) for a in ent["np"])
    return ent["dev"]


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
