"""API-boundary shape/value validation.

TPU-native counterpart of the reference's host-side checks
(``render.cu:62-118, 247-303, 397-429``): the CUDA extension AT_ERRORs on
malformed tensors before launching kernels; we raise ValueError before
tracing, so users get a clear message instead of an XLA shape error.
"""

from __future__ import annotations

import numpy as np


def _shape(x):
    return tuple(getattr(x, "shape", ()))


def check_vertex_valence(faces, max_vertex_valence: int) -> bool:
    """Fail loudly when a vertex's valence exceeds the gradient-scan cap.

    Every face->shared-vertex gradient reduction in this codebase is a
    segmented scan of depth ``RasterConfig.max_vertex_valence`` (see
    ops/pallas_bwd.scatter_entry_grads and geometry.face_aa_verts_ccw); a
    vertex with more incident faces would get a silently TRUNCATED gradient
    sum -- the one contract the reference's atomicAdd aggregation
    (backward.cu:495-529) never breaks. ``faces`` is concrete at trace time
    in the eager APIs, so the true max valence is checkable there.

    Returns True when the check ran (``faces`` concrete), False when
    ``faces`` is a tracer (inside jit -- callers validate beforehand).
    Raises ValueError on violation.
    """
    try:
        f = np.asarray(faces)
    except Exception:  # jax tracer: cannot concretize inside jit
        return False
    if f.size == 0:
        return True
    val = int(np.bincount(f.ravel()).max())
    if val > max_vertex_valence:
        raise ValueError(
            f"mesh has a vertex shared by {val} faces, above "
            f"RasterConfig.max_vertex_valence={max_vertex_valence}: its "
            "gradient would be silently truncated. Set "
            f"RasterConfig(max_vertex_valence={1 << (val - 1).bit_length()}) "
            "(the scan cost is logarithmic in the cap)."
        )
    return True


class _ValenceCache:
    """Memoizes successful valence checks.

    Two levels: an object-identity fast path (zero cost when callers pass
    the same ``faces`` array every step, the common training pattern), backed
    by a content-digest cache so a DIFFERENT same-shape topology -- e.g.
    DMesh-style face rewiring at fixed F -- is re-validated instead of
    silently skipping the guard (advisor round-3 finding). Weakrefs guard
    the id fast path against id reuse after garbage collection.
    """

    def __init__(self):
        self._by_id = {}       # (id, cap) -> weakref to the checked object
        self._digests = set()  # (shape, cap, sha1) that passed

    def check(self, faces, max_vertex_valence: int) -> bool:
        import hashlib
        import weakref

        idkey = (id(faces), max_vertex_valence)
        ref = self._by_id.get(idkey)
        if ref is not None and ref() is faces:
            return True
        try:
            f = np.asarray(faces)
        except Exception:  # tracer inside jit: callers validate beforehand
            return False
        digest = (f.shape, max_vertex_valence,
                  hashlib.sha1(np.ascontiguousarray(f).tobytes()).hexdigest())
        if digest not in self._digests:
            check_vertex_valence(f, max_vertex_valence)  # raises on violation
            self._digests.add(digest)
        try:
            self._by_id[idkey] = weakref.ref(faces)
        except TypeError:
            pass
        return True


# Shared across the eager entry points (models.Renderer, functional.render):
# all of them validate the same contract against the same topology objects.
valence_cache = _ValenceCache()


def check_render_args(verts, faces, verts_color, faces_opacity, faces_intense,
                      background, n_batch, aa_temperature):
    p3 = _shape(verts)
    if len(p3) != 2 or p3[1] != 3:
        raise ValueError(f"verts must be (P, 3), got {p3}")
    p = p3[0]
    fs = _shape(faces)
    if len(fs) != 2 or fs[1] != 3:
        raise ValueError(f"faces must be (F, 3), got {fs}")
    f = fs[0]
    if _shape(verts_color) != (p, 3):
        raise ValueError(
            f"verts_color must be (P, 3) = ({p}, 3), got {_shape(verts_color)}"
        )
    if _shape(faces_opacity) != (f,):
        raise ValueError(
            f"faces_opacity must be (F,) = ({f},), got {_shape(faces_opacity)}"
        )
    if _shape(faces_intense) != (n_batch, f):
        raise ValueError(
            f"faces_intense must be (B, F) = ({n_batch}, {f}), "
            f"got {_shape(faces_intense)}"
        )
    if _shape(background) != (3,):
        raise ValueError(f"background must be (3,), got {_shape(background)}")
    # aa_temperature in [0, 1] (render.cu:113-115)
    tau = float(aa_temperature)
    if not 0.0 <= tau <= 1.0:
        raise ValueError(f"aa_temperature must be in [0, 1], got {tau}")


def check_cameras(mv, proj):
    ms, ps = _shape(mv), _shape(proj)
    if len(ms) != 3 or ms[1:] != (4, 4):
        raise ValueError(f"mv must be (B, 4, 4), got {ms}")
    if ps != ms:
        raise ValueError(f"proj must match mv {ms}, got {ps}")


def check_layered_args(verts, faces, tets, face_tets, tet_faces,
                       faces_existence):
    p3, fs = _shape(verts), _shape(faces)
    if len(p3) != 2 or p3[1] != 3:
        raise ValueError(f"verts must be (P, 3), got {p3}")
    if len(fs) != 2 or fs[1] != 3:
        raise ValueError(f"faces must be (F, 3), got {fs}")
    f = fs[0]
    ts = _shape(tets)
    if len(ts) != 2 or ts[1] != 4:
        raise ValueError(f"tets must be (T, 4), got {ts}")
    if _shape(face_tets) != (f, 2):
        raise ValueError(f"face_tets must be (F, 2) = ({f}, 2), got {_shape(face_tets)}")
    if _shape(tet_faces) != (ts[0], 4):
        raise ValueError(
            f"tet_faces must be (T, 4) = ({ts[0]}, 4), got {_shape(tet_faces)}"
        )
    if _shape(faces_existence) != (f,):
        raise ValueError(
            f"faces_existence must be (F,) = ({f},), got {_shape(faces_existence)}"
        )
