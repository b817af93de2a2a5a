"""Numpy port of the reference tet-walk layer generator (test oracle).

Re-derivation of the CUDA pipeline the TPU peel replaces:

  * first hit:  ``firstIntersectCUDA``  (/root/reference/cuda_impl/
    forward.cu:538-709) -- closest Moller-Trumbore hit over ALL faces
    (existence does NOT filter the walk's geometry, only what is recorded),
    then the incident tet whose outward face normal opposes the ray
    (forward.cu:684-708).
  * walk:       ``generateRenderLayersCUDA`` (forward.cu:744-1000) --
    record the current face when it exists; among the other 3 faces of the
    current tet find the UNIQUE exit face (MT-intersecting the ray with
    outward normal along the ray); hop to the neighbor tet via face_tets;
    stop on L layers, grid boundary (neighbor tet -1, forward.cu:983-989),
    or any numeric-inconsistency guard (forward.cu:892-896, 917-922,
    977-981).
  * outward normal: ``tet_face_outward_normal`` (auxiliary.h:382-431) --
    face normal flipped away from the tet centroid.

Python loops, float32 arithmetic matching the kernels. Only used by tests.
"""

from __future__ import annotations

import numpy as np


def _mt(ray_o, ray_d, p0, p1, p2):
    """Moller-Trumbore (auxiliary.h:212-243). Returns (ok, t, u, v); ok is
    False only for denom == 0 (the reference's single edge-case reject)."""
    e1 = p1 - p0
    e2 = p2 - p0
    tv = ray_o - p0
    pv = np.cross(ray_d, e2)
    qv = np.cross(tv, e1)
    den = np.float32(np.dot(pv, e1))
    if den == 0.0:
        return False, 0.0, 0.0, 0.0
    inv = np.float32(1.0) / den
    t = np.float32(np.dot(qv, e2)) * inv
    u = np.float32(np.dot(pv, tv)) * inv
    v = np.float32(np.dot(qv, ray_d)) * inv
    return True, t, u, v


def _outward_normal(verts, faces, tets, face_id, tet_id):
    """auxiliary.h:382-431: face normal, flipped away from the tet centroid."""
    p = verts[faces[face_id]]
    n = np.cross(p[1] - p[0], p[2] - p[0])
    n = n / max(np.linalg.norm(n), 1e-4)
    center = verts[tets[tet_id]].mean(axis=0)
    if np.dot(n, center - p[0]) > 0.0:
        n = -n
    return n


def _first_hit(verts, faces, ray_o, ray_d):
    """Closest MT hit over all faces (forward.cu:648-679 without the
    tile-list early-out, which is a pure optimization for well-posed rays).
    Vectorized over faces; float32 like the kernel. On an exact-t tie the
    reference keeps the EARLIEST face in its min-depth-sorted list; here the
    lowest face id wins (ties are degenerate either way)."""
    p = verts[faces].astype(np.float32)            # (F, 3, 3)
    e1 = p[:, 1] - p[:, 0]
    e2 = p[:, 2] - p[:, 0]
    tv = ray_o[None, :] - p[:, 0]
    pv = np.cross(np.broadcast_to(ray_d, e2.shape), e2)
    qv = np.cross(tv, e1)
    den = (pv * e1).sum(1)
    ok = den != 0.0
    inv = np.where(ok, np.float32(1.0) / np.where(ok, den, 1.0), 0.0).astype(np.float32)
    t = ((qv * e2).sum(1) * inv).astype(np.float32)
    u = ((pv * tv).sum(1) * inv).astype(np.float32)
    v = ((qv * ray_d).sum(1) * inv).astype(np.float32)
    hit = ok & (t >= 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    if not hit.any():
        return -1
    t = np.where(hit, t, np.inf)
    return int(np.argmin(t))


def walk_layers_pixel(verts, faces, tets, face_tets, tet_faces, exist,
                      ray_o, ray_d, num_layers):
    """Layers for ONE ray; returns a list of face ids (the walk's records)."""
    first_face = _first_hit(verts, faces, ray_o, ray_d)
    if first_face < 0:
        return []
    first_tet = -1
    for tet_id in face_tets[first_face]:           # forward.cu:684-708
        if tet_id < 0:
            continue
        n = _outward_normal(verts, faces, tets, first_face, tet_id)
        if np.dot(n, ray_d) < 0.0:
            first_tet = tet_id

    out = []
    curr_face, curr_tet = first_face, first_tet
    while True:
        if exist[curr_face]:                       # forward.cu:853-860
            out.append(curr_face)
            if len(out) >= num_layers:
                return out
        if curr_tet == -1:                         # boundary stop
            return out
        others = [f for f in tet_faces[curr_tet] if f != curr_face]
        if len(others) != 3:                       # guard forward.cu:892-896
            return out
        n_curr = _outward_normal(verts, faces, tets, curr_face, curr_tet)
        if np.dot(n_curr, ray_d) >= 0.0:           # guard forward.cu:917-922
            return out
        exit_faces = []
        for f in others:                           # forward.cu:924-973
            p = verts[faces[f]]
            ok, t, u, v = _mt(ray_o, ray_d, p[0], p[1], p[2])
            if not ok:
                continue
            if not (t >= 0.0 and u >= 0.0 and v >= 0.0 and u + v <= 1.0):
                continue
            n = _outward_normal(verts, faces, tets, f, curr_tet)
            if np.dot(n, ray_d) > 0.0:
                exit_faces.append(f)
        if len(exit_faces) != 1:                   # guard forward.cu:977-981
            return out
        next_face = exit_faces[0]
        next_tet = -1
        for t_id in face_tets[next_face]:          # forward.cu:983-989
            if t_id != curr_tet:
                next_tet = t_id
                break
        curr_face, curr_tet = next_face, next_tet


def walk_layers(verts, faces, tets, face_tets, tet_faces, exist,
                ray_o, ray_d, num_layers):
    """(H, W) image of walk layers. Returns (layers (H,W,L) i32 -1-padded,
    counts (H,W) i32)."""
    h, w, _ = ray_d.shape
    layers = np.full((h, w, num_layers), -1, np.int32)
    counts = np.zeros((h, w), np.int32)
    for y in range(h):
        for x in range(w):
            ids = walk_layers_pixel(verts, faces, tets, face_tets, tet_faces,
                                    exist, ray_o, ray_d[y, x], num_layers)
            layers[y, x, :len(ids)] = ids
            counts[y, x] = len(ids)
    return layers, counts
