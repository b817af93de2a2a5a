"""Generate golden AA overlap fixtures by EXECUTING the reference's own
pure-torch oracle.

SURVEY.md section 4 calls for golden parity fixtures generated from the
reference since its CUDA kernels cannot run on this host -- but its
``pyrenderer.py`` (the executable spec of ``aa.h``, torch-CPU only) CAN.
This script imports ``/root/reference/dmesh2_renderer/pyrenderer.py`` by
file path (the package ``__init__`` would pull in the compiled ``_C`` CUDA
extension), evaluates ``tri_pixel_overlap_area`` with the AUTOGRAD gradient
path (``pyrenderer.py:427-431``; the analytic wrapper hardcodes float32
internals, and autograd-vs-analytic agreement was the reference author's own
validation method) on seeded random (triangle, pixel) pairs in float64, and
writes ``aa_golden.npz``. ``tests/test_golden_aa.py`` then
checks this repo's closed-form winding-integral implementation against the
recorded reference outputs -- parity evidence against reference CODE, not
against a re-derivation.

Run (only needed to regenerate the committed fixture):
    python tests/golden/make_golden.py
"""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import torch as th

REF = os.environ.get("DMESH2_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "aa_golden.npz")

SEED = 20260818
N_TRI = 64
N_PIX = 16
N_PAIRS = 512


def load_reference_pyrenderer():
    path = os.path.join(REF, "dmesh2_renderer", "pyrenderer.py")
    spec = importlib.util.spec_from_file_location("ref_pyrenderer", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def ccw_numpy(p0, p1, p2):
    """Pre-order CCW so the reference's in-place ``order_ccw`` swap is a
    no-op (keeps vertex correspondence AND keeps autograd leaves clean)."""
    area2 = (p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1]) - (
        p2[:, 0] - p0[:, 0]
    ) * (p1[:, 1] - p0[:, 1])
    swap = area2 < 0
    p1s, p2s = p1.copy(), p2.copy()
    p1s[swap], p2s[swap] = p2[swap], p1[swap]
    return p0, p1s, p2s


def main():
    # The reference builds internal constants (eye_2b2 etc.) with torch's
    # default dtype; run the whole oracle in float64.
    th.set_default_dtype(th.float64)
    ref = load_reference_pyrenderer()
    rng = np.random.default_rng(SEED)

    # Triangles spanning reject / partial-overlap / containment regimes
    # around pixels near the unit box: small, medium, and pixel-swallowing.
    scale = rng.choice([0.4, 1.0, 4.0], size=(N_TRI, 1, 1))
    tri = rng.uniform(-0.8, 1.8, size=(N_TRI, 3, 2)) * scale
    p0, p1, p2 = ccw_numpy(tri[:, 0], tri[:, 1], tri[:, 2])
    tri = np.stack([p0, p1, p2], axis=1)

    pix_min = rng.uniform(-0.5, 0.5, size=(N_PIX, 2))
    pix_size = rng.uniform(0.3, 1.5, size=(N_PIX, 2))
    pix_max = pix_min + pix_size

    tid = rng.integers(0, N_TRI, size=N_PAIRS)
    pid = rng.integers(0, N_PIX, size=N_PAIRS)

    areas = np.zeros(N_PAIRS)
    grads = np.zeros((N_PAIRS, 3, 2))
    degenerate = np.zeros(N_PAIRS, dtype=bool)
    polys = np.zeros((N_PAIRS, 10, 2))
    poly_counts = np.zeros(N_PAIRS, dtype=np.int32)

    for k in range(N_PAIRS):
        l0 = th.tensor(tri[tid[k], 0], dtype=th.float64, requires_grad=True)
        l1 = th.tensor(tri[tid[k], 1], dtype=th.float64, requires_grad=True)
        l2 = th.tensor(tri[tid[k], 2], dtype=th.float64, requires_grad=True)
        # Clones: Triangles.order_ccw swaps IN PLACE; already-CCW input makes
        # the swap empty, and non-leaf clones keep torch happy about it.
        tris = ref.Triangles(l0[None].clone(), l1[None].clone(),
                             l2[None].clone())
        pixs = ref.Pixels(th.tensor(pix_min[pid[k]][None], dtype=th.float64),
                          th.tensor(pix_max[pid[k]][None], dtype=th.float64))
        # use_autograd=True: the reference's dtype-clean path (its analytic
        # wrapper hardcodes float32 internals); autograd-vs-analytic
        # agreement was the reference author's own validation method
        # (SURVEY.md section 4), so either is authoritative.
        try:
            out = ref.tri_pixel_overlap_area(tris, pixs, 0, 0,
                                             use_autograd=True)
        except ValueError as e:  # E00-E05 degenerate configuration
            degenerate[k] = True
            print(f"pair {k}: {e}")
            continue
        area = out[0]
        # Second return: the clip polygon (walk emission order) / the four
        # pixel corners (containment) / [] (separated) -- the same contract
        # our pyrenderer mirror reproduces.
        pg = out[1]
        if isinstance(pg, th.Tensor):
            pgn = pg.detach().numpy().reshape(-1, 2)
        elif len(pg):
            pgn = np.stack([q.detach().numpy() for q in pg])
        else:
            pgn = np.zeros((0, 2))
        poly_counts[k] = pgn.shape[0]
        polys[k, : pgn.shape[0]] = pgn
        if isinstance(area, th.Tensor):
            if area.requires_grad:
                area.backward()
                for i, leaf in enumerate((l0, l1, l2)):
                    if leaf.grad is not None:
                        grads[k, i] = leaf.grad.detach().numpy()
            areas[k] = float(area.detach())
        else:
            # fast-path python float (separating edge) or containment
            # pxarea: d(area)/d(verts) = 0 exactly in both regimes.
            areas[k] = float(area)

    np.savez_compressed(
        OUT,
        tri_verts=tri, pix_min=pix_min, pix_max=pix_max,
        tid=tid, pid=pid, area=areas, grad=grads, degenerate=degenerate,
        poly=polys, poly_count=poly_counts,
        seed=np.int64(SEED),
    )
    n_zero = int((areas == 0).sum())
    print(f"wrote {OUT}: {N_PAIRS} pairs, {n_zero} zero-area, "
          f"{int((np.abs(grads).sum(axis=(1, 2)) > 0).sum())} with grads")


if __name__ == "__main__":
    sys.exit(main())
