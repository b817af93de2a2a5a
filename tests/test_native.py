"""Native meshio (C++) vs the pure-Python reference implementation."""

import numpy as np
import pytest

from dmesh2_renderer_tpu.utils import native


def _python_tet_grid(res, extent):
    # Call the fallback path directly by bypassing the native branch.
    from dmesh2_renderer_tpu.utils import meshes

    lib = native._lib
    failed = native._failed
    try:
        native._lib, native._failed = None, True
        return meshes.tet_grid(res, extent)
    finally:
        native._lib, native._failed = lib, failed


@pytest.mark.skipif(native.load() is None, reason="no C++ toolchain")
def test_native_tet_grid_matches_python():
    res, extent = 3, 1.2
    nv, nt = native.tet_grid(res, extent)
    nf, nft, ntf = native.tet_adjacency(nt)
    pv, pt, pf, pft, ptf = _python_tet_grid(res, extent)
    np.testing.assert_allclose(nv, pv, atol=1e-6)
    np.testing.assert_array_equal(nt, pt)
    np.testing.assert_array_equal(nf, pf)
    np.testing.assert_array_equal(nft, pft)
    np.testing.assert_array_equal(ntf, ptf)


@pytest.mark.skipif(native.load() is None, reason="no C++ toolchain")
def test_native_adjacency_invariants():
    _, nt = native.tet_grid(4, 1.0)
    faces, face_tets, tet_faces = native.tet_adjacency(nt)
    # every face belongs to 1 or 2 tets; every tet references 4 valid faces
    assert (face_tets[:, 0] >= 0).all()
    assert ((face_tets[:, 1] == -1) | (face_tets[:, 1] >= 0)).all()
    assert (tet_faces >= 0).all() and (tet_faces < faces.shape[0]).all()
    # interior faces of a 4^3 grid exist
    assert (face_tets[:, 1] >= 0).sum() > 0
    # each tet's 4 faces are distinct
    assert all(len(set(row)) == 4 for row in tet_faces[:16])
