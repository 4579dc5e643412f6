"""Native FEM graph-builder (native/fem_graph.cpp) vs numpy fallbacks."""

import os

import numpy as np
import pytest

from hippyflow_tpu.fem import native
from hippyflow_tpu.fem import FunctionSpace, unit_square_mesh, rectangle_mesh
from hippyflow_tpu.fem.mesh import boundary_edges
from hippyflow_tpu.fem.observation import locate_points


requires_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++)"
)


@requires_native
def test_rectangle_cells_match_fallback():
    for diagonal in ("right", "left"):
        nat = native.build_rectangle_cells(5, 3, diagonal)
        os.environ["HIPPYFLOW_TPU_NO_NATIVE"] = "1"
        try:
            # rebuild through the python fallback path
            import hippyflow_tpu.fem.native as nmod

            saved_lib, saved_tried = nmod._lib, nmod._tried
            nmod._lib, nmod._tried = None, True
            mesh = rectangle_mesh(5, 3, diagonal=diagonal)
            nmod._lib, nmod._tried = saved_lib, saved_tried
        finally:
            del os.environ["HIPPYFLOW_TPU_NO_NATIVE"]
        np.testing.assert_array_equal(nat, mesh.cells)


@requires_native
def test_boundary_edges_match():
    mesh = unit_square_mesh(6)
    nat = native.boundary_edges(mesh.cells)
    # numpy reference
    c = mesh.cells
    edges = np.concatenate([c[:, [0, 1]], c[:, [1, 2]], c[:, [2, 0]]], axis=0)
    key = np.sort(edges, axis=1)
    _, idx, counts = np.unique(key, axis=0, return_index=True, return_counts=True)
    ref = edges[idx[counts == 1]]
    assert nat.shape == ref.shape
    # same edge set (order-insensitive, orientation preserved)
    nat_set = {tuple(e) for e in nat.tolist()}
    ref_set = {tuple(e) for e in ref.tolist()}
    assert nat_set == ref_set


@requires_native
def test_band_indices_match():
    mesh = unit_square_mesh(4)
    s = 5
    cells = mesh.cells
    nat = native.band_indices(cells, s)
    g1 = np.repeat(cells, 3, axis=1).reshape(-1)
    g2 = np.tile(cells, (1, 3)).reshape(-1)
    o = g2 // s - g1 // s + 1
    ref = g1 * (3 * s) + o * s + (g2 % s)
    np.testing.assert_array_equal(nat, ref)


@requires_native
def test_locate_points_match():
    V = FunctionSpace(unit_square_mesh(9))
    rng = np.random.RandomState(0)
    targets = rng.uniform(0.05, 0.95, (50, 2))
    ids, w = native.locate_points(V.mesh.vertices, V.mesh.cells, targets)
    assert (ids >= 0).all()
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-12)
    # interpolation of an affine field is exact regardless of which
    # containing cell is chosen on edges
    f = lambda x: 2.0 * x[:, 0] - 3.0 * x[:, 1] + 0.25
    nodal = f(V.mesh.vertices)
    interp = np.einsum("tk,tk->t", nodal[V.mesh.cells[ids]], w)
    np.testing.assert_allclose(interp, f(targets), atol=1e-12)
    # outside point flagged
    ids_out, _ = native.locate_points(
        V.mesh.vertices, V.mesh.cells, np.array([[2.0, 2.0]])
    )
    assert ids_out[0] == -1
    # and the public API raises
    with pytest.raises(ValueError):
        locate_points(V, np.array([[2.0, 2.0]]))


@requires_native
def test_locate_points_matches_numpy_weights():
    import hippyflow_tpu.fem.native as nmod

    V = FunctionSpace(unit_square_mesh(7))
    rng = np.random.RandomState(1)
    targets = rng.uniform(0.1, 0.9, (20, 2))
    ids_n, w_n = locate_points(V, targets)
    saved_lib, saved_tried = nmod._lib, nmod._tried
    nmod._lib, nmod._tried = None, True
    try:
        ids_p, w_p = locate_points(V, targets)
    finally:
        nmod._lib, nmod._tried = saved_lib, saved_tried
    # interpolated values agree even if tie-broken to a different cell
    nodal = rng.randn(V.dim)
    vn = np.einsum("tk,tk->t", nodal[V.mesh.cells[ids_n]], w_n)
    vp = np.einsum("tk,tk->t", nodal[V.mesh.cells[ids_p]], w_p)
    np.testing.assert_allclose(vn, vp, atol=1e-10)
