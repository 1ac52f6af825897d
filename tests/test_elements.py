"""Unit tests for elements/quadrature/mesh geometry.

Mirrors the reference's helper unit-test tier (SURVEY.md §4 tier 1).
"""

import math

import numpy as np
import pytest

from glimslib_tpu.core.elements import (
    P1Element,
    P2Element,
    barycentric_integral,
    p1_cubic_tensor,
    p1_mass_matrix,
    simplex_quadrature,
)
from glimslib_tpu.core.mesh import (
    Mesh,
    box_mesh,
    rectangle_mesh,
)


@pytest.mark.parametrize("dim", [1, 2, 3])
@pytest.mark.parametrize("degree", [1, 2, 3, 4, 6])
def test_quadrature_exact_monomials(dim, degree):
    pts, w = simplex_quadrature(dim, degree)
    # integrate all monomials xi^alpha with |alpha| <= degree; compare to
    # exact formula: int over simplex of prod xi_i^{a_i} (lam powers with
    # lam_0 power 0) = d! prod a_i! / (d+sum)!  / d!... use barycentric with
    # lam_{i+1} = xi_i.
    from itertools import product

    for alpha in product(range(degree + 1), repeat=dim):
        if sum(alpha) > degree:
            continue
        val = np.sum(w * np.prod(pts ** np.asarray(alpha), axis=1))
        powers = [0] + list(alpha)
        exact = barycentric_integral(dim, tuple(powers)) / math.factorial(dim) * math.factorial(dim)
        # barycentric_integral is normalized to unit-volume simplex; the
        # reference simplex has volume 1/d! and weights sum to 1/d!:
        exact = barycentric_integral(dim, tuple(powers)) / math.factorial(dim)
        assert abs(val - exact) < 1e-12, (alpha, val, exact)


@pytest.mark.parametrize("dim", [2, 3])
def test_p1_mass_matrix_vs_quadrature(dim):
    pts, w = simplex_quadrature(dim, 2)
    el = P1Element(dim)
    vals, _ = el.tabulate(pts)
    M_quad = np.einsum("q,qi,qj->ij", w, vals, vals) * math.factorial(dim)
    assert np.allclose(M_quad, p1_mass_matrix(dim), atol=1e-13)


@pytest.mark.parametrize("dim", [2, 3])
def test_p1_cubic_tensor_vs_quadrature(dim):
    pts, w = simplex_quadrature(dim, 3)
    el = P1Element(dim)
    vals, _ = el.tabulate(pts)
    T_quad = np.einsum("q,qi,qj,qk->ijk", w, vals, vals, vals) * math.factorial(dim)
    assert np.allclose(T_quad, p1_cubic_tensor(dim), atol=1e-13)


@pytest.mark.parametrize("dim", [2, 3])
def test_p2_partition_of_unity(dim):
    pts, _ = simplex_quadrature(dim, 4)
    el = P2Element(dim)
    vals, grads = el.tabulate(pts)
    assert np.allclose(vals.sum(axis=1), 1.0, atol=1e-13)
    assert np.allclose(grads.sum(axis=1), 0.0, atol=1e-13)


def test_rectangle_mesh_geometry():
    m = rectangle_mesh((-5, -5), (5, 5), 50, 50)
    assert m.n_nodes == 51 * 51  # matches fenics.RectangleMesh(…, 50, 50)
    assert m.n_cells == 2 * 50 * 50
    assert np.isclose(m.cell_volumes.sum(), 100.0)
    # P1 gradients reproduce a linear field exactly
    f = 2.0 * m.points[:, 0] - 3.0 * m.points[:, 1] + 1.0
    ge = np.einsum("cj,cjd->cd", f[m.cells], m.cell_grads)
    assert np.allclose(ge, [2.0, -3.0], atol=1e-12)


def test_box_mesh_geometry():
    m = box_mesh((0, 0, 0), (1, 2, 3), 3, 4, 5)
    assert m.n_nodes == 4 * 5 * 6
    assert m.n_cells == 6 * 3 * 4 * 5
    assert np.isclose(m.cell_volumes.sum(), 6.0)
    f = m.points @ np.array([1.0, -2.0, 0.5])
    ge = np.einsum("cj,cjd->cd", f[m.cells], m.cell_grads)
    assert np.allclose(ge, [1.0, -2.0, 0.5], atol=1e-12)


def test_boundary_facets_rectangle():
    m = rectangle_mesh((0, 0), (1, 1), 4, 4)
    # perimeter length = 4
    assert np.isclose(m.boundary_facet_area.sum(), 4.0)
    # normals unit, outward
    n = m.boundary_facet_normal
    assert np.allclose(np.linalg.norm(n, axis=1), 1.0)
    mids = m.points[m.boundary_facet_nodes].mean(axis=1)
    outward = ((mids - 0.5) * n).sum(axis=1)
    assert (outward > 0).all()


def test_boundary_facets_box():
    m = box_mesh((0, 0, 0), (1, 1, 1), 3, 3, 3)
    assert np.isclose(m.boundary_facet_area.sum(), 6.0)


def test_edges_unique():
    m = rectangle_mesh((0, 0), (1, 1), 2, 2)
    edge_nodes, cell_edges = m.edges()
    # Euler: for this mesh, E = 3*ncells/... just check consistency
    assert cell_edges.shape == (m.n_cells, 3)
    assert edge_nodes.shape[1] == 2
    # every cell edge maps to the right vertex pair
    from glimslib_tpu.core.mesh import EDGE_VERTICES

    for k, (a, b) in enumerate(EDGE_VERTICES[2]):
        pair = np.sort(m.cells[:, [a, b]], axis=1)
        assert (np.sort(edge_nodes[cell_edges[:, k]], axis=1) == pair).all()


def test_degenerate_cell_rejected():
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    cells = np.array([[0, 1, 2]])
    with pytest.raises((ValueError, np.linalg.LinAlgError)):
        Mesh.from_arrays(pts, cells)
