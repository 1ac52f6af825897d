"""Native meshops library tests: build + agreement with numpy fallbacks."""

import numpy as np
import pytest

from glimslib_tpu.core.mesh import box_mesh, rectangle_mesh
from glimslib_tpu.native import meshops


def test_build():
    assert meshops.build(), "native meshops failed to build with g++"
    assert meshops.available()


@pytest.mark.parametrize(
    "mesh", [rectangle_mesh((0, 0), (1, 1), 6, 5),
             box_mesh((0, 0, 0), (1, 1, 1), 3, 3, 3)],
    ids=["tri", "tet"],
)
def test_facets_match_python(mesh):
    fn, fc = meshops.facets(mesh.cells)
    from glimslib_tpu.core.subdomains import _interior_facets

    fn2, c0, c1 = _interior_facets(mesh.cells)
    # same facet sets (as sorted tuples)
    a = {tuple(r) for r in np.sort(fn, axis=1)}
    b = {tuple(r) for r in np.sort(fn2, axis=1)}
    assert a == b
    # same number of exterior facets
    n_ext_native = int((fc[:, 1] < 0).sum())
    assert n_ext_native == len(mesh.boundary_facet_nodes)


@pytest.mark.parametrize(
    "mesh", [rectangle_mesh((0, 0), (1, 1), 8, 8),
             box_mesh((0, 0, 0), (1, 1, 1), 4, 4, 4)],
    ids=["tri", "tet"],
)
def test_partition_balanced_and_connected(mesh):
    n_parts = 4
    part = meshops.partition_graph(mesh.cells, n_parts)
    assert part.shape == (mesh.n_cells,)
    assert set(np.unique(part)) <= set(range(n_parts))
    counts = np.bincount(part, minlength=n_parts)
    assert counts.max() <= -(-mesh.n_cells // n_parts) + n_parts  # balanced
    assert counts.min() > 0


def test_rcm_reduces_bandwidth():
    mesh = box_mesh((0, 0, 0), (1, 1, 1), 6, 6, 6)
    rng = np.random.default_rng(0)
    shuffle = rng.permutation(mesh.n_nodes)
    cells_shuffled = shuffle[mesh.cells]

    def bandwidth(cells):
        return int(np.max(cells.max(axis=1) - cells.min(axis=1)))

    perm = meshops.rcm_permutation(cells_shuffled, mesh.n_nodes)
    assert sorted(perm) == list(range(mesh.n_nodes))
    bw_before = bandwidth(cells_shuffled)
    bw_after = bandwidth(perm[cells_shuffled])
    assert bw_after < bw_before * 0.5, (bw_before, bw_after)


def test_cell_adjacency_symmetric():
    mesh = rectangle_mesh((0, 0), (1, 1), 5, 5)
    xadj, adj = meshops.cell_adjacency(mesh.cells)
    assert xadj[-1] == len(adj)
    # symmetry: b in adj(a) <=> a in adj(b)
    pairs = set()
    for a in range(mesh.n_cells):
        for b in adj[xadj[a]:xadj[a + 1]]:
            pairs.add((a, int(b)))
    assert all((b, a) in pairs for a, b in pairs)
