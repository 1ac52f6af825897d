"""BC specification paths not covered elsewhere: von Neumann flux inside a
solve (validated against the scipy reference), direct 'boundary' predicate
Dirichlet, and inter-tissue 'subdomain_boundary' Dirichlet
(reference helper_classes.py:632-908)."""

import numpy as np
import jax.numpy as jnp
import pytest

from glimslib_tpu.core.mesh import rectangle_mesh
from glimslib_tpu.models.tumor_growth import TumorGrowth

from reference_fem import ReferenceFEM


class All:
    def inside(self, x, on_boundary):
        return on_boundary


class Left:
    def inside(self, x, on_boundary):
        return on_boundary and x[0] < -4.999


def test_von_neumann_flux_in_solve(tmp_path):
    """Constant influx q through the whole boundary, no growth/coupling:
    compare against the scipy path with the explicit surface term."""
    mesh = rectangle_mesh((-5, -5), (5, 5), 10, 10)
    sim = TumorGrowth(mesh)
    sim.operator_mode = "matrix-free"  # vN affects rhs only, but be explicit
    q = 0.5
    D = 0.1
    sim.setup_global_parameters(
        boundaries={"boundary_all": All()},
        dirichlet_bcs={
            "clamped": {"bc_value": np.zeros(2), "named_boundary": "boundary_all",
                        "subspace_id": 0}
        },
        von_neumann_bcs={
            "influx": {"bc_value": q, "named_boundary": "boundary_all",
                       "subspace_id": 1}
        },
    )
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(2), 1: 0.0},
        diffusion=D, coupling=0.0, proliferation=0.0, E=0.001, poisson=0.4,
        sim_time=2, sim_time_step=1,
    )
    sim.run(save_method=None, plot=False, output_dir=str(tmp_path))

    # scipy path: (M + dt D K) c_new = M c + dt * D * q * ∮ φ ds
    ref = ReferenceFEM(mesh)
    M = ref.mass_matrix()
    K = ref.stiffness_matrix(D)
    # boundary load: ∮ q φ_i ds with per-facet P1 mass (A/2 per edge node);
    # assemble via facet arrays
    load = np.zeros(mesh.n_nodes)
    for fn, fa in zip(mesh.boundary_facet_nodes, mesh.boundary_facet_area):
        load[fn] += fa / 2.0
    import scipy.sparse.linalg as spla

    c = np.zeros(mesh.n_nodes)
    for _ in range(2):
        c = spla.spsolve((M + 1.0 * K).tocsc(), M @ c + 1.0 * D * q * load)
    got = sim.solution[1]
    rel = np.linalg.norm(got - c) / np.linalg.norm(c)
    assert rel < 1e-9, rel
    assert got.max() > 0  # mass flows in


def test_time_dependent_von_neumann(tmp_path):
    """q(x, t) = 0.2*t: flux doubles between steps."""
    mesh = rectangle_mesh((0, 0), (1, 1), 6, 6)
    sim = TumorGrowth(mesh)
    sim.setup_global_parameters(
        boundaries={"boundary_all": All()},
        dirichlet_bcs={
            "clamped": {"bc_value": np.zeros(2), "named_boundary": "boundary_all",
                        "subspace_id": 0}
        },
        von_neumann_bcs={
            "ramp": {"bc_value": lambda x, t: 0.2 * t * jnp.ones(len(x)),
                     "named_boundary": "boundary_all", "subspace_id": 1}
        },
    )
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(2), 1: 0.0},
        diffusion=0.1, coupling=0.0, proliferation=0.0, E=0.001, poisson=0.4,
        sim_time=2, sim_time_step=1,
    )
    sim.run(keep_nth=1, save_method=None, plot=False, output_dir=str(tmp_path))
    m1 = float(np.asarray(sim.kernels.integrate_p1(
        jnp.asarray(sim.results.get_result(1)[1]))))
    m2 = float(np.asarray(sim.kernels.integrate_p1(
        jnp.asarray(sim.results.get_result(2)[1]))))
    # implicit Euler with flux 0.2*t*D over perimeter 4: dm_k = dt*D*q(t_k)*4
    dm1 = 1.0 * 0.1 * 0.2 * 1.0 * 4.0
    dm2 = 1.0 * 0.1 * 0.2 * 2.0 * 4.0
    assert np.isclose(m1, dm1, rtol=1e-6), (m1, dm1)
    assert np.isclose(m2 - m1, dm2, rtol=1e-6)


def test_dirichlet_boundary_predicate_key(tmp_path):
    """Dirichlet via the direct 'boundary' predicate key (reference
    _construct_dirichlet_bc 'boundary' branch, helper_classes.py:699-702)."""
    mesh = rectangle_mesh((-5, -5), (5, 5), 8, 8)
    sim = TumorGrowth(mesh)
    sim.setup_global_parameters(
        boundaries={"boundary_all": All()},
        dirichlet_bcs={
            "clamped_all": {"bc_value": np.zeros(2),
                            "named_boundary": "boundary_all", "subspace_id": 0},
            "conc_left": {"bc_value": 1.0, "boundary": Left(), "subspace_id": 1},
        },
    )
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(2), 1: 0.0},
        diffusion=0.2, coupling=0.0, proliferation=0.0, E=0.001, poisson=0.4,
        sim_time=2, sim_time_step=1,
    )
    sim.run(save_method=None, plot=False, output_dir=str(tmp_path))
    c = sim.solution[1]
    left = mesh.points[:, 0] < -4.999
    assert np.allclose(c[left], 1.0, atol=1e-10)
    # diffusion spreads inward from the left edge (small FEM undershoots
    # near the steep boundary are expected: no discrete maximum principle)
    mid = np.abs(mesh.points[:, 0]) < 1e-9
    assert (c[mid] >= -1e-3).all() and c.max() <= 1.0 + 1e-9


def test_von_neumann_on_subdomain_boundary_is_zero(tmp_path):
    """'subdomain_boundary' von Neumann BCs are accepted and bound to the
    exterior 'ds' measure, which never reaches the (interior) inter-tissue
    facets — so they contribute exactly zero, matching the reference
    (helper_classes.py:819-825 parses them; the ds-measure limitation is
    documented at helper_classes.py:747-767)."""
    mesh = rectangle_mesh((-5, -5), (5, 5), 10, 10)
    r = np.linalg.norm(mesh.points, axis=1)
    labels = np.where(r < 2.5, 2.0, 1.0)

    def build(von_neumann_bcs):
        sim = TumorGrowth(mesh)
        sim.setup_global_parameters(
            label_function=labels,
            domain_names={1: "out", 2: "in"},
            boundaries={"boundary_all": All()},
            dirichlet_bcs={
                "clamped": {"bc_value": np.zeros(2),
                            "named_boundary": "boundary_all", "subspace_id": 0},
            },
            von_neumann_bcs=von_neumann_bcs,
        )
        sim.setup_model_parameters(
            iv_expression={0: np.zeros(2),
                           1: lambda x: np.exp(-(x[:, 0]**2 + x[:, 1]**2))},
            diffusion=0.1, coupling=0.1, proliferation=0.2, E=0.001,
            poisson=0.4, sim_time=2, sim_time_step=1,
        )
        sim.run(save_method=None, plot=False, output_dir=str(tmp_path))
        return sim

    vn = {"interface_flux": {"bc_value": 3.0, "subdomain_boundary": "out_in",
                             "subspace_id": 1}}
    sim_vn = build(vn)
    # the BC is registered (not rejected) ...
    assert "interface_flux" in sim_vn.bcs.von_neumann_bcs
    assert len(sim_vn.bcs.von_neumann_bcs["interface_flux"]["facet_idx"]) == 0
    # ... and the solution equals the no-BC solution (the extra zero surface
    # term only perturbs XLA op fusion, at the last-ulp level)
    sim_ref = build(None)
    np.testing.assert_allclose(
        np.asarray(sim_vn.solution[1]), np.asarray(sim_ref.solution[1]),
        rtol=0, atol=1e-13,
    )


def test_dirichlet_on_subdomain_boundary(tmp_path):
    """Dirichlet pinned to an inter-tissue interface (reference
    'subdomain_boundary' branch, helper_classes.py:703-709)."""
    mesh = rectangle_mesh((-5, -5), (5, 5), 10, 10)
    r = np.linalg.norm(mesh.points, axis=1)
    labels = np.where(r < 2.5, 2.0, 1.0)
    sim = TumorGrowth(mesh)
    sim.setup_global_parameters(
        label_function=labels,
        domain_names={1: "out", 2: "in"},
        boundaries={"boundary_all": All()},
        dirichlet_bcs={
            "clamped": {"bc_value": np.zeros(2),
                        "named_boundary": "boundary_all", "subspace_id": 0},
            "interface": {"bc_value": 0.7, "subdomain_boundary": "out_in",
                          "subspace_id": 1},
        },
    )
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(2), 1: 0.0},
        diffusion=0.1, coupling=0.0, proliferation=0.0, E=0.001, poisson=0.4,
        sim_time=1, sim_time_step=1,
    )
    sim.run(save_method=None, plot=False, output_dir=str(tmp_path))
    nodes = sim.subdomains.subdomain_boundary_nodes("out_in")
    assert len(nodes) > 0
    assert np.allclose(sim.solution[1][nodes], 0.7, atol=1e-10)


def test_von_neumann_interior_dS_measure(tmp_path):
    """measure='dS' subdomain_boundary von Neumann BCs integrate over the
    actual inter-tissue (interior) facets — exceeding the reference, which
    documents that its exterior-ds binding makes them contribute zero
    (helper_classes.py:747-767).  Validated against a direct per-edge
    accumulation: each interface edge of length L adds q*L/2 to both
    endpoint nodes (P1 facet mass row sums)."""
    mesh = rectangle_mesh((-5, -5), (5, 5), 10, 10)
    r = np.linalg.norm(mesh.points, axis=1)
    labels = np.where(r < 2.5, 2.0, 1.0)
    sim = TumorGrowth(mesh)
    sim.setup_global_parameters(
        label_function=labels,
        domain_names={1: "out", 2: "in"},
        boundaries={"boundary_all": All()},
        dirichlet_bcs={
            "clamped": {"bc_value": np.zeros(2),
                        "named_boundary": "boundary_all", "subspace_id": 0},
        },
        von_neumann_bcs={
            "interface_flux": {"bc_value": 3.0,
                               "subdomain_boundary": "out_in",
                               "subspace_id": 1, "measure": "dS"},
        },
    )
    bc = sim.bcs.von_neumann_bcs["interface_flux"]
    assert len(bc["facet_idx"]) > 0

    # direct accumulation reference
    fnodes = sim.subdomains.subdomain_boundary_facet_nodes("out_in")
    pts = mesh.points
    want = np.zeros(mesh.n_nodes)
    for a, b in fnodes:
        L = np.linalg.norm(pts[a] - pts[b])
        want[a] += 3.0 * L / 2
        want[b] += 3.0 * L / 2
    got = np.asarray(sim.bcs.von_neumann_residual(1))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)
    # facet coefficient cells are real adjacent cells of the facets
    cells = sim.subdomains.subdomain_boundary_facet_cells("out_in")
    assert cells.shape == (len(fnodes), 2)
    assert (cells >= 0).all()

    # the flux participates in a real solve
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(2),
                       1: lambda x: np.exp(-(x[:, 0]**2 + x[:, 1]**2))},
        diffusion=0.1, coupling=0.1, proliferation=0.2, E=0.001,
        poisson=0.4, sim_time=2, sim_time_step=1,
    )
    sim.run(save_method=None, plot=False, output_dir=str(tmp_path))
    assert np.isfinite(np.asarray(sim.solution[1])).all()
