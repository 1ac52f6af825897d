"""Independent P2 parity harness: the quad (P2-concentration) models vs a
from-scratch scipy sparse FEM (``reference_fem.ReferenceFEMP2``).

Round-1 left P2 with only P1-vs-P2 smoke agreement at 2-5% tolerance; these
tests give the quad family the same external 1e-6-grade check the P1 path
has (reference quad models: simulation_tumor_growth_quad.py,
simulation_tumor_growth_brain_quad.py — the optimization workhorse,
image_based_optimization.py:26).  Covers: forward stepping, Dirichlet on
the P2 space including edge-midpoint dofs, von-Neumann facet flux through
the trace element, and true L2 initial-value projection
(helper_classes.py:983-986).
"""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse.linalg as spla

from glimslib_tpu.core.mesh import box_mesh, rectangle_mesh
from glimslib_tpu.models.tumor_growth_quad import TumorGrowth as TumorGrowthQuad

from reference_fem import ReferenceFEMP2


class Boundary:
    def inside(self, x, on_boundary):
        return on_boundary


def _build_quad_sim(mesh, dirichlet_conc=False, vn_flux=None, sim_time=3):
    sim = TumorGrowthQuad(mesh)
    d = mesh.dim
    dirichlet_bcs = {
        "clamped": {"bc_value": np.zeros(d),
                    "named_boundary": "boundary_all", "subspace_id": 0}
    }
    if dirichlet_conc:
        dirichlet_bcs["conc_wall"] = {
            "bc_value": 0.0, "named_boundary": "boundary_all", "subspace_id": 1,
        }
    von_neumann_bcs = None
    if vn_flux is not None:
        von_neumann_bcs = {
            "influx": {"bc_value": vn_flux,
                       "named_boundary": "boundary_all", "subspace_id": 1}
        }
    sim.setup_global_parameters(
        boundaries={"boundary_all": Boundary()},
        dirichlet_bcs=dirichlet_bcs,
        von_neumann_bcs=von_neumann_bcs,
    )
    center = np.full(d, 5.0)
    sim.setup_model_parameters(
        iv_expression={
            0: np.zeros(d),
            1: lambda x: np.exp(-0.5 * ((x - center) ** 2).sum(axis=1)),
        },
        diffusion=0.2, coupling=0.15, proliferation=0.1, E=0.001, poisson=0.45,
        sim_time=sim_time, sim_time_step=1,
    )
    return sim


def _canon(sim, c):
    """Model P2 vector (shared interleaved dof layout, ops/p2.py
    p2_dof_layout) -> the harness's canonical [vertices | edges] order.
    The scipy harness stays independent; only the test glue translates."""
    return np.asarray(c, dtype=np.float64)[np.asarray(sim.p2.dof_rank)]


def _reference_run(sim, mesh, n_steps, dirichlet_conc=False, vn_flux=None):
    ref = ReferenceFEMP2(mesh)
    iv = sim.params.create_initial_value_function()
    c = _canon(sim, iv[1])
    d = mesh.dim
    u = np.zeros((mesh.n_nodes, d))
    bn = mesh.boundary_nodes
    E, nu = 0.001, 0.45
    mu = E / (2 * (1 + nu))
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    kw = {}
    if dirichlet_conc:
        # full P2 boundary dof set: vertices + facet edge midpoints
        fvs = mesh.boundary_facet_nodes
        if d == 2:
            eids = mesh.edge_ids_for_pairs(fvs)
        else:
            pairs = np.concatenate(
                [fvs[:, [0, 1]], fvs[:, [0, 2]], fvs[:, [1, 2]]], axis=0
            )
            eids = mesh.edge_ids_for_pairs(pairs)
        dofs = np.concatenate([bn, mesh.n_nodes + np.unique(eids)])
        kw.update(dirichlet_conc_dofs=dofs,
                  dirichlet_conc_values=np.zeros(len(dofs)))
        # the model clamps the IV to Dirichlet data at t=0 (models/base.py)
        c[dofs] = 0.0
    if vn_flux is not None:
        kw.update(flux_facets=np.arange(len(mesh.boundary_facet_nodes)),
                  flux_value=vn_flux)
    for _ in range(n_steps):
        u, c = ref.solve_step2(
            u.ravel(), c, D_cell=0.2, rho_cell=0.1, mu_cell=mu, lam_cell=lam,
            coupling=0.15, dt=1.0,
            dirichlet_disp_nodes=bn,
            dirichlet_disp_values=np.zeros((len(bn), d)),
            **kw,
        )
    return u, c


@pytest.mark.parametrize(
    "mesh", [rectangle_mesh((0, 0), (10, 10), 9, 9),
             box_mesh((0, 0, 0), (10, 10, 10), 4, 4, 4)],
    ids=["tri", "tet"],
)
def test_p2_forward_parity(mesh, tmp_path):
    """Quad model forward == scipy P2 FEM to well below 1e-6 rel-L2."""
    sim = _build_quad_sim(mesh)
    sim.run(save_method=None, plot=False, output_dir=str(tmp_path))
    u_ref, c_ref = _reference_run(sim, mesh, 3)
    c = _canon(sim, sim.solution[1])
    u = np.asarray(sim.solution[0])
    rel_c = np.linalg.norm(c - c_ref) / np.linalg.norm(c_ref)
    rel_u = np.linalg.norm(u - u_ref) / max(np.linalg.norm(u_ref), 1e-30)
    assert rel_c < 1e-6, rel_c
    assert rel_u < 1e-6, rel_u


def test_p2_dirichlet_edge_dofs_parity(tmp_path):
    """Dirichlet on the P2 concentration space constrains edge-midpoint dofs
    too, matching the scipy reference with the full boundary dof set."""
    mesh = rectangle_mesh((0, 0), (10, 10), 9, 9)
    sim = _build_quad_sim(mesh, dirichlet_conc=True)
    # the compiled mask must include edge dofs on boundary facets
    mask_c, _ = sim.bcs.dirichlet_mask_and_values(1)
    mask_c = np.asarray(mask_c)[np.asarray(sim.p2.dof_rank)]  # canonical
    assert mask_c[: mesh.n_nodes][mesh.boundary_nodes].all()
    assert mask_c[mesh.n_nodes:].sum() == len(
        np.unique(mesh.edge_ids_for_pairs(mesh.boundary_facet_nodes))
    )
    sim.run(save_method=None, plot=False, output_dir=str(tmp_path))
    _, c_ref = _reference_run(sim, mesh, 3, dirichlet_conc=True)
    c = _canon(sim, sim.solution[1])
    rel_c = np.linalg.norm(c - c_ref) / np.linalg.norm(c_ref)
    assert rel_c < 1e-6, rel_c


@pytest.mark.parametrize(
    "mesh", [rectangle_mesh((0, 0), (10, 10), 9, 9),
             box_mesh((0, 0, 0), (10, 10, 10), 4, 4, 4)],
    ids=["tri", "tet"],
)
def test_p2_von_neumann_flux_parity(mesh, tmp_path):
    """Constant influx q over the whole boundary through the P2 trace
    element (reference q*v*ds scaled by dt*D,
    simulation_tumor_growth.py:120) == scipy closed-form facet integrals."""
    sim = _build_quad_sim(mesh, vn_flux=0.05)
    sim.run(save_method=None, plot=False, output_dir=str(tmp_path))
    _, c_ref = _reference_run(sim, mesh, 3, vn_flux=0.05)
    c = _canon(sim, sim.solution[1])
    rel_c = np.linalg.norm(c - c_ref) / np.linalg.norm(c_ref)
    assert rel_c < 1e-6, rel_c
    # and the flux actually does something
    sim0 = _build_quad_sim(mesh)
    sim0.run(save_method=None, plot=False, output_dir=str(tmp_path / "nf"))
    assert np.linalg.norm(c - np.asarray(sim0.solution[1])) > 1e-6


def test_p2_l2_projection_parity():
    """Initial values are true L2 projections onto the P2 space: cubic
    expressions (not representable in P2) match the scipy direct mass
    solve to solver precision, and differ from nodal interpolation."""
    mesh = rectangle_mesh((0, 0), (2, 1), 7, 5)
    sim = TumorGrowthQuad(mesh)
    sim.setup_global_parameters(boundaries={"boundary_all": Boundary()})
    fs = sim.functionspace

    f = lambda x: x[:, 0] ** 3 + x[:, 1] ** 2 - 0.5 * x[:, 0] * x[:, 1]
    got = _canon(sim, fs.project(f, 1))

    ref = ReferenceFEMP2(mesh)
    M = ref.mass_matrix2()
    xq = np.einsum(
        "qi,cid->cqd",
        np.concatenate([(1 - ref.qp2.sum(axis=1))[:, None], ref.qp2], axis=1),
        mesh.points[mesh.cells],
    )
    fq = f(xq.reshape(-1, 2)).reshape(mesh.n_cells, -1)
    b = np.zeros(ref.n_dofs2)
    loc = np.einsum("c,cq,q,qi->ci", ref.detJ, fq, ref.qw2, ref.vals2)
    np.add.at(b, ref.cell_dofs2.ravel(), loc.ravel())
    want = spla.spsolve(M.tocsc(), b)

    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 1e-8, rel
    # projection != interpolation for a cubic
    interp = f(ref.dof_coords2)
    assert np.linalg.norm(want - interp) / np.linalg.norm(want) > 1e-6


def test_p2_forward_parity_unstructured(tmp_path):
    """Quad model on an unstructured (lattice-stripped, RCM-reordered)
    mesh: the P1 elasticity block rides the assembled bell/ELL operator
    and (since round 4) the P2 concentration Jacobian is assembled too
    (ops/p2_ell.py) — forward parity vs the scipy P2 FEM must hold
    regardless of operator mode."""
    from glimslib_tpu.core.mesh import Mesh

    m0 = box_mesh((0, 0, 0), (10, 10, 10), 4, 4, 4)
    mesh = Mesh.from_arrays(m0.points, m0.cells).reordered_rcm()
    assert mesh.lattice_strides is None
    sim = _build_quad_sim(mesh)
    # the assembled operators must actually be in play
    rd_j, el_op = sim._ell_builders()
    assert el_op is not None
    assert rd_j is not None  # assembled P2 rd Jacobian (VERDICT r3 #6)
    sim.run(save_method=None, plot=False, output_dir=str(tmp_path))
    u_ref, c_ref = _reference_run(sim, mesh, 3)
    c = _canon(sim, sim.solution[1])
    u = np.asarray(sim.solution[0])
    rel_c = np.linalg.norm(c - c_ref) / np.linalg.norm(c_ref)
    rel_u = np.linalg.norm(u - u_ref) / max(np.linalg.norm(u_ref), 1e-30)
    assert rel_c < 1e-6, rel_c
    assert rel_u < 1e-6, rel_u
