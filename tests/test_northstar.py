"""North-star parity cases (BASELINE.json): the reference's exact
configurations, validated against the independent scipy FEM to well below
the 1e-6 rel-L2 target.

- 2D uniform forward at full reference scale: 50x50 RectangleMesh on
  [-5,5]^2, D=0.1, k=1, rho=0.1, E=0.001, nu=0.45, sim_time 5, dt 1
  (test_case_simulation_tumor_growth_2D_uniform.py:33-79).
- 3D brain-style forward on a tet mesh with 4 tissue subdomains.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from glimslib_tpu.core.mesh import box_mesh, rectangle_mesh
from glimslib_tpu.models.tumor_growth import TumorGrowth
from glimslib_tpu.models.tumor_growth_brain import TumorGrowthBrain

from reference_fem import ReferenceFEM


class Boundary:
    def inside(self, x, on_boundary):
        return on_boundary


@pytest.mark.slow
def test_2d_uniform_full_reference_scale(tmp_path):
    """The headline 2D case at the reference's exact resolution/schedule."""
    mesh = rectangle_mesh((-5, -5), (5, 5), 50, 50)
    sim = TumorGrowth(mesh)
    sim.setup_global_parameters(
        boundaries={"boundary_all": Boundary()},
        dirichlet_bcs={
            "clamped_boundary": {"bc_value": np.zeros(2),
                                 "named_boundary": "boundary_all",
                                 "subspace_id": 0}
        },
    )
    # exp(-a*(x-x0)^2 - a*(y-y0)^2), a=1 (reference 2D_uniform.py:56)
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(2),
                       1: lambda x: np.exp(-(x**2).sum(axis=1))},
        diffusion=0.1, coupling=1.0, proliferation=0.1, E=0.001, poisson=0.45,
        sim_time=5, sim_time_step=1,
    )
    sim.run(keep_nth=1, save_method=None, plot=False, output_dir=str(tmp_path))

    ref = ReferenceFEM(mesh)
    iv = sim.params.create_initial_value_function()
    c = np.asarray(iv[1])
    u = np.zeros((mesh.n_nodes, 2))
    bn = mesh.boundary_nodes
    E, nu = 0.001, 0.45
    mu = E / (2 * (1 + nu))
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    for _ in range(5):
        u, c = ref.solve_step(
            u.ravel(), c, D_cell=0.1, rho_cell=0.1, mu_cell=mu, lam_cell=lam,
            coupling=1.0, dt=1.0,
            dirichlet_disp_nodes=bn,
            dirichlet_disp_values=np.zeros((len(bn), 2)),
        )
    rel_c = np.linalg.norm(sim.solution[1] - c) / np.linalg.norm(c)
    rel_u = np.linalg.norm(sim.solution[0] - u) / np.linalg.norm(u)
    # north-star target: 1e-6 rel-L2 (BASELINE.json); we hold ~1e-9
    assert rel_c < 1e-6, rel_c
    assert rel_u < 1e-6, rel_u


def test_3d_brain_forward_vs_reference(tmp_path):
    """3D tet forward with 4 tissue subdomains vs the scipy path."""
    mesh = box_mesh((0, 0, 0), (8, 8, 8), 6, 6, 6)
    r = np.linalg.norm((mesh.points - 4.0) / 4.0, axis=1)
    labels = np.zeros(mesh.n_nodes)
    labels[r < 0.95] = 1
    labels[r < 0.8] = 2
    labels[r < 0.6] = 3
    labels[r < 0.2] = 4

    sim = TumorGrowthBrain(mesh)
    sim.setup_global_parameters(
        label_function=labels,
        domain_names={0: "outside", 1: "CSF", 2: "GM", 3: "WM", 4: "Ventricles"},
        boundaries={"boundary_all": Boundary()},
        dirichlet_bcs={
            "clamped": {"bc_value": np.zeros(3),
                        "named_boundary": "boundary_all", "subspace_id": 0}
        },
    )
    center = np.array([4.5, 4.0, 4.0])
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(3),
                       1: lambda x: np.exp(-((x - center) ** 2).sum(axis=1))},
        E_GM=3e3, E_WM=3e3, E_CSF=1e3, E_VENT=1e3,
        nu_GM=0.45, nu_WM=0.45, nu_CSF=0.45, nu_VENT=0.3,
        D_GM=0.02, D_WM=0.1, rho_GM=0.02, rho_WM=0.1, coupling=0.15,
        sim_time=2, sim_time_step=1,
    )
    sim.run(save_method=None, plot=False, output_dir=str(tmp_path))
    assert hasattr(sim, "_stencil_ops")  # box mesh -> stencil path active

    theta = sim.make_theta(sim.params.as_dict())
    D = np.asarray(theta["D"], dtype=np.float64)
    rho = np.asarray(theta["rho"], dtype=np.float64)
    mu = np.asarray(theta["mu"], dtype=np.float64)
    lam = np.asarray(theta["lam"], dtype=np.float64)

    ref = ReferenceFEM(mesh)
    iv = sim.params.create_initial_value_function()
    c = np.asarray(iv[1])
    u = np.zeros((mesh.n_nodes, 3))
    bn = mesh.boundary_nodes
    for _ in range(2):
        u, c = ref.solve_step(
            u.ravel(), c, D_cell=D, rho_cell=rho, mu_cell=mu, lam_cell=lam,
            coupling=0.15, dt=1.0,
            dirichlet_disp_nodes=bn,
            dirichlet_disp_values=np.zeros((len(bn), 3)),
        )
    rel_c = np.linalg.norm(sim.solution[1] - c) / np.linalg.norm(c)
    rel_u = np.linalg.norm(sim.solution[0] - u) / max(np.linalg.norm(u), 1e-30)
    assert rel_c < 1e-6, rel_c
    assert rel_u < 1e-6, rel_u
