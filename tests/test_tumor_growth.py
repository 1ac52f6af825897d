"""End-to-end forward parity: TumorGrowth on the 2D uniform config
(reference test_case_simulation_tumor_growth_2D_uniform.py:33-86, shrunk for
the 1-CPU sandbox) vs the independent scipy reference FEM.

Target mirrors BASELINE.json north star: fields match to <=1e-6 rel-L2
(here both f64 paths on the same mesh agree far tighter)."""

import numpy as np
import jax.numpy as jnp
import pytest

from glimslib_tpu.core.mesh import rectangle_mesh
from glimslib_tpu.models.tumor_growth import TumorGrowth

from reference_fem import ReferenceFEM


def gaussian_iv(coords, a=1.0, x0=0.0, y0=0.0):
    # reference IV expression: exp(-a*(x-x0)^2 - a*(y-y0)^2)  (2D_uniform.py:56)
    return np.exp(-a * ((coords[:, 0] - x0) ** 2 + (coords[:, 1] - y0) ** 2))


class Boundary:
    def inside(self, x, on_boundary):
        return on_boundary


@pytest.fixture(scope="module")
def sim2d():
    mesh = rectangle_mesh((-5, -5), (5, 5), 10, 10)
    sim = TumorGrowth(mesh)
    sim.setup_global_parameters(
        boundaries={"boundary_all": Boundary()},
        dirichlet_bcs={
            "clamped_boundary": {
                "bc_value": np.array([0.0, 0.0]),
                "named_boundary": "boundary_all",
                "subspace_id": 0,
            }
        },
        von_neumann_bcs={},
    )
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(2), 1: gaussian_iv},
        diffusion=0.1,
        coupling=1.0,
        proliferation=0.1,
        E=0.001,
        poisson=0.45,
        sim_time=2,
        sim_time_step=1,
    )
    return sim


def test_forward_vs_scipy_reference(sim2d, tmp_path):
    sim = sim2d
    sim.run(keep_nth=1, save_method=None, plot=False, output_dir=str(tmp_path))
    mesh = sim.mesh

    # independent path: same IV, scipy sparse Newton + direct solves
    ref = ReferenceFEM(mesh)
    iv = sim.params.create_initial_value_function()
    c = np.asarray(iv[1])
    u = np.zeros((mesh.n_nodes, 2))
    bn = mesh.boundary_nodes
    E, nu = 0.001, 0.45
    mu = E / (2 * (1 + nu))
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    for _ in range(2):
        u, c = ref.solve_step(
            u.ravel(), c,
            D_cell=0.1, rho_cell=0.1, mu_cell=mu, lam_cell=lam,
            coupling=1.0, dt=1.0,
            dirichlet_disp_nodes=bn,
            dirichlet_disp_values=np.zeros((len(bn), 2)),
        )

    got_u = sim.solution[0]
    got_c = sim.solution[1]
    rel_c = np.linalg.norm(got_c - c) / np.linalg.norm(c)
    rel_u = np.linalg.norm(got_u - u) / max(np.linalg.norm(u), 1e-30)
    assert rel_c < 1e-8, rel_c
    assert rel_u < 1e-6, rel_u
    # mass conservation sanity: total concentration changes only through the
    # logistic source (no-flux boundary), so it must stay positive and finite
    total = float(np.asarray(sim.kernels.integrate_p1(jnp.asarray(got_c))))
    assert 0.0 < total < 200.0


def test_recording_and_hdf5_roundtrip(sim2d, tmp_path):
    sim = sim2d
    out = str(tmp_path / "run")
    sim.run(keep_nth=1, save_method=None, plot=False, output_dir=out)
    steps = sim.results.get_recording_steps()
    assert steps == [0, 1, 2]
    path = sim.results.save_solution_hdf5()
    # reload into a fresh Results (reference reload_from_hdf5 semantics)
    sim.reload_from_hdf5(path, output_dir=out)
    again = sim.results.get_result(2)
    assert np.allclose(again[1], sim.solution[1])
    assert np.allclose(again[0], sim.solution[0])


def test_convergence_failure_freezes(sim2d, tmp_path):
    """Reference behavior: non-convergence shuts the simulation down keeping
    prior results (simulation_base.py:284-288)."""
    sim = sim2d
    # absurd proliferation makes Newton diverge
    sim.params.proliferation = 1e14
    try:
        sim.run(keep_nth=1, save_method=None, plot=False,
                output_dir=str(tmp_path))
        steps = sim.results.get_recording_steps()
        assert steps[0] == 0  # t=0 always recorded
        assert len(steps) <= 3
    finally:
        sim.params.proliferation = 0.1
