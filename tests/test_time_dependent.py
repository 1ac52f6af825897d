"""Time-dependent sources, body forces, and Dirichlet values — the
reference's ``Expression.t`` update mechanism (helper_classes.py:839-859,
1055-1077) evaluated inside the jitted step."""

import numpy as np
import jax.numpy as jnp
import pytest

from glimslib_tpu.core.mesh import rectangle_mesh
from glimslib_tpu.models.tumor_growth import TumorGrowth

from reference_fem import ReferenceFEM


class Boundary:
    def inside(self, x, on_boundary):
        return on_boundary


def build_sim(source_term=None, body_force=None):
    mesh = rectangle_mesh((-2, -2), (2, 2), 8, 8)
    sim = TumorGrowth(mesh)
    sim.setup_global_parameters(
        boundaries={"boundary_all": Boundary()},
        dirichlet_bcs={
            "clamped": {"bc_value": np.zeros(2), "named_boundary": "boundary_all",
                        "subspace_id": 0}
        },
    )
    kwargs = {}
    if source_term is not None:
        kwargs["source_term"] = source_term
    if body_force is not None:
        kwargs["body_force"] = body_force
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(2),
                       1: lambda x: np.exp(-(x**2).sum(axis=1))},
        diffusion=0.1, coupling=0.0, proliferation=0.0, E=0.001, poisson=0.4,
        sim_time=2, sim_time_step=1, **kwargs,
    )
    return sim


def test_time_dependent_source_vs_reference(tmp_path):
    """Source s(x,t) = 0.3*t: residual parity against the scipy path with
    the per-step source added manually."""
    sim = build_sim(source_term=lambda x, t: 0.3 * t * jnp.ones(x.shape[0]))
    sim.run(save_method=None, plot=False, output_dir=str(tmp_path))
    mesh = sim.mesh

    ref = ReferenceFEM(mesh)
    iv = sim.params.create_initial_value_function()
    c = np.asarray(iv[1])
    M = ref.mass_matrix()
    K = ref.stiffness_matrix(0.1)
    load = ref.load_vector(1.0)
    import scipy.sparse.linalg as spla

    for step in (1, 2):
        t = float(step)
        # linear solve: (M + dt K) c_new = M c + dt * s(t) * load
        A = (M + 1.0 * K).tocsc()
        c = spla.spsolve(A, M @ c + 1.0 * (0.3 * t) * load)

    got = sim.solution[1]
    rel = np.linalg.norm(got - c) / np.linalg.norm(c)
    assert rel < 1e-8, rel
    # growing source leaves more mass than the source-free run
    sim0 = build_sim()
    sim0.run(save_method=None, plot=False, output_dir=str(tmp_path / "b"))
    assert got.sum() > np.asarray(sim0.solution[1]).sum()


def test_time_dependent_body_force(tmp_path):
    """Body force b(t) ramps up: displacement response grows with t."""
    sim = build_sim(
        body_force=lambda x, t: jnp.stack(
            [1e-4 * t * jnp.ones(x.shape[0]), jnp.zeros(x.shape[0])], axis=1
        )
    )
    sim.run(keep_nth=1, save_method=None, plot=False, output_dir=str(tmp_path))
    u1 = sim.results.get_result(1)[0]
    u2 = sim.results.get_result(2)[0]
    m1 = np.abs(u1[:, 0]).max()
    m2 = np.abs(u2[:, 0]).max()
    assert m2 > 1.5 * m1 > 0  # ~doubles as the force doubles


def test_time_dependent_dirichlet_in_loop(tmp_path):
    """Moving Dirichlet value on the concentration: c on the boundary tracks
    g(t) at each recorded step."""
    mesh = rectangle_mesh((0, 0), (1, 1), 6, 6)
    sim = TumorGrowth(mesh)
    sim.setup_global_parameters(
        boundaries={"boundary_all": Boundary()},
        dirichlet_bcs={
            "clamped": {"bc_value": np.zeros(2), "named_boundary": "boundary_all",
                        "subspace_id": 0},
            "conc_ramp": {"bc_value": lambda x, t: 0.1 * t * jnp.ones(len(x)),
                          "named_boundary": "boundary_all", "subspace_id": 1},
        },
    )
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(2), 1: 0.0},
        diffusion=0.05, coupling=0.0, proliferation=0.0, E=0.001, poisson=0.4,
        sim_time=3, sim_time_step=1,
    )
    sim.run(keep_nth=1, save_method=None, plot=False, output_dir=str(tmp_path))
    bn = mesh.boundary_nodes
    for step in (1, 2, 3):
        c = sim.results.get_result(step)[1]
        assert np.allclose(c[bn], 0.1 * step, atol=1e-10), step
