"""Slow 3D inverse problem over the full unstructured operator stack.

VERDICT r3 #5: verify the IFT adjoint runs over the bell/two-level
operators at scale and recovers parameters.  The mesh is the
stripped/Morton-reordered brain box (the reference's flagship geometry
class, test_case_simulation_tumor_growth_3D_atlas_mpi.py:32-136) large
enough that the default gates engage the supernode halo-ELL operators AND
the two-level coarse preconditioner (>= GLIMS_TWOLEVEL_MIN_NODES=4000
nodes), so gradients flow through _augment_theta_with_operators exactly
as in the flagship runs.  Flagship-scale (197k-tet) adjoint throughput is
measured on the real TPU by the bench extra
``adjoint_flagship_value_and_grad_per_sec``."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glimslib_tpu.core.mesh import Mesh, box_mesh
from glimslib_tpu.models.tumor_growth_brain import TumorGrowthBrain
from glimslib_tpu.optimize.adjoint import (
    InverseProblem, param_map_for_type, thresh,
)


class _Boundary:
    def inside(self, x, on_boundary):
        return on_boundary


def _sim(n=16):
    m = box_mesh((0, 0, 0), (10, 10, 10), n, n, n)
    mesh = Mesh.from_arrays(m.points, m.cells).reordered_morton()
    r = np.linalg.norm((mesh.points - 5.0) / 5.0, axis=1)
    labels = np.zeros(mesh.n_nodes)
    labels[r < 0.95] = 1
    labels[r < 0.80] = 2
    labels[r < 0.62] = 3
    labels[r < 0.20] = 4
    sim = TumorGrowthBrain(mesh)
    sim.setup_global_parameters(
        label_function=labels,
        domain_names={0: "outside", 1: "CSF", 2: "GM", 3: "WM",
                      4: "Ventricles"},
        boundaries={"boundary_all": _Boundary()},
        dirichlet_bcs={
            "clamped": {"bc_value": np.zeros(3),
                        "named_boundary": "boundary_all", "subspace_id": 0}
        },
    )
    center = np.full(3, 5.0)
    center[0] += 1.0
    sim.setup_model_parameters(
        iv_expression={
            0: np.zeros(3),
            1: lambda x: np.exp(-((x - center) ** 2).sum(axis=1) / 0.5),
        },
        E_GM=3e3, E_WM=3e3, E_CSF=1e3, E_VENT=1e3,
        nu_GM=0.45, nu_WM=0.45, nu_CSF=0.45, nu_VENT=0.3,
        D_GM=0.02, D_WM=0.1, rho_GM=0.02, rho_WM=0.1, coupling=0.15,
        sim_time=2, sim_time_step=1,
    )
    return sim


@pytest.mark.slow
def test_inverse_recovers_params_over_bell_twolevel():
    sim = _sim()
    # the default gates must be engaged at this size: this is the point
    assert sim._use_bell()
    assert sim._twolevel_eligible()

    theta = sim.make_theta(sim.params.as_dict())
    iv = sim.params.create_initial_value_function()
    u0 = jnp.asarray(iv[0], sim.dtype)
    c0 = jnp.asarray(iv[1], sim.dtype)
    aux = sim.runtime_aux()
    assert "_TLCfac" in aux and "_BellPlace" in aux
    f = jax.jit(sim.build_simulate_fn(2, 1.0))
    u_traj, c_traj, ok, _ = f(theta, u0, c0, aux)
    assert bool(np.asarray(ok).all())
    targets = {
        "conc_T2": np.asarray(thresh(c_traj[-1], 0.12)),
        "conc_T1": np.asarray(thresh(c_traj[-1], 0.80)),
        "disp": np.asarray(u_traj[-1]),
    }

    names, update = param_map_for_type(2)  # D_WM, rho_WM (ties GM)
    ip = InverseProblem(sim, names, targets, update_fn=update,
                        n_steps=2, dt=1.0)

    from glimslib_tpu.optimize.lbfgsb import minimize_lbfgsb

    true_v = np.array([0.1, 0.1])
    v0 = np.array([0.05, 0.05])
    v, progress, res = minimize_lbfgsb(
        ip.value_and_grad, v0,
        bounds=[(1e-4, 1.0), (1e-4, 1.0)],
        maxiter=15, tol=1e-10, gtol=1e-8,
    )
    # recovery of the generating parameters through the assembled stack
    # (15 L-BFGS-B iterations reach ~3%: measured (0.0992, 0.0969))
    np.testing.assert_allclose(np.asarray(v), true_v, rtol=5e-2)
    assert float(res.fun) < 1e-5
