"""Adjoint parameter estimation with a USER-SUPPLIED minimizer.

Rebuild of reference
``test_case_simulation_tumor_growth_2D_uniform_adjoint_custom_minimizer.py``
+ the pluggable ``custom_optimizer`` hook
(image_based_optimization.py:646-658): the optimization algorithm is a
user callable ``algorithm(J, x0, dJ, H, bounds, **kw)`` handed to the
driver instead of the built-in L-BFGS-B.  Here the custom algorithm wraps
scipy's TNC, like the reference's wraps ``scipy.optimize.minimize``.

Run (CPU): GLIMS_PLATFORM=cpu GLIMS_X64=1 python examples/tumor_growth_2D_uniform_adjoint_custom_minimizer.py
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from example_config import BoundaryAll, example_out, gaussian_iv
from glimslib_tpu.core.mesh import rectangle_mesh
from glimslib_tpu.models.tumor_growth import TumorGrowth
from glimslib_tpu.optimize.adjoint import InverseProblem, tumor_growth_param_map

parser = argparse.ArgumentParser()
parser.add_argument("--n", type=int, default=25, help="mesh resolution")
args = parser.parse_args()

mesh = rectangle_mesh((-5, -5), (5, 5), args.n, args.n)
sim = TumorGrowth(mesh)
sim.setup_global_parameters(
    boundaries={"boundary_all": BoundaryAll()},
    dirichlet_bcs={
        "clamped_boundary": {
            "bc_value": np.zeros(2),
            "named_boundary": "boundary_all",
            "subspace_id": 0,
        }
    },
)
sim.setup_model_parameters(
    iv_expression={0: np.zeros(2), 1: gaussian_iv((0, 0))},
    diffusion=0.1, coupling=0.2, proliferation=0.1, E=0.001, poisson=0.45,
    sim_time=5, sim_time_step=1,
)

names, update = tumor_growth_param_map(3)
v_true = np.array([0.05, 0.05, 0.1])

import jax
import jax.numpy as jnp

theta = sim.make_theta({**sim.params.as_dict(), **update(v_true)})
iv = sim.params.create_initial_value_function()
simulate = jax.jit(sim.build_simulate_fn(5, 1.0))
u_traj, c_traj, ok, _ = simulate(theta, jnp.asarray(iv[0]), jnp.asarray(iv[1]))
assert bool(np.asarray(ok).all())


def custom_optimizer(J, m_global, dJ, H, bounds, **kwargs):
    """Reference custom_optimizer signature
    (image_based_optimization.py:646-658): wrap any scipy method."""
    from scipy.optimize import minimize as scipy_minimize

    opt_res = scipy_minimize(J, m_global, jac=dJ, method="TNC",
                             bounds=bounds, **kwargs)
    print("-- custom optimizer finished:", opt_res.message)
    return np.array(opt_res["x"])


ip = InverseProblem(
    sim, names,
    {"conc": np.asarray(c_traj[-1]), "disp": np.asarray(u_traj[-1])},
    update_fn=update,
)
x0 = np.array([0.1, 0.01, 0.05])
x_opt, progress, res = ip.minimize(
    x0, bounds=[(0.005, 0.5)] * len(names),
    opt_params={"algorithm": custom_optimizer, "tol": 1e-12},
)
out = example_out("tumor_growth_2D_uniform_adjoint_custom_minimizer")
progress.save(path_pkl=os.path.join(out, "optimization_progress.pkl"),
              path_xls=os.path.join(out, "optimization_progress.xls"))
rel = np.abs(x_opt - v_true) / v_true
print("true:", dict(zip(names, v_true)))
print("recovered:", dict(zip(names, x_opt)))
print("evals:", progress.number_iterations, "J:", res.fun, "->", out)
assert (rel < 1e-2).all(), rel
