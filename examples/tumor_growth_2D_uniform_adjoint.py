"""Adjoint parameter estimation, 2D uniform domain.

Rebuild of reference
``test_case_simulation_tumor_growth_2D_uniform_adjoint.py`` (l.33-104):
forward-simulate with known (D, rho, coupling), build the misfit functional
on the final state, recover the parameters with bounded L-BFGS-B.  The
dolfin-adjoint ReducedFunctional machinery becomes a jitted
``jax.value_and_grad`` through the time loop.

Variants covered by flags:
  --noise 0.05       noisy targets (…_adjoint_noise.py)
  --params 2         2-parameter estimation (run_for_adjoint2)
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
parser.add_argument("--noise", type=float, default=0.0)
parser.add_argument("--params", type=int, default=3, choices=[2, 3])
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

names, update = tumor_growth_param_map(args.params)
v_true = {3: np.array([0.1, 0.1, 0.2]), 2: np.array([0.1, 0.1])}[args.params]

# synthesize targets with the true parameters (reference l.70-90)
import jax
import jax.numpy as jnp

theta = sim.make_theta({**sim.params.as_dict(), **update(v_true)})
iv = sim.params.create_initial_value_function()
simulate = jax.jit(sim.build_simulate_fn(5, 1.0))
u_traj, c_traj, ok, _ = simulate(theta, jnp.asarray(iv[0]), jnp.asarray(iv[1]))
assert bool(np.asarray(ok).all())
rng = np.random.default_rng(0)
c_target = np.asarray(c_traj[-1])
u_target = np.asarray(u_traj[-1])
if args.noise > 0:
    c_target = c_target + args.noise * rng.standard_normal(c_target.shape)
    u_target = u_target + args.noise * np.abs(u_target).max() * rng.standard_normal(
        u_target.shape
    )

ip = InverseProblem(
    sim, names, {"conc": c_target, "disp": u_target}, update_fn=update
)
x0 = np.full(len(names), 0.05)
x_opt, progress, res = ip.minimize(
    x0, bounds=[(0.005, 0.5)] * len(names),
    opt_params={"tol": 1e-10, "gtol": 1e-8},
)
out = example_out("tumor_growth_2D_uniform_adjoint")
progress.save(path_pkl=os.path.join(out, "optimization_progress.pkl"),
              path_xls=os.path.join(out, "optimization_progress.xls"))
print("true:", dict(zip(names, v_true)))
print("recovered:", dict(zip(names, x_opt)))
print("iterations:", progress.number_iterations,
      "J:", res.fun, "->", out)
