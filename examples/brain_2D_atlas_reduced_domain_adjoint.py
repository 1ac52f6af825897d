"""Reduced-domain brain adjoint: cut the domain down to the tissues of
interest, then estimate parameters on the reduced mesh.

Rebuild of reference ``test_case_simulation_tumor_growth_brain_2D_atlas_
reduced_domain_adjoint_mpi_separated_functional.py`` (and the workflow's
``_reduce_2d_domain``, image_based_optimization.py:251-257): the 'outside'
subdomain is removed with a threshold round-trip
(utils.data_io.remove_mesh_subdomain), the brain model runs on the reduced
mesh, and a 2-parameter inverse problem recovers (D_WM, rho_WM).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from example_config import (
    BRAIN_PARAMS_FIXED,
    BRAIN_PARAMS_VARYING,
    TISSUE_MAP,
    BoundaryAll,
    example_out,
    gaussian_iv,
    synthetic_atlas_path,
)
from glimslib_tpu.core.subdomains import SubDomains
from glimslib_tpu.models.tumor_growth_brain import TumorGrowthBrain
from glimslib_tpu.optimize.adjoint import InverseProblem, param_map_for_type, thresh
from glimslib_tpu.utils import data_io as dio
from glimslib_tpu.utils.vtk_utils import cell_to_point_data

out = example_out("brain_2D_atlas_reduced_domain_adjoint")

# 1. atlas slice -> full-domain mesh + labels
atlas = synthetic_atlas_path()
mesh_full, labels_full = dio.get_labelfunction_from_image(atlas, z_slice=12)
sd = SubDomains(mesh_full)
sd.setup_subdomains(label_function=labels_full)

# 2. remove the 'outside' subdomain (id 0) -> reduced mesh
mesh, cell_labels = dio.remove_mesh_subdomain(
    mesh_full, sd.cell_labels, lower_thr=1, upper_thr=4
)
labels = np.rint(cell_to_point_data(mesh.n_nodes, mesh.cells, cell_labels))
print(f"reduced domain: {mesh_full.n_cells} -> {mesh.n_cells} cells")


def build():
    sim = TumorGrowthBrain(mesh)
    sim.setup_global_parameters(
        label_function=labels,
        domain_names=TISSUE_MAP,
        boundaries={"boundary_all": BoundaryAll()},
        dirichlet_bcs={
            "clamped_boundary": {
                "bc_value": np.zeros(2),
                "named_boundary": "boundary_all",
                "subspace_id": 0,
            }
        },
    )
    seed = mesh.points.mean(axis=0) + np.array([4.0, 0.0])
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(2), 1: gaussian_iv(seed, width=2.0)},
        sim_time=3, sim_time_step=1,
        **BRAIN_PARAMS_FIXED, **BRAIN_PARAMS_VARYING,
    )
    return sim


# 3. synthesize targets with the true parameters
import jax
import jax.numpy as jnp

sim = build()
theta = sim.make_theta(sim.params.as_dict())
iv = sim.params.create_initial_value_function()
simulate = jax.jit(sim.build_simulate_fn(3, 1.0))
u_traj, c_traj, ok, _ = simulate(theta, jnp.asarray(iv[0]), jnp.asarray(iv[1]))
assert bool(np.asarray(ok).all())
targets = {
    "conc_T2": np.asarray(thresh(c_traj[-1], 0.12)),
    "conc_T1": np.asarray(thresh(c_traj[-1], 0.80)),
    "disp": np.asarray(u_traj[-1]),
}

# 4. 2-parameter estimation from a perturbed start (D_GM tied = 0.2 D_WM)
names, update = param_map_for_type(2)
ip = InverseProblem(sim, names, targets, update_fn=update)
x_opt, progress, res = ip.minimize(
    x0=np.array([0.05, 0.05]), opt_params={"tol": 1e-10, "gtol": 1e-8},
)
print("true:", [BRAIN_PARAMS_VARYING["D_WM"], BRAIN_PARAMS_VARYING["rho_WM"]])
print("recovered:", dict(zip(names, x_opt)))
print("iterations:", progress.number_iterations, "J:", res.fun)
progress.save(path_pkl=os.path.join(out, "optimization_progress.pkl"))
print("->", out)
