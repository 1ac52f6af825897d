"""Adjoint parameter estimation against RELOADED targets, 2D uniform domain.

Rebuild of reference
``test_case_simulation_tumor_growth_2D_uniform_adjoint_reloaded.py``: the
target fields are written to disk (XDMF checkpoint there, the whole-series
HDF5 checkpoint here), read back into a *fresh* simulation instance, and
the inverse problem is solved against the reloaded fields — the round-trip
the reference uses to decouple target generation from inversion.

Run (CPU): GLIMS_PLATFORM=cpu GLIMS_X64=1 python examples/tumor_growth_2D_uniform_adjoint_reloaded.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from example_config import BoundaryAll, example_out, gaussian_iv
from glimslib_tpu.core.mesh import rectangle_mesh
from glimslib_tpu.models.tumor_growth import TumorGrowth
from glimslib_tpu.optimize.adjoint import InverseProblem, tumor_growth_param_map

out = example_out("tumor_growth_2D_uniform_adjoint_reloaded")
mesh = rectangle_mesh((-5, -5), (5, 5), 25, 25)
SIM_TIME, DT = 5, 1.0


def build(**param_overrides):
    sim = TumorGrowth(mesh)
    sim.setup_global_parameters(
        boundaries={"boundary_all": BoundaryAll()},
        dirichlet_bcs={
            "clamped_boundary": {"bc_value": np.zeros(2),
                                 "named_boundary": "boundary_all",
                                 "subspace_id": 0}
        },
    )
    params = dict(diffusion=0.1, coupling=0.2, proliferation=0.1,
                  E=0.001, poisson=0.45)
    params.update(param_overrides)
    # seed off-center like the reference reloaded case (x0=y0=2.5)
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(2), 1: gaussian_iv((2.5, 2.5))},
        sim_time=SIM_TIME, sim_time_step=DT, **params,
    )
    return sim


# 1. forward-simulate the target trajectory with the TRUE parameters and
#    checkpoint the whole series (reference l.99-124 writes XDMF)
names, update = tumor_growth_param_map(3)
v_true = np.array([0.05, 0.05, 0.1])  # reference targets (l.96-98)
sim_target = build(**update(v_true))
sim_target.run(keep_nth=1, save_method=None, plot=False, output_dir=out)
ckpt = os.path.join(out, "solution_timeseries.h5")
assert os.path.exists(ckpt)
print("target checkpoint:", ckpt)

# 2. fresh instance: reload the targets from disk (reference l.140-150)
sim = build()
sim.reload_from_hdf5(ckpt, output_dir=out)
last = sim.results.get_recording_steps()[-1]
fields = sim.results.get_result(last)
u_target = np.asarray(fields[0])
c_target = np.asarray(fields[1])
print("reloaded target fields from step", last)

# 3. invert against the reloaded fields (reference J at l.178-180)
ip = InverseProblem(
    sim, names, {"conc": c_target, "disp": u_target}, update_fn=update
)
x0 = np.array([0.1, 0.1, 0.2])  # reference initial guesses (l.131-133)
x_opt, progress, res = ip.minimize(
    x0, bounds=[(0.005, 0.5)] * len(names),
    opt_params={"tol": 1e-10, "gtol": 1e-8},
)
progress.save(path_pkl=os.path.join(out, "optimization_progress.pkl"),
              path_xls=os.path.join(out, "optimization_progress.xls"))
rel = np.abs(x_opt - v_true) / v_true
print("true:", dict(zip(names, v_true)))
print("recovered:", dict(zip(names, x_opt)))
print("iterations:", progress.number_iterations, "J:", res.fun, "->", out)
assert (rel < 1e-3).all(), rel
