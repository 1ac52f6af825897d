"""Forward simulation, 2D uniform parameters.

Rebuild of reference
``test_cases/test_simulation_tumor_growth/test_case_simulation_tumor_growth_2D_uniform.py``:
50x50 rectangle domain on [-5,5]^2, Gaussian concentration seed, clamped
displacement boundary, sim_time 5 / dt 1, VTK outputs + postprocess plots.

Run: ``python examples/tumor_growth_2D_uniform.py``
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from example_config import BoundaryAll, example_out, gaussian_iv
from glimslib_tpu.core.mesh import rectangle_mesh
from glimslib_tpu.models.tumor_growth import TumorGrowth
from glimslib_tpu.utils import data_io as dio

# == problem settings (reference l.33-79) ====================================
nx = ny = 50
mesh = rectangle_mesh((-5, -5), (5, 5), nx, ny)

dirichlet_bcs = {
    "clamped_boundary": {
        "bc_value": np.array([0.0, 0.0]),
        "named_boundary": "boundary_all",
        "subspace_id": 0,
    }
}
von_neumann_bcs = {}

u_0_conc_expr = gaussian_iv((0.0, 0.0), width=1.0 / np.sqrt(2))  # exp(-r^2)
u_0_disp_expr = np.array([0.0, 0.0])

sim_time = 5
sim_time_step = 1

# == setup & run ==============================================================
sim = TumorGrowth(mesh)
sim.setup_global_parameters(
    boundaries={"boundary_all": BoundaryAll()},
    dirichlet_bcs=dirichlet_bcs,
    von_neumann_bcs=von_neumann_bcs,
)
sim.setup_model_parameters(
    iv_expression={0: u_0_disp_expr, 1: u_0_conc_expr},
    diffusion=0.1,
    coupling=1.0,
    proliferation=0.1,
    E=0.001,
    poisson=0.45,
    sim_time=sim_time,
    sim_time_step=sim_time_step,
)

output_path = example_out("tumor_growth_2D_uniform")
sim.run(save_method="vtk", plot=True, output_dir=output_path, clear_all=True)

# == postprocess (reference l.88-96) =========================================
sim.init_postprocess(os.path.join(output_path, "postprocess", "plots"))
sim.postprocess.plot_all(deformed=False)
sim.postprocess.plot_all(deformed=True)
sim.postprocess.save_all(output_dir=os.path.join(output_path, "postprocess"))
print("outputs in", output_path)
