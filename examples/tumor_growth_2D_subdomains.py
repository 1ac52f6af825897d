"""Forward simulation with 2 tissue subdomains and heterogeneous parameters.

Rebuild of reference ``test_case_simulation_tumor_growth_2D_subdomains.py``
(l.35-107): a circular inclusion ('in') inside a background tissue ('out'),
per-tissue dict parameters (the DiscontinuousScalar mechanism), no-flux
behavior imposed through zero diffusivity/proliferation in the isolated
tissue (reference's recommended approach, helper_classes.py von-Neumann
notes).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from example_config import BoundaryAll, example_out, gaussian_iv
from glimslib_tpu.core.mesh import rectangle_mesh
from glimslib_tpu.models.tumor_growth import TumorGrowth

mesh = rectangle_mesh((-5, -5), (5, 5), 50, 50)
# nodal label function: 1 = outside tissue, 2 = inclusion (r < 2)
r = np.linalg.norm(mesh.points, axis=1)
labels = np.where(r < 2.0, 2.0, 1.0)

sim = TumorGrowth(mesh)
sim.setup_global_parameters(
    label_function=labels,
    domain_names={1: "out", 2: "in"},
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
    iv_expression={0: np.zeros(2), 1: gaussian_iv((0.0, 0.0))},
    diffusion={"in": 0.2, "out": 0.05},
    proliferation={"in": 0.2, "out": 0.05},
    coupling={"in": 0.2, "out": 0.05},
    E={"in": 0.002, "out": 0.001},
    poisson={"in": 0.4, "out": 0.45},
    sim_time=10,
    sim_time_step=1,
)
out = example_out("tumor_growth_2D_subdomains")
sim.run(save_method="vtk", plot=True, output_dir=out, clear_all=True)
sim.init_postprocess(os.path.join(out, "postprocess", "plots"))
sim.postprocess.plot_all()
print("outputs in", out)
