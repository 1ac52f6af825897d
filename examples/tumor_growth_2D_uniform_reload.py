"""Run, checkpoint, reload, postprocess — in a fresh simulation object.

Rebuild of reference ``test_case_simulation_tumor_growth_2D_uniform_reload.py``:
the whole-series HDF5 checkpoint written at the end of ``run()`` is loaded
into a new simulation instance (``reload_from_hdf5``), which then
postprocesses without re-solving — the workflow used to postprocess MPI
runs serially (reference SURVEY §3.5).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from example_config import BoundaryAll, example_out, gaussian_iv
from glimslib_tpu.core.mesh import rectangle_mesh
from glimslib_tpu.models.tumor_growth import TumorGrowth

out = example_out("tumor_growth_2D_uniform_reload")
mesh = rectangle_mesh((-5, -5), (5, 5), 25, 25)


def build():
    sim = TumorGrowth(mesh)
    sim.setup_global_parameters(
        boundaries={"boundary_all": BoundaryAll()},
        dirichlet_bcs={
            "clamped_boundary": {"bc_value": np.zeros(2),
                                 "named_boundary": "boundary_all",
                                 "subspace_id": 0}
        },
    )
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(2), 1: gaussian_iv((0, 0))},
        diffusion=0.1, coupling=1.0, proliferation=0.1, E=0.001, poisson=0.45,
        sim_time=5, sim_time_step=1,
    )
    return sim


# 1. run + checkpoint
sim = build()
sim.run(keep_nth=1, save_method=None, plot=False, output_dir=out)
ckpt = os.path.join(out, "solution_timeseries.h5")
assert os.path.exists(ckpt)
print("checkpoint:", ckpt)

# 2. fresh instance, reload, postprocess without solving
sim2 = build()
sim2.reload_from_hdf5(ckpt, output_dir=out)
steps = sim2.results.get_recording_steps()
print("reloaded steps:", steps)
for rs in steps:
    a = sim.results.get_result(rs)[1]
    b = sim2.results.get_result(rs)[1]
    assert np.array_equal(a, b)
sim2.init_postprocess(os.path.join(out, "postprocess"))
sim2.postprocess.save_all()
sim2.postprocess.plot_all()
print("postprocess from reload ->", out)
