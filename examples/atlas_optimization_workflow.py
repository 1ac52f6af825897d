"""Full image-based atlas optimization pipeline, end to end.

Rebuild of the reference's ordered workflow test
(``optimization_workflow/test_imageBasedOptimizationAtlas.py:61-136``):

  01 prepare domain (atlas slice -> mesh)      -> 01_domain_preparation/
  02 forward simulation (synthetic 'patient')  -> 02_forward_simulation/
  03 target fields (thresholded conc + disp)   -> 03_target_fields/
  04 inverse problem (adjoint L-BFGS-B)        -> 02_inverse_simulation/
  05 optimized re-simulation                   -> 02_optimized_simulation/
  06 comparison + analysis summary             -> comparison/, summary/

Every stage persists state; rerunning resumes from the pickle.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from example_config import (
    BRAIN_PARAMS_FIXED,
    BRAIN_PARAMS_VARYING,
    example_out,
    synthetic_atlas_path,
)
from glimslib_tpu.workflow.image_based_optimization_atlas import (
    ImageBasedOptimizationAtlas,
)

base_dir = example_out("atlas_optimization_workflow")
atlas = synthetic_atlas_path(nx=40, ny=40, nz=16)

wf = ImageBasedOptimizationAtlas(
    base_dir=base_dir, path_to_labels_atlas=atlas, image_z_slice=8
)
wf.prepare_domain()
print("[01] domain:", wf.mesh.n_nodes, "nodes")

seed = wf.mesh.points.mean(axis=0) + np.array([4.0, 0.0])
sim_params = dict(sim_time=3, sim_time_step=1, seed_width=2.0)
wf.init_forward_problem(seed, BRAIN_PARAMS_VARYING, BRAIN_PARAMS_FIXED,
                        sim_params)
wf.run_forward_sim(plot=False)
print("[02] forward max conc:", wf.measures["forward_final_max_conc"])

wf.create_target_fields()
print("[03] targets written")

start = dict(BRAIN_PARAMS_VARYING, D_WM=0.05, rho_WM=0.05)
wf.init_inverse_problem(seed, start, sim_params, optimization_type=2)
opt = wf.run_inverse_problem(opt_params={"tol": 1e-8, "gtol": 1e-8,
                                         "maxiter": 50})
print("[04] optimized params:", opt)

wf.init_optimized_problem()
wf.run_optimized_sim(plot=False)
result = wf.compare_original_optimized()
print("[05] parameter relative errors:",
      wf.measures["param_relative_errors"])

frames = wf.post_process()  # per-step per-subdomain volume/COM frames
print("[06] volume frame columns:", list(frames["volume"].columns))
df = wf.compute_volume_com_per_step("forward")
wf.write_analysis_summary({"volume_com": df.to_dict()})
print("[06] summary ->", wf.path_to_summary)
