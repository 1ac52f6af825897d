"""3D cross-model parity: TumorGrowth (per-tissue dicts) vs TumorGrowthBrain
on the same image-derived tet mesh.

Rebuild of reference ``test_case_comparison_3D_atlas.py``: both
formulations solve the identical problem; Comparison errornorms must be at
machine precision.
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
from glimslib_tpu.models.tumor_growth import TumorGrowth
from glimslib_tpu.models.tumor_growth_brain import E_OUT, NU_OUT, TumorGrowthBrain
from glimslib_tpu.postprocess import Comparison
from glimslib_tpu.utils.image_io import read_image
from glimslib_tpu.utils.meshing import mesh_image_labels
from glimslib_tpu.utils.vtk_utils import cell_to_point_data

out = example_out("comparison_3D_atlas")
atlas = synthetic_atlas_path(nx=24, ny=24, nz=16)
mesh, cell_labels = mesh_image_labels(read_image(atlas))
labels = np.rint(cell_to_point_data(mesh.n_nodes, mesh.cells, cell_labels))
print(f"mesh: {mesh.n_nodes} nodes, {mesh.n_cells} tets")

seed = mesh.points.mean(axis=0) + np.array([3.0, 0.0, 0.0])


def setup(sim, params):
    sim.setup_global_parameters(
        label_function=labels,
        domain_names=TISSUE_MAP,
        boundaries={"boundary_all": BoundaryAll()},
        dirichlet_bcs={
            "clamped_boundary": {"bc_value": np.zeros(3),
                                 "named_boundary": "boundary_all",
                                 "subspace_id": 0}
        },
    )
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(3), 1: gaussian_iv(seed, width=2.0)},
        sim_time=2, sim_time_step=1, **params,
    )


brain = TumorGrowthBrain(mesh)
setup(brain, {**BRAIN_PARAMS_FIXED, **BRAIN_PARAMS_VARYING})
brain.run(save_method=None, plot=False, output_dir=os.path.join(out, "brain"))

uniform_params = dict(
    E={"outside": E_OUT, "CSF": 1e3, "GM": 3e3, "WM": 3e3, "Ventricles": 1e3},
    poisson={"outside": NU_OUT, "CSF": 0.45, "GM": 0.45, "WM": 0.45,
             "Ventricles": 0.3},
    diffusion={"outside": 0.0, "CSF": 0.0, "GM": 0.02, "WM": 0.1,
               "Ventricles": 0.0},
    proliferation={"outside": 0.0, "CSF": 0.0, "GM": 0.02, "WM": 0.1,
                   "Ventricles": 0.0},
    coupling=0.15,
)
uni = TumorGrowth(mesh)
setup(uni, uniform_params)
uni.run(save_method=None, plot=False, output_dir=os.path.join(out, "uniform"))

df = Comparison(brain, uni).compare()
print(df.to_string())
df.to_pickle(os.path.join(out, "comparison.pkl"))
assert (df["errornorm_concentration"] < 1e-9).all()
assert (df["errornorm_displacement"] < 1e-9).all()
print("3D parity confirmed ->", out)
