"""3D brain-atlas forward solve, mesh-sharded over all available devices.

Rebuild of reference ``test_case_simulation_tumor_growth_3D_atlas_mpi.py``
(run with ``mpirun -np 4``, README.md:155-183): the synthetic 3D atlas
labelmap is meshed (image -> tets), the mesh HDF5 is written (the reference
pre-converts VTU -> HDF5 for parallel load), and the forward solve runs
with cells sharded over a 1-D device mesh — ``sim.use_sharding()`` is the
``mpirun`` analogue.  On one device it degenerates to a serial run; under
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``
it exercises the 8-way sharded path.

Post-hoc, the solution series reloads from HDF5 for serial postprocessing
(reference script l.145-151).
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
from glimslib_tpu.models.tumor_growth_brain import TumorGrowthBrain
from glimslib_tpu.utils import data_io as dio
from glimslib_tpu.utils.image_io import read_image
from glimslib_tpu.utils.meshing import mesh_image_labels
from glimslib_tpu.utils.vtk_utils import cell_to_point_data

out = example_out("tumor_growth_3D_atlas_sharded")

# 1. image -> tet mesh (MeshTool replacement) + HDF5 (reference pre-convert)
atlas = synthetic_atlas_path(nx=32, ny=32, nz=16)
img = read_image(atlas)
mesh, cell_labels = mesh_image_labels(img)
path_h5 = os.path.join(out, "brain_atlas_mesh_3d.h5")
dio.save_mesh_hdf5(mesh, path_h5, subdomains=cell_labels)
mesh, cell_labels, _ = dio.read_mesh_hdf5(path_h5)
labels = np.rint(cell_to_point_data(mesh.n_nodes, mesh.cells, cell_labels))
print(f"mesh: {mesh.n_nodes} nodes, {mesh.n_cells} tets")

# 2. model setup
sim = TumorGrowthBrain(mesh)
sim.setup_global_parameters(
    label_function=labels,
    domain_names=TISSUE_MAP,
    boundaries={"boundary_all": BoundaryAll()},
    dirichlet_bcs={
        "clamped_boundary": {
            "bc_value": np.zeros(3),
            "named_boundary": "boundary_all",
            "subspace_id": 0,
        }
    },
)
seed = mesh.points.mean(axis=0) + np.array([4.0, 0.0, 0.0])
sim.setup_model_parameters(
    iv_expression={0: np.zeros(3), 1: gaussian_iv(seed, width=2.0)},
    sim_time=5, sim_time_step=1,
    **BRAIN_PARAMS_FIXED, **BRAIN_PARAMS_VARYING,
)

# 3. shard over every available device (mpirun analogue) and run
import jax

if len(jax.devices()) > 1:
    dmesh = sim.use_sharding()
    print(f"sharded over {dmesh.devices.size} devices")
sim.run(save_method="xdmf", plot=False, output_dir=out)

# 4. serial post-hoc reload + postprocess (reference l.145-151)
sim.reload_from_hdf5(os.path.join(out, "solution_timeseries.h5"), output_dir=out)
sim.init_postprocess(os.path.join(out, "postprocess"))
sim.postprocess.save_all(save_method="vtk")
print("final max concentration:", float(np.max(sim.solution[1])))
print("outputs in", out)
