"""Convert a VTU mesh (+subdomain cell data) to the framework's HDF5 mesh
format — the pre-conversion step the reference requires before parallel
runs (reference test_cases/test_simulation_tumor_growth/
convert_vtk_mesh_to_fenics_hdf5.py:13-61).

Usage: python examples/convert_vtu_mesh_to_hdf5.py input.vtu output.h5
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from glimslib_tpu.utils import data_io as dio

if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    src, dst = sys.argv[1], sys.argv[2]
    mesh, subdomains = dio.read_vtk_convert_to_fenics(src)
    dio.save_mesh_hdf5(mesh, dst, subdomains=subdomains)
    print(f"{src}: {mesh.n_nodes} nodes, {mesh.n_cells} cells -> {dst}")
