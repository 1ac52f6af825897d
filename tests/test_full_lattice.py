"""Full-lattice image meshes: unused nodes auto-masked, stencil fast path
engaged, results identical to the compact (orphan-removed) mesh."""

import numpy as np
import jax.numpy as jnp
import pytest

from glimslib_tpu.models.tumor_growth_brain import TumorGrowthBrain
from glimslib_tpu.utils.image_io import Image
from glimslib_tpu.utils.meshing import mesh_image_labels
from glimslib_tpu.utils.synthetic import brain_labelmap_3d
from glimslib_tpu.utils.vtk_utils import cell_to_point_data


class Boundary:
    def inside(self, x, on_boundary):
        return on_boundary


PARAMS = dict(
    E_GM=3e3, E_WM=3e3, E_CSF=1e3, E_VENT=1e3,
    nu_GM=0.45, nu_WM=0.45, nu_CSF=0.45, nu_VENT=0.3,
    D_GM=0.02, D_WM=0.1, rho_GM=0.02, rho_WM=0.1, coupling=0.15,
)


def _run(mesh, cell_labels, tmp, tag):
    labels = np.rint(cell_to_point_data(mesh.n_nodes, mesh.cells, cell_labels))
    sim = TumorGrowthBrain(mesh)
    sim.setup_global_parameters(
        label_function=labels,
        domain_names={0: "outside", 1: "CSF", 2: "GM", 3: "WM", 4: "Ventricles"},
        boundaries={"boundary_all": Boundary()},
        dirichlet_bcs={
            "clamped": {"bc_value": np.zeros(3),
                        "named_boundary": "boundary_all", "subspace_id": 0}
        },
    )
    center = mesh.points[mesh.cells[np.argmax(cell_labels == 3)]].mean(axis=0)
    sim.setup_model_parameters(
        iv_expression={
            0: np.zeros(3),
            1: lambda x: np.exp(-((x - center) ** 2).sum(axis=1) / 3.0),
        },
        sim_time=2, sim_time_step=1, **PARAMS,
    )
    sim.run(save_method=None, plot=False, output_dir=str(tmp / tag))
    return sim


def test_full_lattice_matches_compact(tmp_path):
    lab = brain_labelmap_3d(12, 12, 10)
    img = Image(lab, origin=(0, 0, 0), spacing=(1, 1, 1))
    m_full, lab_full = mesh_image_labels(img, full_lattice=True)
    m_comp, lab_comp = mesh_image_labels(img, full_lattice=False)
    assert m_full.lattice_strides is not None
    assert m_full.n_nodes > m_comp.n_nodes  # orphans retained

    s_full = _run(m_full, lab_full, tmp_path, "full")
    assert hasattr(s_full, "_stencil_ops")  # fast path engaged
    s_comp = _run(m_comp, lab_comp, tmp_path, "comp")
    assert not hasattr(s_comp, "_stencil_ops")

    # map full-lattice nodes -> compact nodes by coordinates
    from scipy.spatial import cKDTree

    tree = cKDTree(m_full.points)
    dist, idx = tree.query(m_comp.points)
    assert dist.max() < 1e-12
    c_full = np.asarray(s_full.solution[1])[idx]
    c_comp = np.asarray(s_comp.solution[1])
    rel = np.linalg.norm(c_full - c_comp) / np.linalg.norm(c_comp)
    assert rel < 1e-8, rel
    u_full = np.asarray(s_full.solution[0])[idx]
    u_comp = np.asarray(s_comp.solution[0])
    rel_u = np.linalg.norm(u_full - u_comp) / max(np.linalg.norm(u_comp), 1e-30)
    assert rel_u < 1e-6, rel_u
    # orphan nodes stay exactly zero
    unused = np.setdiff1d(np.arange(m_full.n_nodes),
                          np.unique(m_full.cells.ravel()))
    assert np.allclose(np.asarray(s_full.solution[1])[unused], 0.0)


def test_lattice_tags_hdf5_roundtrip(tmp_path):
    from glimslib_tpu.utils import data_io as dio

    lab = brain_labelmap_3d(8, 8, 8)
    img = Image(lab, origin=(0, 0, 0), spacing=(1, 1, 1))
    mesh, cl = mesh_image_labels(img, full_lattice=True)
    p = str(tmp_path / "m.h5")
    dio.save_mesh_hdf5(mesh, p, subdomains=cl)
    m2, cl2, _ = dio.read_mesh_hdf5(p)
    assert m2.lattice_shape == mesh.lattice_shape
    assert m2.lattice_strides == mesh.lattice_strides
