"""Patient-workflow test: atlas->patient domain prep (registration
fallback) and patient-segmentation-derived target fields
(reference test_imageBasedOptimizationPatient / patient.py:34-195)."""

import os

import numpy as np
import pytest

from glimslib_tpu.utils.image_io import Image, write_mha
from glimslib_tpu.utils.synthetic import brain_labelmap_3d, t1_from_labels
from glimslib_tpu.workflow.image_based_optimization_patient import (
    ImageBasedOptimizationPatient,
)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("patient_data")
    lab = brain_labelmap_3d(20, 20, 8)
    t1 = t1_from_labels(lab)
    # synthetic patient: same frame, with a tumor segmentation blob
    seg = np.zeros_like(lab)
    seg[3:6, 8:14, 8:14] = 6  # T2 region
    seg[4:5, 10:12, 10:12] = 5  # T1 core
    paths = {}
    for name, arr in [("atlas_labels", lab), ("atlas_t1", t1),
                      ("patient_t1", t1), ("patient_seg", seg)]:
        p = str(d / f"{name}.mha")
        write_mha(p, Image(np.ascontiguousarray(arr), origin=(0, 0, 0),
                           spacing=(1, 1, 1)))
        paths[name] = p
    return paths


def test_patient_pipeline(data, tmp_path):
    wf = ImageBasedOptimizationPatient(
        base_dir=str(tmp_path),
        path_to_labels_atlas=data["atlas_labels"],
        path_to_image_atlas=data["atlas_t1"],
        path_to_image_patient=data["patient_t1"],
        path_to_labels_patient=data["patient_seg"],
        image_z_slice=4,
        t1_label=5,
        t2_label=6,
    )
    # domain prep through the (fallback) registration path
    wf.prepare_domain(use_registration=True)
    assert wf.mesh.n_nodes == 20 * 20
    assert os.path.exists(wf.path_to_labels_atlas_registered)

    # patient-derived targets
    cT2, cT1 = wf.create_target_fields()
    assert cT2.shape == (wf.mesh.n_nodes,)
    assert cT2.max() > 0.5  # tumor region present in the slice
    assert cT1.sum() <= cT2.sum()  # T1 core inside T2 region
    assert os.path.exists(wf.path_conc_T2)
    assert os.path.exists(wf.path_displacement_reconstructed)

    # inverse problem runs on patient targets (1 iteration smoke)
    from glimslib_tpu.workflow.image_based_optimization import TISSUE_MAP

    seed_idx = np.argmax(cT1)
    seed = wf.mesh.points[seed_idx]
    params = dict(D_WM=0.08, D_GM=0.016, rho_WM=0.08, rho_GM=0.016,
                  coupling=0.1)
    fixed = dict(E_GM=3e3, E_WM=3e3, E_CSF=1e3, E_VENT=1e3,
                 nu_GM=0.45, nu_WM=0.45, nu_CSF=0.45, nu_VENT=0.3)
    wf.init_inverse_problem(seed, params, dict(sim_time=2, sim_time_step=1,
                                               seed_width=1.5),
                            model_params_fixed=fixed, optimization_type=2)
    opt = wf.run_inverse_problem(opt_params={"maxiter": 3, "tol": 1e-3,
                                             "gtol": 1e-3})
    assert set(opt) == {"D_WM", "rho_WM"}
    assert np.isfinite(list(opt.values())).all()
