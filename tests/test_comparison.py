"""Cross-model parity: TumorGrowthBrain must agree with TumorGrowth when
given matching coefficients — the reference's own parity claim
(simulation_tumor_growth_brain.py:12-15, validated there by
test_case_comparison_2D_atlas.py:203-206 with Comparison errornorms).

Also covers the Comparison harness and subdomain/BC machinery on a
label-map-derived domain."""

import numpy as np
import pytest

from glimslib_tpu.core.mesh import rectangle_mesh
from glimslib_tpu.models.tumor_growth import TumorGrowth
from glimslib_tpu.models.tumor_growth_brain import TumorGrowthBrain
from glimslib_tpu.postprocess import Comparison


class Boundary:
    def inside(self, x, on_boundary):
        return on_boundary


@pytest.fixture(scope="module")
def labeled_domain():
    """Small 2D domain with a 4-tissue concentric label function."""
    mesh = rectangle_mesh((-5, -5), (5, 5), 12, 12)
    r = np.linalg.norm(mesh.points, axis=1)
    labels = np.zeros(mesh.n_nodes)
    labels[r < 5.5] = 1  # CSF
    labels[r < 4.0] = 2  # GM
    labels[r < 2.8] = 3  # WM
    labels[r < 1.0] = 4  # Ventricles
    return mesh, labels


TISSUE_MAP = {0: "outside", 1: "CSF", 2: "GM", 3: "WM", 4: "Ventricles"}

BRAIN_PARAMS = dict(
    E_GM=3e3, E_WM=3e3, E_CSF=1e3, E_VENT=1e3,
    nu_GM=0.45, nu_WM=0.45, nu_CSF=0.45, nu_VENT=0.3,
    D_GM=0.01, D_WM=0.05, rho_GM=0.01, rho_WM=0.05,
    coupling=0.1,
)


def _setup(sim, mesh, labels, params, iv):
    sim.setup_global_parameters(
        label_function=labels,
        domain_names=TISSUE_MAP,
        boundaries={"boundary_all": Boundary()},
        dirichlet_bcs={
            "clamped": {
                "bc_value": np.zeros(2),
                "named_boundary": "boundary_all",
                "subspace_id": 0,
            }
        },
        von_neumann_bcs={},
    )
    sim.setup_model_parameters(iv_expression=iv, sim_time=2, sim_time_step=1,
                               **params)


def gaussian(coords):
    return np.exp(-0.5 * (coords**2).sum(axis=1))


def test_brain_vs_uniform_model_parity(labeled_domain, tmp_path):
    """Brain model with per-tissue params == TumorGrowth with equivalent
    per-tissue dicts (DiscontinuousScalar analogue)."""
    mesh, labels = labeled_domain
    iv = {0: np.zeros(2), 1: gaussian}

    brain = TumorGrowthBrain(mesh)
    _setup(brain, mesh, labels, BRAIN_PARAMS, iv)
    brain.run(save_method=None, plot=False, output_dir=str(tmp_path / "brain"))

    # equivalent TumorGrowth: per-tissue dicts matching the brain wiring
    from glimslib_tpu.models.tumor_growth_brain import E_OUT, NU_OUT

    uniform_params = dict(
        E={"outside": E_OUT, "CSF": 1e3, "GM": 3e3, "WM": 3e3, "Ventricles": 1e3},
        poisson={"outside": NU_OUT, "CSF": 0.45, "GM": 0.45, "WM": 0.45,
                 "Ventricles": 0.3},
        diffusion={"outside": 0.0, "CSF": 0.0, "GM": 0.01, "WM": 0.05,
                   "Ventricles": 0.0},
        proliferation={"outside": 0.0, "CSF": 0.0, "GM": 0.01, "WM": 0.05,
                       "Ventricles": 0.0},
        coupling=0.1,
    )
    uni = TumorGrowth(mesh)
    _setup(uni, mesh, labels, uniform_params, iv)
    uni.run(save_method=None, plot=False, output_dir=str(tmp_path / "uni"))

    comp = Comparison(brain, uni)
    df = comp.compare()
    assert len(df) == 3
    assert (df["errornorm_concentration"] < 1e-9).all(), df
    assert (df["errornorm_displacement"] < 1e-9).all(), df


def test_subdomain_coefficients_differ_by_tissue(labeled_domain):
    mesh, labels = labeled_domain
    brain = TumorGrowthBrain(mesh)
    _setup(brain, mesh, labels, BRAIN_PARAMS, {0: np.zeros(2), 1: gaussian})
    theta = brain.make_theta(brain.params.as_dict())
    D = np.asarray(theta["D"])
    cl = brain.subdomains.cell_labels
    assert np.allclose(D[cl == 3], 0.05)  # WM
    assert np.allclose(D[cl == 2], 0.01)  # GM
    assert np.allclose(D[cl == 1], 0.0)  # CSF isolated
    assert np.allclose(D[cl == 4], 0.0)  # Ventricles


def test_subdomain_boundaries(labeled_domain):
    """Inter-tissue boundary enumeration (reference helper_classes.py:457-501)."""
    mesh, labels = labeled_domain
    from glimslib_tpu.core.subdomains import SubDomains

    sd = SubDomains(mesh)
    sd.setup_subdomains(label_function=labels)
    sd.setup_boundaries(tissue_map=TISSUE_MAP)
    # pairwise names exist
    assert "GM_WM" in sd.subdomain_boundaries_id_dict
    assert "no_boundary" in sd.subdomain_boundaries_id_dict
    # GM/WM interface is non-empty and its nodes sit between the tissues
    nodes = sd.subdomain_boundary_nodes("GM_WM")
    assert len(nodes) > 0
    # int(mean) truncation shifts interfaces inward (reference semantics:
    # int(label_function(midpoint)), helper_classes.py:441-443)
    r = np.linalg.norm(mesh.points[nodes], axis=1)
    assert r.max() < 4.0 and r.min() > 1.2
    assert sd.get_subdomain_id("WM") == 3
    assert sd.get_subdomain_id("nope") is None
