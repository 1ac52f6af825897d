"""Helper-class unit tests, mirroring the reference's tier-1 files
(test_unit_subSpaces / functionSpace / boundaryConditions /
simulationParameters / results / timeSeriesData, SURVEY.md §4)."""

import numpy as np
import pytest

from glimslib_tpu.core.bcs import BoundaryConditions
from glimslib_tpu.core.functionspace import FunctionSpace, SubSpace, SubSpaces
from glimslib_tpu.core.mesh import rectangle_mesh
from glimslib_tpu.core.params import Parameters, TissueCoefficient
from glimslib_tpu.core.results import Results, TimeSeriesData, TimeSeriesMultiData
from glimslib_tpu.core.subdomains import SubDomains


@pytest.fixture()
def fs2d():
    mesh = rectangle_mesh((0, 0), (1, 1), 4, 4)
    fs = FunctionSpace(mesh)
    fs.init_function_space([(1, 1), (0, 1)],
                           {0: "displacement", 1: "concentration"})
    return fs


# -- SubSpaces (reference test_unit_subSpaces.py) ----------------------------


def test_subspaces_registry():
    ss = SubSpaces(2)
    ss.set_subspace(0, SubSpace("displacement", 1, 1, 25, 2))
    ss.set_subspace(1, SubSpace("concentration", 0, 1, 25, 2))
    assert ss.get_subspace_ids() == [0, 1]
    assert ss.get_subspace(0).value_size == 2
    assert ss.get_subspace(1).value_size == 1
    assert ss.get_subspace(0).shape == (25, 2)
    assert ss.exists(1) and not ss.exists(2)


# -- FunctionSpace (reference test_unit_functionSpace.py) --------------------


def test_functionspace_pack_unpack(fs2d):
    f = fs2d.zero_function()
    assert f[0].shape == (25, 2)
    assert f[1].shape == (25,)
    f[0][:] = 1.0
    f[1][:] = 2.0
    flat = fs2d.pack(f)
    assert flat.shape == (75,)
    back = fs2d.unpack(flat)
    assert np.allclose(back[0], 1.0)
    assert np.allclose(back[1], 2.0)


def test_functionspace_projection_exact_for_linears(fs2d):
    """L2 projection reproduces polynomials in the space exactly."""
    vals = fs2d.project(lambda x: 2 * x[:, 0] - x[:, 1] + 1, subspace_id=1)
    want = 2 * fs2d.mesh.points[:, 0] - fs2d.mesh.points[:, 1] + 1
    assert np.allclose(vals, want, atol=1e-9)


def test_functionspace_project_over_space(fs2d):
    out = fs2d.project_over_space({0: np.array([1.0, -1.0]), 1: 0.5})
    assert np.allclose(out[0], [1.0, -1.0], atol=1e-9)
    assert np.allclose(out[1], 0.5, atol=1e-9)


# -- SubDomains + Parameters (reference test_unit_subDomains / ...Parameters) -


def test_parameters_validation(fs2d):
    sd = SubDomains(fs2d.mesh)
    sd.setup_subdomains()
    p = Parameters(fs2d, sd, time_dependent=True)
    p.define_required_params(["diffusion", "E"])
    p.define_optional_params(["source"])
    with pytest.raises(ValueError, match="missing"):
        p.init_parameters({"diffusion": 0.1})
    with pytest.raises(ValueError, match="unknown"):
        p.init_parameters({"diffusion": 0.1, "E": 1.0, "sim_time": 1,
                           "sim_time_step": 1, "bogus": 2})
    p.init_parameters({"diffusion": 0.1, "E": 1.0, "sim_time": 2,
                       "sim_time_step": 1})
    assert p.diffusion == 0.1
    assert p.get_names() == ["diffusion", "E", "sim_time", "sim_time_step"]


def test_parameters_tissue_dict(fs2d):
    mesh = fs2d.mesh
    labels = np.where(mesh.points[:, 0] < 0.5, 1.0, 2.0)
    sd = SubDomains(mesh)
    sd.setup_subdomains(label_function=labels)
    sd.setup_boundaries(tissue_map={1: "left", 2: "right"})
    p = Parameters(fs2d, sd)
    p.define_required_params(["diffusion"])
    p.init_parameters({"diffusion": {"left": 0.1, "right": 0.3}})
    assert isinstance(p.diffusion, TissueCoefficient)
    per_cell = np.asarray(p.cell_coefficient("diffusion"))
    assert set(np.round(np.unique(per_cell), 10)) <= {0.1, 0.3}


# -- BoundaryConditions (reference test_unit_boundaryConditions.py) ----------


def test_dirichlet_and_von_neumann_counts(fs2d):
    mesh = fs2d.mesh

    class Left:
        def inside(self, x, on_boundary):
            return on_boundary & (np.atleast_2d(x.T)[:, 0] < 1e-10)

    class All:
        def inside(self, x, on_boundary):
            return on_boundary

    sd = SubDomains(mesh)
    sd.setup_subdomains()
    sd.setup_boundaries(boundary_fct_dict={"left": Left(), "all": All()})
    bcs = BoundaryConditions(fs2d, sd)
    bcs.setup_dirichlet_boundary_conditions({
        "clamp_left": {"bc_value": np.zeros(2), "named_boundary": "left",
                       "subspace_id": 0},
        "conc_all": {"bc_value": 1.0, "named_boundary": "all",
                     "subspace_id": 1},
        "broken": {"named_boundary": "left"},  # missing bc_value -> skipped
    })
    assert len(bcs.dirichlet_bcs) == 2
    mask_u, vals_u = bcs.dirichlet_mask_and_values(0)
    assert int(np.asarray(mask_u).sum()) == 5 * 2  # left edge nodes x 2 comps
    mask_c, vals_c = bcs.dirichlet_mask_and_values(1)
    assert int(np.asarray(mask_c).sum()) == 16  # all boundary nodes
    assert np.allclose(np.asarray(vals_c)[np.asarray(mask_c)], 1.0)

    bcs.setup_von_neumann_boundary_conditions({
        "flux": {"bc_value": 2.0, "named_boundary": "left", "subspace_id": 1},
    })
    assert len(bcs.von_neumann_bcs) == 1
    r = np.asarray(bcs.von_neumann_residual(1))
    assert np.isclose(r.sum(), 2.0 * 1.0)  # ∫ q ds over left edge length 1


def test_time_dependent_dirichlet(fs2d):
    mesh = fs2d.mesh

    class All:
        def inside(self, x, on_boundary):
            return on_boundary

    sd = SubDomains(mesh)
    sd.setup_subdomains()
    sd.setup_boundaries(boundary_fct_dict={"all": All()})
    bcs = BoundaryConditions(fs2d, sd)
    bcs.setup_dirichlet_boundary_conditions({
        "ramp": {"bc_value": lambda x, t: t * x[:, 0], "named_boundary": "all",
                 "subspace_id": 1},
    })
    assert bcs.has_time_dependent_dirichlet
    _, v1 = bcs.dirichlet_mask_and_values(1, t=1.0)
    _, v2 = bcs.dirichlet_mask_and_values(1, t=2.0)
    nz = np.asarray(v1) != 0
    assert np.allclose(np.asarray(v2)[nz], 2 * np.asarray(v1)[nz])


# -- TimeSeries / Results (reference test_unit_results / timeSeries*) --------


def test_timeseries_and_results(fs2d, tmp_path):
    ts = TimeSeriesData("solution")
    f0 = {0: np.zeros((25, 2)), 1: np.ones(25)}
    ts.add_observation(f0, time=0.0, time_step=0, recording_step=0)
    ts.add_observation({0: np.ones((25, 2)), 1: 2 * np.ones(25)},
                       time=1.0, time_step=1, recording_step=1)
    # deep copy: mutating the source must not alter the record
    f0[1][:] = 99.0
    assert np.allclose(ts.get_solution_function(0, 1), 1.0)
    assert ts.get_recording_steps() == [0, 1]
    assert ts.get_most_recent_observation().time == 1.0
    # no replace by default
    ts.add_observation(f0, 5.0, 5, 1)
    assert ts.get_observation(1).time == 1.0

    multi = TimeSeriesMultiData()
    multi.register_time_series("solution")
    multi.add_observation("solution", {0: np.zeros((25, 2)), 1: np.ones(25)},
                          0.0, 0, 0)
    p = str(tmp_path / "ts.h5")
    multi.save_to_hdf5(p, mesh=fs2d.mesh)
    multi2 = TimeSeriesMultiData()
    multi2.load_from_hdf5(p)
    assert np.allclose(
        multi2.get_solution_function("solution", 0, 1), 1.0
    )
    assert TimeSeriesMultiData.read_mesh_hdf5(p).n_nodes == 25


def test_results_vtk_output(fs2d, tmp_path):
    res = Results(fs2d, output_dir=str(tmp_path))
    res.save_solution_start(method="vtk")
    res.add_to_results(0.0, 0, 0, {0: np.zeros((25, 2)), 1: np.ones(25)})
    res.save_solution(0, 0.0, method="vtk")
    res.save_solution_end(method="vtk")
    import os

    assert os.path.exists(tmp_path / "solution_000000.vtu")
    assert os.path.exists(tmp_path / "solution.pvd")


def test_reference_compat_module_paths():
    """Migration aliases: glimslib.simulation_helpers / glimslib.simulation
    map to glimslib_tpu equivalents."""
    from glimslib_tpu.simulation_helpers import (
        DiscontinuousScalar,
        math_linear_elasticity as mle,
        math_reaction_diffusion as mrd,
    )
    from glimslib_tpu.simulation.simulation_tumor_growth import TumorGrowth
    from glimslib_tpu.simulation.simulation_tumor_growth_brain_quad import (
        TumorGrowthBrain,
    )

    assert DiscontinuousScalar is TissueCoefficient
    assert float(mle.compute_mu(1.0, 0.25)) == pytest.approx(0.4)
    assert float(mrd.compute_growth_logistic(0.5, 2.0, 1.0)) == pytest.approx(0.5)
    assert TumorGrowth.__name__ == "TumorGrowth"
    assert TumorGrowthBrain.CONCENTRATION_DEGREE == 2
