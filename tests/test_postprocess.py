"""PostProcess derived-field tests against analytic states
(reference PostProcess*, helper_classes.py:1521-1940)."""

import os

import numpy as np
import pytest

from glimslib_tpu.core.functionspace import FunctionSpace
from glimslib_tpu.core.mesh import rectangle_mesh
from glimslib_tpu.core.results import Results
from glimslib_tpu.postprocess import PostProcess, PostProcessTumorGrowth


@pytest.fixture()
def loaded_results(tmp_path):
    """Results with one recorded step: uniform-strain displacement
    u = (a x, b y) and linear concentration."""
    mesh = rectangle_mesh((0, 0), (2, 2), 6, 6)
    fs = FunctionSpace(mesh)
    fs.init_function_space([(1, 1), (0, 1)],
                           {0: "displacement", 1: "concentration"})
    res = Results(fs, output_dir=str(tmp_path))
    a, b = 0.02, -0.01
    u = np.stack([a * mesh.points[:, 0], b * mesh.points[:, 1]], axis=1)
    c = 0.25 * mesh.points[:, 0]
    res.add_to_results(1.0, 1, 1, {0: u, 1: c})
    return mesh, res, (a, b)


def test_uniform_strain_stress_pressure_vonmises(loaded_results):
    mesh, res, (a, b) = loaded_results
    pp = PostProcess(res)
    eps = pp.get_strain_tensor(1)
    assert np.allclose(eps[:, 0, 0], a, atol=1e-12)
    assert np.allclose(eps[:, 1, 1], b, atol=1e-12)
    assert np.allclose(eps[:, 0, 1], 0.0, atol=1e-12)

    mu, lam = 1.0, 2.0
    sig = pp.get_stress_tensor(1, mu, lam)
    s_xx = 2 * mu * a + lam * (a + b)
    s_yy = 2 * mu * b + lam * (a + b)
    assert np.allclose(sig[:, 0, 0], s_xx, atol=1e-12)
    assert np.allclose(sig[:, 1, 1], s_yy, atol=1e-12)

    p = pp.get_pressure(1, mu, lam)
    assert np.allclose(p, (s_xx + s_yy) / 3.0, atol=1e-12)

    vm = pp.get_van_mises_stress(1, mu, lam)
    # reference semantics (math_linear_elasticity.py:35-40): deviatoric part
    # of the dim x dim tensor with tr/3 — in 2D the zz term is omitted
    dev_xx = s_xx - (s_xx + s_yy) / 3
    dev_yy = s_yy - (s_xx + s_yy) / 3
    want = np.sqrt(1.5 * (dev_xx**2 + dev_yy**2))
    assert np.allclose(vm, want, atol=1e-12)

    J = pp.get_total_jacobian(1)
    assert np.allclose(J, (1 + a) * (1 + b), atol=1e-12)


def test_traction_force_balance(loaded_results):
    """Uniform stress: ∮ σ·n ds = 0 over a closed boundary."""
    mesh, res, _ = loaded_results
    pp = PostProcess(res)
    F = pp.get_traction_force(1, 1.0, 2.0)
    assert np.allclose(F, 0.0, atol=1e-12)


def test_deformed_mesh_roundtrip(loaded_results):
    mesh, res, (a, b) = loaded_results
    pp = PostProcess(res)
    m2 = pp.deformed_mesh(1)
    assert np.isclose(m2.points[:, 0].max(), 2 * (1 + a))
    m3 = m2.moved(-np.asarray(res.get_result(1)[0]))
    assert np.allclose(m3.points, mesh.points, atol=1e-12)


def test_update_mesh_displacement_reverse_roundtrip(loaded_results):
    """Stateful ALE warp + reverse restores the original coordinates
    (reference update_mesh_displacement, helper_classes.py:1712-1730)."""
    mesh, res, (a, b) = loaded_results
    pp = PostProcess(res)
    orig = np.array(pp.mesh.points, copy=True)
    m2 = pp.update_mesh_displacement(1)
    assert m2 is pp.mesh
    assert np.isclose(m2.points[:, 0].max(), 2 * (1 + a))
    m3 = pp.update_mesh_displacement(1, reverse=True)
    assert np.allclose(m3.points, orig, atol=0.0)
    # reverse without a forward warp: warn-and-noop
    m4 = pp.update_mesh_displacement(1, reverse=True)
    assert np.allclose(m4.points, orig, atol=0.0)


def test_cell_to_node_projection_constant(loaded_results):
    mesh, res, _ = loaded_results
    pp = PostProcess(res)
    nodal = pp.cell_to_node(np.full(mesh.n_cells, 3.0))
    assert np.allclose(nodal, 3.0, atol=1e-12)


class _P:
    """Minimal params stand-in for PostProcessTumorGrowth."""

    E = 1.0
    poisson = 0.25
    proliferation = 0.1
    coupling = 0.5


def test_model_postprocess_and_outputs(loaded_results, tmp_path):
    mesh, res, _ = loaded_results
    pp = PostProcessTumorGrowth(res, _P(), output_dir=str(tmp_path))
    assert pp.get_growth_logistic(1).shape == (mesh.n_nodes,)
    gj = pp.get_growth_induced_jacobian(1)
    assert gj.shape == (mesh.n_cells,)
    assert (gj >= 1.0 - 1e-12).all()  # positive concentration -> growth
    cd = pp.get_concentration_deformed(1)
    assert np.isfinite(cd).all()

    out = pp.save_all(output_dir=str(tmp_path / "vtk"))
    assert os.path.exists(os.path.join(out, "postprocess.pvd"))
    plots = pp.plot_all(output_dir=str(tmp_path / "plots"))
    assert any(f.endswith(".png") for f in os.listdir(plots))
    pub = pp.plot_for_pub(output_dir=str(tmp_path / "pub"))
    assert any(f.endswith(".png") for f in os.listdir(pub))


def test_show_img_seg_f(tmp_path):
    """Overlay engine smoke (reference show_img_seg_f, plotting.py:340-389)."""
    from glimslib_tpu.utils.synthetic import brain_labelmap_2d, t1_from_labels
    from glimslib_tpu.visualisation.plotting import show_img_seg_f

    lab = brain_labelmap_2d(24, 24)
    img = t1_from_labels(lab)
    mesh = rectangle_mesh((0, 0), (23, 23), 23, 23)
    f = np.exp(-((mesh.points - 12) ** 2).sum(axis=1) / 20)
    path = show_img_seg_f(image=img, segmentation=lab, function=f, mesh=mesh,
                          path=str(tmp_path / "overlay.png"), title="overlay")
    assert os.path.exists(path)
