"""Adjoint gradient correctness + inverse-problem parameter recovery.

Covers the reference's adjoint tier (dolfin-adjoint usage in
test_case_simulation_tumor_growth_2D_uniform_adjoint.py:78-104 and the
production path image_based_optimization.py:660-767): gradients of the
misfit functional w.r.t. model parameters through the full time loop, and
L-BFGS-B recovery of known parameters from synthetic targets."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glimslib_tpu.core.mesh import rectangle_mesh
from glimslib_tpu.models.tumor_growth import TumorGrowth
from glimslib_tpu.optimize.adjoint import (
    InverseProblem,
    param_map_for_type,
    thresh,
    tumor_growth_param_map,
)


class Boundary:
    def inside(self, x, on_boundary):
        return on_boundary


def gaussian(coords):
    return np.exp(-0.5 * (coords**2).sum(axis=1))


@pytest.fixture(scope="module")
def small_sim():
    mesh = rectangle_mesh((-3, -3), (3, 3), 6, 6)
    sim = TumorGrowth(mesh)
    sim.setup_global_parameters(
        boundaries={"boundary_all": Boundary()},
        dirichlet_bcs={
            "clamped": {"bc_value": np.zeros(2), "named_boundary": "boundary_all",
                        "subspace_id": 0}
        },
        von_neumann_bcs={},
    )
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(2), 1: gaussian},
        diffusion=0.1, coupling=0.1, proliferation=0.1, E=0.001, poisson=0.45,
        sim_time=2, sim_time_step=1,
    )
    return sim


def _make_targets(sim, v_true, names, update):
    """Forward-run with known parameters to synthesize targets."""
    p = dict(sim.params.as_dict())
    p.update(update(v_true))
    theta = sim.make_theta(p)
    iv = sim.params.create_initial_value_function()
    u0 = jnp.asarray(iv[0])
    c0 = jnp.asarray(iv[1])
    simulate = sim.build_simulate_fn(2, 1.0)
    u_traj, c_traj, ok, _ = jax.jit(simulate)(theta, u0, c0)
    assert bool(np.asarray(ok).all())
    c_T = c_traj[-1]
    return {
        "conc_T2": np.asarray(thresh(c_T, 0.12)),
        "conc_T1": np.asarray(thresh(c_T, 0.80)),
        "disp": np.asarray(u_traj[-1]),
    }


def test_gradient_matches_finite_differences(small_sim):
    sim = small_sim
    names, update = tumor_growth_param_map(3)
    v_true = np.array([0.15, 0.12, 0.2])
    targets = _make_targets(sim, v_true, names, update)
    ip = InverseProblem(sim, names, targets, update_fn=update)

    v0 = np.array([0.1, 0.1, 0.1])
    J0, g = ip.value_and_grad(v0)
    assert J0 > 0
    eps = 1e-6
    for i in range(3):
        vp = v0.copy(); vp[i] += eps
        vm = v0.copy(); vm[i] -= eps
        fd = (ip.objective(vp) - ip.objective(vm)) / (2 * eps)
        rel = abs(fd - g[i]) / max(abs(fd), 1e-12)
        assert rel < 1e-5, (i, fd, g[i], rel)


def test_objective_zero_at_truth(small_sim):
    sim = small_sim
    names, update = tumor_growth_param_map(2)
    v_true = np.array([0.12, 0.08])
    targets = _make_targets(sim, v_true, names, update)
    ip = InverseProblem(sim, names, targets, update_fn=update)
    J_true = ip.objective(v_true)
    J_off = ip.objective(np.array([0.3, 0.3]))
    assert J_true < 1e-16
    assert J_off > 1e3 * max(J_true, 1e-30)


def test_lbfgsb_recovers_parameters(small_sim):
    """Inverse-problem slice: recover (diffusion, proliferation) from
    synthetic targets — the reference's atlas workflow in miniature
    (ImageBasedOptimizationAtlas parameter relative-error report,
    image_based_optimization_atlas.py:130-137)."""
    sim = small_sim
    names, update = tumor_growth_param_map(2)
    v_true = np.array([0.12, 0.08])
    targets = _make_targets(sim, v_true, names, update)
    ip = InverseProblem(sim, names, targets, update_fn=update)
    x_opt, progress, res = ip.minimize(
        x0=np.array([0.05, 0.2]),
        bounds=[(0.005, 0.5)] * 2,
        opt_params={"tol": 1e-12, "gtol": 1e-10},
    )
    assert np.allclose(x_opt, v_true, rtol=1e-3), (x_opt, v_true)
    assert progress.number_iterations >= 2
    df = progress.to_dataframe()
    assert "dJddiffusion" in df.columns


def test_pluggable_optimizer(small_sim):
    """The optimizer is pluggable like the reference's minimize_custom /
    custom_optimizer hook (image_based_optimization.py:646-658): a scipy
    method name or a user-supplied algorithm callable."""
    sim = small_sim
    names, update = tumor_growth_param_map(2)
    v_true = np.array([0.12, 0.08])
    targets = _make_targets(sim, v_true, names, update)
    ip = InverseProblem(sim, names, targets, update_fn=update)

    # (a) scipy method by name
    x_opt, progress, res = ip.minimize(
        x0=np.array([0.05, 0.2]), bounds=[(0.005, 0.5)] * 2,
        opt_params={"tol": 1e-12, "gtol": 1e-10, "method": "TNC"},
    )
    assert np.allclose(x_opt, v_true, rtol=1e-2), (x_opt, v_true)

    # (b) user-supplied custom_optimizer-style callable
    calls = {"n": 0}

    def custom_optimizer(J, m_global, dJ, H, bounds, **kwargs):
        from scipy.optimize import minimize as scipy_minimize

        calls["n"] += 1
        return np.array(scipy_minimize(
            J, m_global, jac=dJ, method="L-BFGS-B", bounds=bounds,
            tol=kwargs.get("tol", 1e-12),
        )["x"])

    x_opt2, progress2, res2 = ip.minimize(
        x0=np.array([0.05, 0.2]), bounds=[(0.005, 0.5)] * 2,
        opt_params={"tol": 1e-12, "algorithm": custom_optimizer},
    )
    assert calls["n"] == 1
    assert np.allclose(x_opt2, v_true, rtol=1e-3), (x_opt2, v_true)
    # progress frames recorded through the memoized oracle
    assert progress2.number_iterations >= 2
    assert float(res2.fun) < 1e-12


def test_noise_robust_inversion_with_regularization(small_sim):
    """Noisy targets + Tikhonov term (reference
    test_case_..._2D_uniform_adjoint_noise.py): parameters still recovered
    to a few percent."""
    sim = small_sim
    names, update = tumor_growth_param_map(2)
    v_true = np.array([0.12, 0.08])
    targets = _make_targets(sim, v_true, names, update)
    rng = np.random.default_rng(1)
    targets = {
        k: np.asarray(v) + 0.02 * rng.standard_normal(np.shape(v))
        for k, v in targets.items()
    }
    ip = InverseProblem(sim, names, targets, update_fn=update,
                        reg_alpha=1e-5)
    x_opt, progress, res = ip.minimize(
        x0=np.array([0.05, 0.2]), bounds=[(0.005, 0.5)] * 2,
        opt_params={"tol": 1e-12, "gtol": 1e-10},
    )
    assert np.allclose(x_opt, v_true, rtol=0.15), (x_opt, v_true)


def test_param_maps_match_reference_tying():
    """Tied-parameter heuristics (brain_quad.py:151-210)."""
    names, update = param_map_for_type(2)
    upd = update(np.array([0.1, 0.2]))
    assert upd["D_GM"] == pytest.approx(0.02)  # 0.2 * D_WM
    assert upd["rho_GM"] == upd["rho_WM"] == pytest.approx(0.2)
    names5, _ = param_map_for_type(5)
    assert names5 == ["D_WM", "D_GM", "rho_WM", "rho_GM", "coupling"]
