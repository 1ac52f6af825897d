"""Extrapolated warm starts never change converged states — only
iteration counts (anchored tolerances, solvers/coupled.py make_step).

Covers the linear (default) and quadratic (GLIMS_WARM_ORDER=3) guesses
against a cold-start run on the same problem.  Reference parity: the
reference re-solves each step from the previous state with fixed PETSc
tolerances (simulation_base.py:277-312), so converged trajectories are
warm-start-invariant there too by construction.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from glimslib_tpu.core.mesh import rectangle_mesh, Mesh
from glimslib_tpu.models.tumor_growth import TumorGrowth
from glimslib_tpu.solvers.coupled import StepConfig


class _All:
    def inside(self, x, on_boundary):
        return on_boundary


def _run(monkeypatch, order, unstructured):
    import jax

    if order is None:
        monkeypatch.setenv("GLIMS_TWOLEVEL", "0")
    else:
        monkeypatch.setenv("GLIMS_WARM_ORDER", str(order))
        monkeypatch.setenv("GLIMS_TWOLEVEL", "0")
    mesh = rectangle_mesh((-5, -5), (5, 5), 14, 14)
    if unstructured:
        # strip lattice metadata -> unstructured assembled (ELL/bell) path
        mesh = Mesh.from_arrays(mesh.points, mesh.cells)
    sim = TumorGrowth(mesh)
    sim.setup_global_parameters(
        boundaries={"all": _All()},
        dirichlet_bcs={
            "clamped": {
                "bc_value": np.zeros(2),
                "named_boundary": "all",
                "subspace_id": 0,
            }
        },
    )
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(2),
                       1: lambda x: np.exp(-(x ** 2).sum(axis=1))},
        diffusion=0.1, coupling=0.15, proliferation=0.12, E=0.001,
        poisson=0.45, sim_time=4, sim_time_step=1,
    )
    theta = sim.make_theta(sim.params.as_dict())
    iv = sim.params.create_initial_value_function()
    dtype = sim.dtype
    simulate = jax.jit(sim.build_simulate_fn(4, 1.0))
    aux = sim.runtime_aux()
    args = (theta, jnp.asarray(iv[0], dtype), jnp.asarray(iv[1], dtype))
    if aux:
        args = args + (aux,)
    u_traj, c_traj, ok, _ = simulate(*args)
    assert bool(np.asarray(ok).all())
    if order is not None:
        assert sim._warm_start_ok, "warm-start path not active"
    return np.asarray(u_traj[-1]), np.asarray(c_traj[-1])


@pytest.mark.parametrize("unstructured", [False, True])
def test_warm_orders_match_cold(monkeypatch, unstructured):
    u2, c2 = _run(monkeypatch, 2, unstructured)
    u3, c3 = _run(monkeypatch, 3, unstructured)
    # cold start: disable extrapolation by forcing the non-warm path
    uc, cc = _run_cold(monkeypatch, unstructured)
    tol = 5e-9
    assert np.abs(u3 - u2).max() < tol
    assert np.abs(c3 - c2).max() < tol
    assert np.abs(u2 - uc).max() < tol
    assert np.abs(c2 - cc).max() < tol


def _run_cold(monkeypatch, unstructured):
    from glimslib_tpu.models import base as base_mod

    orig = base_mod.Simulation._build_step

    def no_warm(self):
        step = orig(self)
        self._warm_start_ok = False
        return step

    monkeypatch.setattr(base_mod.Simulation, "_build_step", no_warm)
    return _run(monkeypatch, None, unstructured)


@pytest.mark.parametrize("unstructured", [True])
def test_algebraic_anchor_matches_exact(monkeypatch, unstructured):
    """The algebraic rd anchor (||M dc|| carried across steps,
    solvers/coupled.py anchor_c; saves a full residual evaluation per
    step) must reproduce the exact-anchor trajectory: the anchor only
    scales an order-of-magnitude tolerance, and the algebra
    R(c,c) = r_final - M dc is exact up to ||r_final|| <= ftol_prev."""
    monkeypatch.setenv("GLIMS_ALG_ANCHOR", "1")
    ua, ca = _run(monkeypatch, 2, unstructured)
    monkeypatch.setenv("GLIMS_ALG_ANCHOR", "0")
    ue, ce = _run(monkeypatch, 2, unstructured)
    assert np.abs(ua - ue).max() < 5e-12
    assert np.abs(ca - ce).max() < 5e-12
