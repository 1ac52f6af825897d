"""Factored frozen-geometry assembly (ops/bell_factored.py, VERDICT r4 #4).

The per-simulate dense placement gather collapses to a per-class channel
reduction when coefficients are class-wise constant.  Must be exact (up to
re-association round-off) against the dense assembly: planes, full
trajectories, and adjoint gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glimslib_tpu.core.mesh import Mesh, box_mesh
from glimslib_tpu.models.tumor_growth_brain import TumorGrowthBrain


class _Boundary:
    def inside(self, x, on_boundary):
        return on_boundary


def _sim(n=6):
    mesh = box_mesh((0, 0, 0), (10, 10, 10), n, n, n)
    mesh = Mesh.from_arrays(mesh.points, mesh.cells).reordered_morton()
    r = np.linalg.norm((mesh.points - 5.0) / 5.0, axis=1)
    labels = np.zeros(mesh.n_nodes)
    labels[r < 0.95] = 1
    labels[r < 0.80] = 2
    labels[r < 0.62] = 3
    labels[r < 0.20] = 4
    sim = TumorGrowthBrain(mesh)
    sim.setup_global_parameters(
        label_function=labels,
        domain_names={0: "outside", 1: "CSF", 2: "GM", 3: "WM",
                      4: "Ventricles"},
        boundaries={"boundary_all": _Boundary()},
        dirichlet_bcs={
            "clamped": {
                "bc_value": np.zeros(3),
                "named_boundary": "boundary_all",
                "subspace_id": 0,
            }
        },
    )
    center = np.full(3, 5.0)
    center[0] += 1.0
    sim.setup_model_parameters(
        iv_expression={
            0: np.zeros(3),
            1: lambda x: np.exp(-((x - center) ** 2).sum(axis=1) / 0.5),
        },
        E_GM=3e3, E_WM=3e3, E_CSF=1e3, E_VENT=1e3,
        nu_GM=0.45, nu_WM=0.45, nu_CSF=0.45, nu_VENT=0.3,
        D_GM=0.02, D_WM=0.1, rho_GM=0.02, rho_WM=0.1, coupling=0.15,
        sim_time=2, sim_time_step=1,
    )
    return sim


def _run(sim, n_steps=2):
    theta = sim.make_theta(sim.params.as_dict())
    iv = sim.params.create_initial_value_function()
    aux = sim.runtime_aux()
    f = jax.jit(sim.build_simulate_fn(n_steps, 1.0))
    args = (theta, jnp.asarray(iv[0], sim.dtype),
            jnp.asarray(iv[1], sim.dtype))
    return f(*args, aux) if aux else f(*args)


def test_factored_planes_match_dense(monkeypatch):
    """Reduced channel planes == dense assemble_fused planes to
    re-association round-off."""
    sim = _sim()
    assert sim.theta_class_labels() is not None
    aux = sim.runtime_aux()
    assert "_FWel" in aux and "_FCuc" in aux and "_FWrd" in aux
    theta = sim.make_theta(sim.params.as_dict())

    def augment(theta, aux):
        return sim._augment_theta_with_operators({**theta, **aux})

    out_fac = jax.jit(augment)(theta, aux)

    monkeypatch.setenv("GLIMS_FACTORED", "0")
    sim2 = _sim()
    aux2 = sim2.runtime_aux()
    assert "_FWel" not in aux2

    def augment2(theta, aux):
        return sim2._augment_theta_with_operators({**theta, **aux})

    out_dense = jax.jit(augment2)(theta, aux2)
    for key in ("_BellWel", "_BellCuc", "_BellWrdC", "_BellMrd"):
        a = np.asarray(out_dense[key])
        b = np.asarray(out_fac[key])
        scale = np.abs(a).max()
        assert np.abs(a - b).max() <= 1e-13 * scale, (
            key, np.abs(a - b).max(), scale
        )


def test_factored_trajectory_and_gradient_match_dense(monkeypatch):
    from glimslib_tpu.optimize.adjoint import (
        InverseProblem, param_map_for_type, thresh,
    )

    def run_with(factored):
        monkeypatch.setenv("GLIMS_FACTORED", "1" if factored else "0")
        sim = _sim()
        out = _run(sim)
        assert bool(np.asarray(out[2]).all())
        targets = {
            "conc_T2": np.asarray(thresh(out[1][-1], 0.12)),
            "disp": np.asarray(out[0][-1]),
        }
        names, update = param_map_for_type(2)
        ip = InverseProblem(sim, names, targets, update_fn=update,
                            n_steps=2, dt=1.0)
        J, g = ip.value_and_grad(np.array([0.05, 0.05]))
        return out, J, g

    out_f, J_f, g_f = run_with(True)
    out_d, J_d, g_d = run_with(False)
    for i in (0, 1):
        a = np.asarray(out_d[i])
        b = np.asarray(out_f[i])
        assert np.allclose(a, b, atol=1e-11), np.abs(a - b).max()
    np.testing.assert_allclose(J_f, J_d, rtol=1e-10)
    np.testing.assert_allclose(g_f, g_d, rtol=1e-7, atol=1e-14)


def test_class_labels_gate():
    """Raw per-cell coefficient arrays void the factored contract; scalar
    and per-tissue-dict parameters satisfy it."""
    from glimslib_tpu.models.tumor_growth import TumorGrowth

    m = box_mesh((0, 0, 0), (6, 6, 6), 4, 4, 4)
    mesh = Mesh.from_arrays(m.points, m.cells).reordered_morton()

    def build(diffusion):
        sim = TumorGrowth(mesh)
        sim.setup_global_parameters(
            boundaries={"boundary_all": _Boundary()},
            dirichlet_bcs={
                "clamped": {"bc_value": np.zeros(3),
                            "named_boundary": "boundary_all",
                            "subspace_id": 0}
            },
        )
        sim.setup_model_parameters(
            iv_expression={
                0: np.zeros(3),
                1: lambda x: np.exp(-((x - 3.0) ** 2).sum(axis=1)),
            },
            diffusion=diffusion, coupling=0.1, proliferation=0.1,
            E=100.0, poisson=0.4, sim_time=2, sim_time_step=1,
        )
        return sim

    assert build(0.1).theta_class_labels() is not None
    per_cell = np.full(mesh.n_cells, 0.1)
    assert build(per_cell).theta_class_labels() is None
