"""Assembled block-ELL operators (ops/ell.py) vs the matrix-free jvp — the
unstructured-mesh analogue of the offset-stencil planes must reproduce the
Jacobian actions exactly (same closed-form element integrals, different
storage)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glimslib_tpu.core.mesh import Mesh, box_mesh, rectangle_mesh
from glimslib_tpu.ops.assembly import P1Kernels
from glimslib_tpu.ops import ell


def _unstructured(mesh):
    return Mesh.from_arrays(mesh.points, mesh.cells).reordered_rcm()


@pytest.mark.parametrize(
    "mesh", [rectangle_mesh((0, 0), (2, 1), 6, 5),
             box_mesh((0, 0, 0), (1, 1, 2), 3, 3, 4)],
    ids=["tri", "tet"],
)
def test_ell_elasticity_matches_jvp(mesh):
    mesh = _unstructured(mesh)
    k = P1Kernels(mesh)
    plan = ell.EllPlan(mesh)
    rng = np.random.default_rng(0)
    mids = mesh.cell_midpoints
    mu = jnp.asarray(1.0 + mids[:, 0])
    lam = jnp.asarray(2.0 + mids[:, 1])
    B = ell.build_ell_elasticity(plan, (k.grads_T, k.vol), mu, lam, k.dtype)
    u = jnp.asarray(rng.standard_normal((mesh.n_nodes, mesh.dim)))
    c0 = jnp.zeros(mesh.n_nodes)

    got = np.asarray(ell.apply_ell_vector(jnp.asarray(plan.adj), B, u))
    resid = lambda uu: k.elasticity_residual(uu, c0, mu, lam, 0.0)
    want = np.asarray(jax.jvp(resid, (jnp.zeros_like(u),), (u,))[1])
    assert np.allclose(got, want, atol=1e-11), np.abs(got - want).max()


@pytest.mark.parametrize(
    "mesh", [rectangle_mesh((0, 0), (2, 1), 6, 5),
             box_mesh((0, 0, 0), (1, 1, 2), 3, 3, 4)],
    ids=["tri", "tet"],
)
def test_ell_rd_jacobian_matches_jvp(mesh):
    mesh = _unstructured(mesh)
    k = P1Kernels(mesh)
    plan = ell.EllPlan(mesh)
    rng = np.random.default_rng(1)
    mids = mesh.cell_midpoints
    D = jnp.asarray(0.1 + 0.05 * mids[:, 0])
    rho = jnp.asarray(0.2 + 0.1 * mids[:, 1])
    dt = 0.7
    c = jnp.asarray(rng.random(mesh.n_nodes))
    v = jnp.asarray(rng.standard_normal(mesh.n_nodes))

    W = ell.build_ell_rd_const(plan, (k.grads_T, k.vol), D, rho, dt,
                               k._m0, k.dtype)
    W = W + ell.build_ell_rd_wc(plan, (k.grads_T, k.vol), k.cells_flat, c,
                                rho, dt, k._t0, 1.0, k.dtype)
    got = np.asarray(ell.apply_ell_scalar(jnp.asarray(plan.adj), W, v))

    resid = lambda cc: k.rd_residual(cc, c, D, rho, dt)
    want = np.asarray(jax.jvp(resid, (c,), (v,))[1])
    assert np.allclose(got, want, atol=1e-11), np.abs(got - want).max()


def _brain_unstructured(n=6):
    from glimslib_tpu.models.tumor_growth_brain import TumorGrowthBrain

    m0 = box_mesh((0, 0, 0), (8, 8, 8), n, n, n)
    mesh = Mesh.from_arrays(m0.points, m0.cells).reordered_rcm()
    r = np.linalg.norm((mesh.points - 4.0) / 4.0, axis=1)
    labels = np.zeros(mesh.n_nodes)
    labels[r < 0.95] = 1
    labels[r < 0.8] = 2
    labels[r < 0.6] = 3
    labels[r < 0.2] = 4

    class Boundary:
        def inside(self, x, on_boundary):
            return on_boundary

    sim = TumorGrowthBrain(mesh)
    sim.setup_global_parameters(
        label_function=labels,
        domain_names={0: "outside", 1: "CSF", 2: "GM", 3: "WM",
                      4: "Ventricles"},
        boundaries={"boundary_all": Boundary()},
        dirichlet_bcs={"clamped": {"bc_value": np.zeros(3),
                                   "named_boundary": "boundary_all",
                                   "subspace_id": 0}},
    )
    center = np.array([4.5, 4.0, 4.0])
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(3),
                       1: lambda x: np.exp(-((x - center) ** 2).sum(axis=1))},
        E_GM=3e3, E_WM=3e3, E_CSF=1e3, E_VENT=1e3,
        nu_GM=0.45, nu_WM=0.45, nu_CSF=0.45, nu_VENT=0.3,
        D_GM=0.02, D_WM=0.1, rho_GM=0.02, rho_WM=0.1, coupling=0.15,
        sim_time=2, sim_time_step=1,
    )
    return sim


def test_ell_mode_matches_matrix_free_forward():
    """'auto' (block-ELL CG operators) and 'matrix-free' (jvp) produce the
    same trajectory on an unstructured brain config — the operator mode is
    an execution detail, never a semantics change."""
    sols = {}
    for mode in ("auto", "matrix-free"):
        sim = _brain_unstructured()
        sim.operator_mode = mode
        if mode == "auto":
            assert sim._ell_builders()[1] is not None
        theta = sim.make_theta(sim.params.as_dict())
        iv = sim.params.create_initial_value_function()
        simulate = jax.jit(sim.build_simulate_fn(2, 1.0))
        u_traj, c_traj, ok, _ = simulate(
            theta, jnp.asarray(iv[0]), jnp.asarray(iv[1]))
        assert bool(np.asarray(ok).all())
        sols[mode] = (np.asarray(u_traj[-1]), np.asarray(c_traj[-1]))
    rel_c = np.linalg.norm(sols["auto"][1] - sols["matrix-free"][1]) / \
        np.linalg.norm(sols["matrix-free"][1])
    rel_u = np.linalg.norm(sols["auto"][0] - sols["matrix-free"][0]) / \
        max(np.linalg.norm(sols["matrix-free"][0]), 1e-30)
    assert rel_c < 1e-9, rel_c
    assert rel_u < 1e-8, rel_u


def test_ell_adjoint_gradient_fd():
    """IFT adjoint gradients through the block-ELL operator path match
    central finite differences (the ELL operators appear in both the
    forward CG and the backward adjoint solves)."""
    from glimslib_tpu.optimize.adjoint import (
        InverseProblem, param_map_for_type, thresh,
    )

    sim = _brain_unstructured()
    assert sim._ell_builders()[1] is not None
    names, update = param_map_for_type(2)
    theta = sim.make_theta(sim.params.as_dict())
    iv = sim.params.create_initial_value_function()
    simulate = jax.jit(sim.build_simulate_fn(2, 1.0))
    u_traj, c_traj, ok, _ = simulate(
        theta, jnp.asarray(iv[0]), jnp.asarray(iv[1]))
    assert bool(np.asarray(ok).all())
    targets = {"conc_T2": np.asarray(thresh(c_traj[-1], 0.12)),
               "disp": np.asarray(u_traj[-1])}
    ip = InverseProblem(sim, names, targets, update_fn=update)
    v0 = np.array([0.05, 0.05])
    J0, g = ip.value_and_grad(v0)
    eps = 1e-6
    for i in range(2):
        vp = v0.copy(); vp[i] += eps
        vm = v0.copy(); vm[i] -= eps
        fd = (ip.objective(vp) - ip.objective(vm)) / (2 * eps)
        rel = abs(fd - g[i]) / max(abs(fd), 1e-12)
        assert rel < 1e-4, (i, fd, g[i], rel)
