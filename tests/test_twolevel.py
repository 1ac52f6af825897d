"""Two-level affine-coarse preconditioner (solvers/twolevel.py).

Replaces the role of PETSc AMG on the reference's unstructured elasticity
solves (simulation_base.py:101-103): checks the Galerkin coarse matrix
against an explicit dense P~^T A P~, the iteration cut on the brain
problem, and solution invariance of the preconditioned path.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glimslib_tpu.core.mesh import Mesh, box_mesh
from glimslib_tpu.ops.assembly import P1Kernels
from glimslib_tpu.ops.ell import EllPlan, apply_ell_vector, build_ell_elasticity
from glimslib_tpu.solvers.cg import pcg
from glimslib_tpu.solvers.twolevel import (
    AggPlan,
    build_coarse,
    coarse_inverse,
    make_twolevel_precond,
    n_affine_modes,
)


def _morton_box(n=5):
    m = box_mesh((0, 0, 0), (1, 1, 1), n, n, n)
    return Mesh.from_arrays(m.points, m.cells).reordered_morton()


def test_coarse_matrix_matches_dense():
    mesh = _morton_box(5)
    n, d = mesh.n_nodes, mesh.dim
    plan = EllPlan(mesh)
    kern = P1Kernels(mesh, dtype=jnp.float64)
    B = build_ell_elasticity(
        plan, (kern.grads_T, kern.vol), 1.0, 9.0, jnp.float64
    )
    adj_np = np.asarray(plan.adj)
    A = np.zeros((n * d, n * d))
    B_np = np.asarray(B)
    for i in range(n):
        for k in range(plan.K):
            j = adj_np[i, k]
            if j < n:
                A[i * d:(i + 1) * d, j * d:(j + 1) * d] += B_np[i, k]

    mask = np.zeros((n, d), bool)
    mask[mesh.boundary_nodes] = True
    f = 1.0 - mask.astype(float)

    ap = AggPlan(mesh, agg_size=16)
    q = n_affine_modes(d)
    assert ap.q == q == 12
    Mt = np.asarray(ap.mode_matrix(f))[: n]  # (n, d, q)
    P = np.zeros((n * d, ap.nagg * q))
    for i in range(n):
        g = i // ap.m
        P[i * d:(i + 1) * d, g * q:(g + 1) * q] = Mt[i]
    Ac_ref = P.T @ A @ P

    Ac = np.asarray(
        build_coarse(ap, jnp.asarray(plan.adj), B, jnp.asarray(mask), reg=0.0)
    )
    # strip the zero-diagonal +1 fix-ups before comparing
    fix = np.diagonal(Ac) - np.diagonal(Ac_ref)
    Ac_cmp = Ac - np.diag(np.where(fix > 0.5, fix, 0.0))
    err = np.abs(Ac_cmp - Ac_ref).max() / np.abs(Ac_ref).max()
    assert err < 1e-12


def test_twolevel_cuts_iterations_same_solution(monkeypatch):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    from __graft_entry__ import _brain_sim

    # node block-ELL path: this test builds the coarse space from the
    # node adjacency planes (_EllWel/_BinvG), not the supernode halo-ELL
    monkeypatch.setenv("GLIMS_BELL", "0")
    sim = _brain_sim(
        n=16, dims=3, dtype=jnp.float64,
        mesh_transform=lambda m: Mesh.from_arrays(m.points, m.cells)
        .reordered_morton(),
    )
    mesh = sim.mesh
    theta0 = sim.make_theta(sim.params.as_dict())
    aug = jax.jit(sim._augment_theta_with_operators)(theta0)
    plan = sim._ell_plan
    adj = jnp.asarray(plan.adj)
    B = aug["_EllWel"]
    Binv = aug["_BinvG"]
    mask_u, _, gu, _ = sim._bc_masks_and_values()
    kern = sim.kernels
    iv = sim.params.create_initial_value_function()
    u0 = jnp.asarray(iv[0], jnp.float64)
    c0 = jnp.asarray(iv[1], jnp.float64)
    t = jnp.asarray(1.0, jnp.float64)
    ru = jnp.where(mask_u, u0 - gu(t), sim.el_residual(u0, c0, aug, t))
    b = jnp.where(mask_u, 0.0, -ru)

    raw = lambda v: apply_ell_vector(adj, B, v)
    Au = lambda v: jnp.where(mask_u, v, raw(jnp.where(mask_u, 0.0, v)))
    bj = lambda r: kern.apply_block_jacobi(Binv, r)
    Mu1 = lambda r: jnp.where(mask_u, r, bj(jnp.where(mask_u, 0.0, r)))
    x1, info1 = pcg(Au, b, M=Mu1, rtol=1e-9, atol=0.0, maxiter=3000)

    ap = AggPlan(mesh, agg_size=64)
    Ac = build_coarse(ap, adj, B, mask_u)
    Cinv = coarse_inverse(Ac)
    f = 1.0 - np.asarray(mask_u).astype(np.float64)
    Mt = ap.mode_matrix(f).astype(Cinv.dtype)
    M2 = make_twolevel_precond(ap, Cinv, Mt, bj)
    Mu2 = lambda r: jnp.where(mask_u, r, M2(jnp.where(mask_u, 0.0, r)))
    x2, info2 = pcg(Au, b, M=Mu2, rtol=1e-9, atol=0.0, maxiter=3000)

    it1, it2 = int(info1["iters"]), int(info2["iters"])
    assert it2 < 0.8 * it1, (it1, it2)
    rel = float(jnp.max(jnp.abs(x1 - x2)) / jnp.max(jnp.abs(x1)))
    assert rel < 1e-6

    # bf16-stored coarse factor (the TPU default, models/base.py
    # runtime_aux): the Gram form stays PSD under rounding, so PCG must
    # still converge to the same solution at near-identical iteration
    # counts (a ~0.4% preconditioner perturbation costs ~no iterations)
    M3 = make_twolevel_precond(ap, Cinv.astype(jnp.bfloat16), Mt, bj)
    Mu3 = lambda r: jnp.where(mask_u, r, M3(jnp.where(mask_u, 0.0, r)))
    x3, info3 = pcg(Au, b, M=Mu3, rtol=1e-9, atol=0.0, maxiter=3000)
    it3 = int(info3["iters"])
    assert it3 < 1.25 * it2 + 5, (it2, it3)
    rel3 = float(jnp.max(jnp.abs(x1 - x3)) / jnp.max(jnp.abs(x1)))
    assert rel3 < 1e-6

    # spectrally truncated coarse factor (coarse_inverse k=...): keeping
    # the k smallest-eigenvalue directions perturbs the preconditioner by
    # <= 1/lambda_cut, so PCG still converges to the same solution with a
    # bounded iteration increase while the factor traffic drops ~3x
    k = Cinv.shape[1] // 3
    Ck = coarse_inverse(Ac, k=k)
    assert Ck.shape == (Cinv.shape[0], k)
    M4 = make_twolevel_precond(ap, Ck, Mt, bj)
    Mu4 = lambda r: jnp.where(mask_u, r, M4(jnp.where(mask_u, 0.0, r)))
    x4, info4 = pcg(Au, b, M=Mu4, rtol=1e-9, atol=0.0, maxiter=3000)
    it4 = int(info4["iters"])
    assert it4 < it1, (it1, it4)  # still beats plain block-Jacobi
    rel4 = float(jnp.max(jnp.abs(x1 - x4)) / jnp.max(jnp.abs(x1)))
    assert rel4 < 1e-6

    # node-axis-last transfers (the TPU layout) are the same linear maps
    rng = np.random.default_rng(4)
    r = jnp.asarray(rng.standard_normal((mesh.n_nodes, mesh.dim)))
    MtT = jnp.transpose(Mt, (1, 2, 0))
    assert np.allclose(np.asarray(ap.restrict_T(MtT, r)),
                       np.asarray(ap.restrict(Mt, r)), atol=1e-12)
    w = jnp.asarray(rng.standard_normal(ap.nagg * ap.q))
    assert np.allclose(np.asarray(ap.prolong_T(MtT, w)),
                       np.asarray(ap.prolong(Mt, w)), atol=1e-12)
    fm = 1.0 - np.asarray(mask_u)[:, 0].astype(np.float64)
    Ms = ap.mode_matrix_scalar(fm)
    rs = jnp.asarray(rng.standard_normal(mesh.n_nodes))
    assert np.allclose(np.asarray(ap.restrict_scalar_T(Ms.T, rs)),
                       np.asarray(ap.restrict_scalar(Ms, rs)), atol=1e-12)
    ws = jnp.asarray(rng.standard_normal(ap.nagg * (1 + mesh.dim)))
    assert np.allclose(np.asarray(ap.prolong_scalar_T(Ms.T, ws)),
                       np.asarray(ap.prolong_scalar(Ms, ws)), atol=1e-12)


def test_twolevel_sim_solution_invariant(monkeypatch):
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    from __graft_entry__ import _brain_sim

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("GLIMS_TWOLEVEL", flag)
        monkeypatch.setenv("GLIMS_TWOLEVEL_MIN_NODES", "100")
        sim = _brain_sim(
            n=10, dims=3, dtype=jnp.float64,
            mesh_transform=lambda m: Mesh.from_arrays(m.points, m.cells)
            .reordered_morton(),
        )
        theta0 = sim.make_theta(sim.params.as_dict())
        iv = sim.params.create_initial_value_function()
        u0 = jnp.asarray(iv[0], jnp.float64)
        c0 = jnp.asarray(iv[1], jnp.float64)
        simulate = jax.jit(sim.build_simulate_fn(3, 1.0))
        aux = sim.runtime_aux()
        assert ("_TLCfac" in aux) == (flag == "1")  # actually exercised
        traj = simulate(theta0, u0, c0, aux if aux else None)
        assert np.asarray(traj[2]).all()
        outs[flag] = (np.asarray(traj[0][-1]), np.asarray(traj[1][-1]))
    du = np.abs(outs["0"][0] - outs["1"][0]).max()
    dc = np.abs(outs["0"][1] - outs["1"][1]).max()
    assert du < 1e-8 and dc < 1e-8
