"""Supernode halo-ELL operators (ops/bell.py) vs the matrix-free jvp and
the node block-ELL path — the deduplicated-halo storage must reproduce the
Jacobian actions exactly, and the supernode block-Jacobi must invert the
true per-supernode self-blocks (identity on masked/padded dofs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glimslib_tpu.core.mesh import Mesh, box_mesh, rectangle_mesh
from glimslib_tpu.ops.assembly import P1Kernels
from glimslib_tpu.ops import bell


def _morton(mesh):
    return Mesh.from_arrays(mesh.points, mesh.cells).reordered_morton()


@pytest.mark.parametrize(
    "mesh,s", [(rectangle_mesh((0, 0), (2, 1), 6, 5), 8),
               (box_mesh((0, 0, 0), (1, 1, 2), 3, 3, 4), 16)],
    ids=["tri", "tet"],
)
def test_bell_elasticity_matches_jvp(mesh, s):
    mesh = _morton(mesh)
    k = P1Kernels(mesh)
    plan = bell.BellPlan(mesh, s=s)
    rng = np.random.default_rng(0)
    mids = mesh.cell_midpoints
    mu = jnp.asarray(1.0 + mids[:, 0])
    lam = jnp.asarray(2.0 + mids[:, 1])
    W = bell.build_bell_elasticity(plan, (k.grads_T, k.vol), mu, lam, k.dtype)
    u = jnp.asarray(rng.standard_normal((mesh.n_nodes, mesh.dim)))
    c0 = jnp.zeros(mesh.n_nodes)

    got = np.asarray(
        bell.apply_bell_vector(plan, jnp.asarray(plan.halo_ids), W, u)
    )
    resid = lambda uu: k.elasticity_residual(uu, c0, mu, lam, 0.0)
    want = np.asarray(jax.jvp(resid, (jnp.zeros_like(u),), (u,))[1])
    assert np.allclose(got, want, atol=1e-11), np.abs(got - want).max()


@pytest.mark.parametrize(
    "mesh,s", [(rectangle_mesh((0, 0), (2, 1), 6, 5), 8),
               (box_mesh((0, 0, 0), (1, 1, 2), 3, 3, 4), 16)],
    ids=["tri", "tet"],
)
def test_bell_rd_jacobian_matches_jvp(mesh, s):
    mesh = _morton(mesh)
    k = P1Kernels(mesh)
    plan = bell.BellPlan(mesh, s=s)
    rng = np.random.default_rng(1)
    mids = mesh.cell_midpoints
    D = jnp.asarray(0.1 + 0.05 * mids[:, 0])
    rho = jnp.asarray(0.2 + 0.1 * mids[:, 1])
    dt = 0.7
    c = jnp.asarray(rng.random(mesh.n_nodes))
    v = jnp.asarray(rng.standard_normal(mesh.n_nodes))

    W = bell.build_bell_rd_const(plan, (k.grads_T, k.vol), D, rho, dt,
                                 k._m0, k.dtype)
    W = W + bell.build_bell_rd_wc(plan, (k.grads_T, k.vol), k.cells_flat, c,
                                  rho, dt, k._t0, 1.0, k.dtype)
    got = np.asarray(
        bell.apply_bell_scalar(plan, jnp.asarray(plan.halo_ids), W, v)
    )
    resid = lambda cc: k.rd_residual(cc, c, D, rho, dt)
    want = np.asarray(jax.jvp(resid, (c,), (v,))[1])
    assert np.allclose(got, want, atol=1e-11), np.abs(got - want).max()


def test_supernode_jacobi_inverts_self_blocks():
    """apply_supernode_jacobi(Binv, r) solves the per-supernode self-block
    system: dense-reconstruct block 0 and compare; masked dofs identity."""
    mesh = _morton(box_mesh((0, 0, 0), (1, 1, 2), 3, 3, 4))
    n, d = mesh.n_nodes, mesh.dim
    k = P1Kernels(mesh)
    s = 16
    plan = bell.BellPlan(mesh, s=s)
    W = bell.build_bell_elasticity(plan, (k.grads_T, k.vol), 1.0, 9.0,
                                   k.dtype)
    mask = np.zeros((n, d), bool)
    mask[mesh.boundary_nodes] = True
    B = bell.extract_self_blocks_vector(plan, W)

    # dense reconstruction of supernode 0's self-block from halo storage
    halos = plan.halo_ids[0]
    Wnp = np.asarray(W)  # (nb, s, d, Kh, d)
    m = s * d
    B0 = np.zeros((m, m))
    for i in range(min(s, n)):
        for kh, j in enumerate(halos):
            if 0 <= j < s:  # own nodes of block 0 are ids [0, s)
                B0[i * d:(i + 1) * d, j * d:(j + 1) * d] = Wnp[0, i, :, kh, :]
    assert np.allclose(np.asarray(B)[0], B0, atol=1e-12)

    Binv = bell.supernode_jacobi_inverse(plan, B, mask=jnp.asarray(mask))
    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.standard_normal((n, d)))
    z = np.asarray(bell.apply_supernode_jacobi(plan, Binv, r))
    # per-block check against a dense masked solve
    fm = mask.reshape(-1)[: m]
    Bm = B0 * np.outer(1 - fm, 1 - fm) + np.diag(fm.astype(float))
    want0 = np.linalg.solve(Bm, np.asarray(r).reshape(-1)[:m])
    assert np.allclose(z.reshape(-1)[:m], want0, atol=1e-9)
    # masked dofs pass through unchanged
    rm = np.asarray(r).reshape(-1)[:m][fm]
    assert np.allclose(z.reshape(-1)[:m][fm], rm, atol=1e-12)
