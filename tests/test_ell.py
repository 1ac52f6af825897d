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
