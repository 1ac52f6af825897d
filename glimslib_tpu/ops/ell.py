"""Assembled block-ELL operators for unstructured meshes.

The PETSc-CSR analogue for meshes without lattice structure (the
reference's CGAL brain meshes, test_case_simulation_tumor_growth_3D_atlas_
mpi.py:32-136): the theta-constant elasticity operator assembles once per
simulate into a node-adjacency ELL layout

    B (n, K, d, d)   with column ids  adj (n, K)

and every CG matvec becomes one width-d row-gather of ``x`` at ``adj``
plus a VPU contraction — ~3-4x fewer gathered rows than jvp-ing the
matrix-free residual (which gathers primal+tangent element tuples and
pull-scatters both), on the path where gathers are the measured
bottleneck (see ops/assembly.py ScatterPlan notes).

Assembly itself reuses the pull-gather machinery: per-element entry
matrices accumulate into the (n*K) ELL slots through a precomputed
ScatterPlan.  Like the offset-stencil planes (ops/stencil.py), the ELL
values are built inside ``_augment_theta_with_operators`` so gradients
w.r.t. mu/lam flow through the assembly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from glimslib_tpu.ops.assembly import ScatterPlan, make_scatter_plan, scatter


class EllPlan:
    """Host-precomputed node adjacency + entry->slot maps for one mesh."""

    def __init__(self, mesh):
        cells = np.asarray(mesh.cells, dtype=np.int64)
        nc, npe = cells.shape
        n = mesh.n_nodes
        self.n_nodes = n
        self.npe = npe

        # all (row, col) pairs, entry order (i, j, cell) — i-major to match
        # the value tensors produced by the builders
        rows = np.repeat(cells.T, npe, axis=0).reshape(npe, npe, nc)
        cols = np.tile(cells.T, (npe, 1)).reshape(npe, npe, nc)
        rflat = rows.ravel()
        cflat = cols.ravel()

        # adjacency: unique cols per row, padded with the sentinel n
        key = rflat * n + cflat
        uniq = np.unique(key)
        urow = uniq // n
        ucol = uniq % n
        starts = np.searchsorted(urow, np.arange(n))
        ends = np.searchsorted(urow, np.arange(n) + 1)
        K = int((ends - starts).max())
        self.K = K
        adj = np.full((n, K), n, dtype=np.int32)
        within = np.arange(len(uniq)) - starts[urow]
        adj[urow, within] = ucol
        self.adj = adj

        # entry -> flat ELL slot (row * K + slot)
        pos_in_uniq = np.searchsorted(uniq, key)
        slot = pos_in_uniq - starts[rflat]
        entry_slot = (rflat * K + slot).astype(np.int64)
        # accumulate duplicate (row, col) contributions via the shared
        # pull-gather machinery over n*K segments
        self.value_plan = make_scatter_plan(entry_slot, n * K)

    def assemble(self, entry_values):
        """(npe, npe, nc, ...) per-entry values -> ELL values (n, K, ...)."""
        tail = entry_values.shape[3:]
        flat = entry_values.reshape((-1,) + tail)
        vals = scatter(self.value_plan, flat)
        return vals.reshape((self.n_nodes, self.K) + tail)


def build_ell_elasticity(plan: EllPlan, mesh_arrays, mu, lam, dtype):
    """ELL values of the elasticity stiffness operator.

    ``mesh_arrays`` = (grads_T (npe, d, nc), vol (nc,)) in the kernels' SoA
    layout; entry formula as in tests/reference_fem.py elasticity_matrix:
    A[(i,a),(j,b)] = vol (mu (g_j[a] g_i[b] + delta_ab g_i.g_j)
                          + lam g_j[b] g_i[a]).
    Returns (n, K, d, d)."""
    g, vol = mesh_arrays  # (npe, d, nc), (nc,)
    d = g.shape[1]
    mu = jnp.asarray(mu, dtype)
    lam = jnp.asarray(lam, dtype)
    gg = jnp.sum(g[:, None, :, :] * g[None, :, :, :], axis=2)  # (i, j, nc)
    eye = jnp.eye(d, dtype=dtype)
    # explicit broadcast form (never einsum for small contractions —
    # CLAUDE.md); g indexed as g[node, component, cell]:
    # term1[i, j, a, b, c] = g[j, a, c] * g[i, b, c]
    term1 = g[None, :, :, None, :] * g[:, None, None, :, :]
    term2 = gg[:, :, None, None, :] * eye[None, None, :, :, None]
    # term3[i, j, a, b, c] = g[j, b, c] * g[i, a, c]
    term3 = g[None, :, None, :, :] * g[:, None, :, None, :]
    ent = vol * (mu * (term1 + term2) + lam * term3)  # (i, j, a, b, nc)
    ent = jnp.moveaxis(ent, -1, 2)  # (i, j, nc, a, b)
    return plan.assemble(ent)


def build_ell_rd_const(plan: EllPlan, mesh_arrays, D, rho, dt, m0, dtype):
    """ELL values of the constant part of the rd Jacobian,
    M + dt D K - dt rho M (exact closed forms: M_ij = vol m0 (1+delta_ij),
    K_ij = vol g_i.g_j).  Returns (n, K)."""
    g, vol = mesh_arrays
    npe = g.shape[0]
    D = jnp.asarray(D, dtype)
    rho = jnp.asarray(rho, dtype)
    gg = jnp.sum(g[:, None, :, :] * g[None, :, :, :], axis=2)  # (i, j, nc)
    eye = jnp.eye(npe, dtype=dtype)[:, :, None]
    M = m0 * (1.0 + eye) * vol
    ent = M + (dt * D) * (vol * gg) - (dt * rho) * M
    return plan.assemble(ent)


def build_ell_rd_wc(plan: EllPlan, mesh_arrays, cells_T, c, rho, dt, t0,
                    conc_max, dtype):
    """ELL values of the logistic-term Jacobian correction
    +2 dt rho W(c)/c_max with W(c)_ij = vol t0 (S + c_i + c_j
    + delta_ij (S + 2 c_i)), S = sum_k c_k (ops/stencil.py entry formulas).
    Returns (n, K)."""
    g, vol = mesh_arrays
    npe = g.shape[0]
    rho = jnp.asarray(rho, dtype)
    ce = jnp.take(jnp.stack([c, c], axis=-1), cells_T.ravel(), axis=0)[
        :, 0
    ].reshape(npe, -1)  # row-packed gather, (npe, nc)
    S = jnp.sum(ce, axis=0)  # (nc,)
    eye = jnp.eye(npe, dtype=dtype)[:, :, None]
    W = (vol * t0) * (
        S + ce[:, None, :] + ce[None, :, :] + eye * (S + 2.0 * ce[:, None, :])
    )
    ent = (2.0 * dt / conc_max) * rho * W
    return plan.assemble(ent)


def apply_ell_vector(adj, B, x):
    """y[i, a] = sum_k sum_b B[i, k, a, b] x[adj[i, k], b].

    ``x`` (n, d); padded adjacency points at the sentinel row n -> zeros."""
    n, d = x.shape
    K = adj.shape[1]
    xp = jnp.pad(x, ((0, 1), (0, 0)))
    xg = jnp.take(xp, adj.ravel(), axis=0).reshape(n, K, d)  # width-d rows
    return jnp.sum(B * xg[:, :, None, :], axis=(1, 3))


def apply_ell_scalar(adj, W, x):
    """y[i] = sum_k W[i, k] x[adj[i, k]]  (width-2 duplicated row-gather)."""
    n = x.shape[0]
    K = adj.shape[1]
    xp = jnp.pad(jnp.stack([x, x], axis=-1), ((0, 1), (0, 0)))
    xg = jnp.take(xp, adj.ravel(), axis=0)[:, 0].reshape(n, K)
    return jnp.sum(W * xg, axis=1)
