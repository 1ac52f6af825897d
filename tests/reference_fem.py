"""Independent scipy-based FEM reference implementation for parity testing.

This is the rebuild's stand-in for the FEniCS reference solution fields
(reference parity harness: ``Comparison``, helper_classes.py:1975-2036; test
strategy SURVEY.md §4): a classic sparse-matrix FEM discretization of the
same weak forms (simulation_tumor_growth.py:110-122), written deliberately
with *different* machinery than the JAX production path:

- hard-coded classic quadrature rules (4-pt degree-3 tri, 5-pt degree-3 tet)
  instead of closed-form barycentric integrals,
- scipy sparse COO assembly + UMFPACK/SuperLU direct solves instead of
  matrix-free Newton-CG.

Agreement between both paths on the same mesh validates each against the
other to discretization-exactness (~1e-10 in float64).  It also serves as
the *CPU baseline* implementation for bench.py speedups (a faithful
stand-in for the reference's assemble+direct-solve execution model).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

# Classic quadrature rules (points in barycentric-independent coords xi).
# Degree-3 rule on the triangle (4 points, one negative weight):
TRI_QP = np.array(
    [
        [1 / 3, 1 / 3],
        [0.6, 0.2],
        [0.2, 0.6],
        [0.2, 0.2],
    ]
)
# weights sum to the reference-triangle area 1/2
TRI_QW = np.array([-27 / 48, 25 / 48, 25 / 48, 25 / 48]) * 0.5

# Degree-3 rule on the tetrahedron (5 points):
TET_QP = np.array(
    [
        [0.25, 0.25, 0.25],
        [0.5, 1 / 6, 1 / 6],
        [1 / 6, 0.5, 1 / 6],
        [1 / 6, 1 / 6, 0.5],
        [1 / 6, 1 / 6, 1 / 6],
    ]
)
TET_QW = np.array([-4 / 5, 9 / 20, 9 / 20, 9 / 20, 9 / 20]) / 6.0


def _rule(dim):
    if dim == 2:
        return TRI_QP, TRI_QW
    if dim == 3:
        return TET_QP, TET_QW
    raise ValueError(dim)


def _p1_vals(dim, qp):
    lam0 = 1 - qp.sum(axis=1)
    return np.concatenate([lam0[:, None], qp], axis=1)  # (nq, d+1)


class ReferenceFEM:
    """Sparse-matrix FEM for the coupled tumor-growth system on a Mesh."""

    def __init__(self, mesh):
        self.mesh = mesh
        self.dim = mesh.dim
        self.npe = mesh.dim + 1
        self.qp, self.qw = _rule(mesh.dim)
        self.vals = _p1_vals(mesh.dim, self.qp)  # (nq, npe)
        # physical quadrature factor: integrals on unit simplex scale by
        # |detJ| = vol * d!
        import math

        self.detJ = mesh.cell_volumes * math.factorial(mesh.dim)
        self.grads = mesh.cell_grads  # (nc, npe, d) constant per cell
        self.vols = mesh.cell_volumes

    # -- scalar matrices ----------------------------------------------------

    def _coo(self, local, shape=None):
        """Assemble (nc, npe, npe) local matrices into CSR."""
        m = self.mesh
        rows = np.repeat(m.cells, self.npe, axis=1).ravel()
        cols = np.tile(m.cells, (1, self.npe)).ravel()
        A = sp.coo_matrix(
            (local.ravel(), (rows, cols)),
            shape=shape or (m.n_nodes, m.n_nodes),
        )
        return A.tocsr()

    def mass_matrix(self):
        nq = len(self.qw)
        local = np.einsum(
            "q,qi,qj->ij", self.qw, self.vals, self.vals
        )  # unit-simplex
        loc = self.detJ[:, None, None] * local[None]
        return self._coo(loc)

    def stiffness_matrix(self, D_cell=1.0):
        D = np.broadcast_to(np.asarray(D_cell, float), (self.mesh.n_cells,))
        loc = (D * self.vols)[:, None, None] * np.einsum(
            "cid,cjd->cij", self.grads, self.grads
        )
        return self._coo(loc)

    def weighted_mass_matrix(self, c):
        """W_ij = ∫ c λ_i λ_j dx with P1 nodal c (by quadrature)."""
        ce = c[self.mesh.cells]  # (nc, npe)
        cq = ce @ self.vals.T  # (nc, nq)
        loc = np.einsum(
            "c,cq,q,qi,qj->cij", self.detJ, cq, self.qw, self.vals, self.vals
        )
        return self._coo(loc)

    def quadratic_load(self, c):
        """N_i = ∫ c² λ_i dx (quadrature, degree-3 exact for P1 c)."""
        ce = c[self.mesh.cells]
        cq = ce @ self.vals.T
        loc = np.einsum("c,cq,q,qi->ci", self.detJ, cq**2, self.qw, self.vals)
        out = np.zeros(self.mesh.n_nodes)
        np.add.at(out, self.mesh.cells.ravel(), loc.ravel())
        return out

    def load_vector(self, f_cell=1.0):
        """∫ f λ_i with f cellwise-constant."""
        f = np.broadcast_to(np.asarray(f_cell, float), (self.mesh.n_cells,))
        loc = np.einsum("c,q,qi->ci", f * self.detJ, self.qw, self.vals)
        out = np.zeros(self.mesh.n_nodes)
        np.add.at(out, self.mesh.cells.ravel(), loc.ravel())
        return out

    # -- elasticity ---------------------------------------------------------

    def elasticity_matrix(self, mu_cell, lam_cell):
        """Vector stiffness K[(i,a),(j,b)] = ∫ σ(φ_j e_b):ε(φ_i e_a) dx.

        Dof layout: node-major, component-minor (i*d + a).
        """
        m = self.mesh
        d = self.dim
        mu = np.broadcast_to(np.asarray(mu_cell, float), (m.n_cells,))
        lam = np.broadcast_to(np.asarray(lam_cell, float), (m.n_cells,))
        g = self.grads
        # sigma(phi_j e_b):eps(phi_i e_a)
        #   = mu (g_j[a] g_i[b] + delta_ab g_j·g_i) + lam g_j[b] g_i[a]
        gg = np.einsum("cid,cjd->cij", g, g)
        eye = np.eye(d)
        loc = (
            mu[:, None, None, None, None]
            * (
                np.einsum("cja,cib->cijab", g, g)
                + np.einsum("cij,ab->cijab", gg, eye)
            )
            + lam[:, None, None, None, None] * np.einsum("cjb,cia->cijab", g, g)
        ) * self.vols[:, None, None, None, None]
        # scatter into (n_nodes*d)²
        cells = m.cells
        nc = m.n_cells
        npe = self.npe
        ii, jj, aa, bb = np.meshgrid(
            np.arange(npe), np.arange(npe), np.arange(d), np.arange(d), indexing="ij"
        )
        rows = (cells[:, ii] * d + aa).ravel()
        cols = (cells[:, jj] * d + bb).ravel()
        vals = loc[:, ii, jj, aa, bb].ravel()
        K = sp.coo_matrix(
            (vals, (rows, cols)), shape=(m.n_nodes * d, m.n_nodes * d)
        )
        return K.tocsr()

    def coupling_matrix(self, mu_cell, lam_cell, coupling):
        """C[(i,a), j] = k(2μ+dλ) ∫ λ_j div(φ_i e_a) dx  — the growth-strain
        coupling term σ(v):(k c I)."""
        m = self.mesh
        d = self.dim
        mu = np.broadcast_to(np.asarray(mu_cell, float), (m.n_cells,))
        lam = np.broadcast_to(np.asarray(lam_cell, float), (m.n_cells,))
        fac = coupling * (2 * mu + d * lam) * self.vols / (d + 1)
        # entry per cell, i, a, j: fac * g_i[a]
        npe = self.npe
        ii, aa, jj = np.meshgrid(
            np.arange(npe), np.arange(d), np.arange(npe), indexing="ij"
        )
        rows = (m.cells[:, ii] * d + aa).ravel()
        cols = m.cells[:, jj].ravel()
        vals = (fac[:, None, None, None] * self.grads[:, ii, aa]).ravel()
        C = sp.coo_matrix((vals, (rows, cols)), shape=(m.n_nodes * d, m.n_nodes))
        return C.tocsr()

    # -- coupled implicit-Euler step ---------------------------------------

    def solve_step(
        self,
        u_prev,
        c_prev,
        D_cell,
        rho_cell,
        mu_cell,
        lam_cell,
        coupling,
        dt,
        dirichlet_disp_nodes=None,
        dirichlet_disp_values=None,
        dirichlet_conc_nodes=None,
        dirichlet_conc_values=None,
        newton_tol=1e-12,
        max_newton=30,
    ):
        """One implicit-Euler step of the coupled system, Newton + spsolve.

        Solves the RD equation for c (nonlinear), then elasticity for u —
        the exact block-triangular structure of the monolithic Jacobian.
        """
        m = self.mesh
        d = self.dim
        M = self.mass_matrix()
        K = self.stiffness_matrix(D_cell)
        rho = np.broadcast_to(np.asarray(rho_cell, float), (m.n_cells,))
        Mrho = self.mass_matrix_weighted_cell(rho)

        cdn = (
            np.asarray(dirichlet_conc_nodes, int)
            if dirichlet_conc_nodes is not None
            else np.zeros(0, int)
        )
        cdv = (
            np.asarray(dirichlet_conc_values, float)
            if dirichlet_conc_values is not None
            else np.zeros(0)
        )

        c = c_prev.copy()
        b_const = M @ c_prev
        for _ in range(max_newton):
            Nc = self.quadratic_load_weighted_cell(c, rho)
            R = M @ c - dt * (Mrho @ c - Nc) + dt * (K @ c) - b_const
            J = M + dt * K - dt * (Mrho - 2 * self.weighted_mass_matrix_cellrho(c, rho))
            # dirichlet on concentration
            if len(cdn):
                R[cdn] = c[cdn] - cdv
                J = J.tolil()
                J[cdn, :] = 0
                J[cdn, cdn] = 1.0
                J = J.tocsr()
            if np.linalg.norm(R) < newton_tol:
                break
            dc = spla.spsolve(J.tocsc(), -R)
            c = c + dc

        # elasticity: K_u u = C c (+ dirichlet)
        Ku = self.elasticity_matrix(mu_cell, lam_cell)
        C = self.coupling_matrix(mu_cell, lam_cell, coupling)
        rhs = C @ c
        u = np.zeros(m.n_nodes * d)
        if dirichlet_disp_nodes is not None:
            ddofs = (
                np.asarray(dirichlet_disp_nodes, int)[:, None] * d + np.arange(d)
            ).ravel()
            dvals = np.asarray(dirichlet_disp_values, float).ravel()
            Ku = Ku.tolil()
            rhs = rhs - Ku[:, ddofs] @ dvals if len(ddofs) else rhs
            rhs[ddofs] = dvals
            Ku[ddofs, :] = 0
            Ku[:, ddofs] = 0
            Ku[ddofs, ddofs] = 1.0
            Ku = Ku.tocsr()
        u = spla.spsolve(Ku.tocsc(), rhs)
        return u.reshape(m.n_nodes, d), c

    # weighted helpers with cellwise weights ---------------------------------

    def mass_matrix_weighted_cell(self, w_cell):
        local = np.einsum("q,qi,qj->ij", self.qw, self.vals, self.vals)
        loc = (w_cell * self.detJ)[:, None, None] * local[None]
        return self._coo(loc)

    def weighted_mass_matrix_cellrho(self, c, rho_cell):
        """∫ ρ c λ_i λ_j with cellwise ρ and P1 c."""
        ce = c[self.mesh.cells]
        cq = ce @ self.vals.T
        loc = np.einsum(
            "c,cq,q,qi,qj->cij",
            rho_cell * self.detJ,
            cq,
            self.qw,
            self.vals,
            self.vals,
        )
        return self._coo(loc)

    def quadratic_load_weighted_cell(self, c, rho_cell):
        ce = c[self.mesh.cells]
        cq = ce @ self.vals.T
        loc = np.einsum(
            "c,cq,q,qi->ci", rho_cell * self.detJ, cq**2, self.qw, self.vals
        )
        out = np.zeros(self.mesh.n_nodes)
        np.add.at(out, self.mesh.cells.ravel(), loc.ravel())
        return out
