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
        linear_solver="direct",
    ):
        """One implicit-Euler step of the coupled system, Newton + spsolve.

        Solves the RD equation for c (nonlinear), then elasticity for u —
        the exact block-triangular structure of the monolithic Jacobian.

        ``linear_solver``: 'direct' (spsolve — the small-mesh default) or
        'cg' (ILU-preconditioned scipy CG, the practical CPU choice at
        reference-flagship scale where direct 3D factorizations blow up;
        the same solver class FEniCS/PETSc uses for these meshes,
        reference simulation_base.py:101-102 'cg'+'amg').
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
            dc = self._linsolve(J, -R, linear_solver)
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
        u = self._linsolve(Ku, rhs, linear_solver)
        return u.reshape(m.n_nodes, d), c

    def _linsolve(self, A, b, linear_solver):
        """Direct spsolve or ILU-preconditioned CG (rtol 1e-7 — the same
        convergence target the JAX f32 path solves to)."""
        if linear_solver == "direct":
            return spla.spsolve(A.tocsc(), b)
        A = A.tocsc()
        try:
            ilu = spla.spilu(A, drop_tol=1e-5, fill_factor=10.0)
            M = spla.LinearOperator(A.shape, ilu.solve)
        except (MemoryError, RuntimeError):
            dg = A.diagonal()
            M = spla.LinearOperator(A.shape, lambda r: r / dg)
        x, info = spla.cg(A, b, rtol=1e-7, atol=0.0, maxiter=5000, M=M)
        if info != 0:  # fall back to direct rather than return junk
            return spla.spsolve(A, b)
        return x

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


# ---------------------------------------------------------------------------
# P2 (quadratic) concentration reference — parity harness for the quad models
# ---------------------------------------------------------------------------


def _gauss_simplex(dim, degree):
    """Collapsed Gauss-Legendre product rule on the unit simplex, exact to
    ``degree`` (independent construction: barycentric recursion over 1D
    Gauss rules, not the production code's Duffy-variable form)."""
    n1 = degree // 2 + dim + 1
    x, w = np.polynomial.legendre.leggauss(n1)
    x = 0.5 * (x + 1.0)
    w = 0.5 * w
    if dim == 1:
        return x[:, None], w
    # recursive: xi_d scaled into remaining simplex
    sub_qp, sub_qw = _gauss_simplex(dim - 1, degree + n1)
    pts, wts = [], []
    for xi, wi in zip(x, w):
        scale = 1.0 - xi
        for p, wp in zip(sub_qp, sub_qw):
            pts.append(np.concatenate([[xi], scale * p]))
            wts.append(wi * wp * scale ** (dim - 1))
    return np.asarray(pts), np.asarray(wts)


def _p2_tabulate(dim, qp, edge_pairs):
    """P2 Lagrange basis values/ref-gradients at qp, vertex dofs then edge
    dofs ordered by ``edge_pairs`` (local vertex index pairs)."""
    nq = qp.shape[0]
    nv = dim + 1
    lam = np.concatenate([(1.0 - qp.sum(axis=1))[:, None], qp], axis=1)
    dlam = np.zeros((nv, dim))
    dlam[0] = -1.0
    for a in range(dim):
        dlam[a + 1, a] = 1.0
    nd = nv + len(edge_pairs)
    vals = np.zeros((nq, nd))
    grads = np.zeros((nq, nd, dim))
    for i in range(nv):
        vals[:, i] = lam[:, i] * (2 * lam[:, i] - 1)
        grads[:, i] = (4 * lam[:, i] - 1)[:, None] * dlam[i]
    for e, (a, b) in enumerate(edge_pairs):
        vals[:, nv + e] = 4 * lam[:, a] * lam[:, b]
        grads[:, nv + e] = (
            lam[:, a][:, None] * dlam[b] + lam[:, b][:, None] * dlam[a]
        ) * 4
    return vals, grads


class ReferenceFEMP2(ReferenceFEM):
    """Sparse-matrix FEM with quadratic (P2) concentration + P1 elasticity.

    Parity harness for the quad model family (reference
    simulation_tumor_growth_quad.py:69: only the concentration element
    degree changes).  Global P2 dof layout matches the production path by
    construction: [vertices | edge midpoints], edge ids from
    ``Mesh.edges()`` (the topological enumeration both sides share), but
    assembly here is classic scipy COO + spsolve.
    """

    def __init__(self, mesh, quad_degree=6):
        super().__init__(mesh)
        from glimslib_tpu.core.mesh import EDGE_VERTICES

        edge_nodes, cell_edges = mesh.edges()
        self.n_edges = len(edge_nodes)
        self.n_dofs2 = mesh.n_nodes + self.n_edges
        self.cell_dofs2 = np.concatenate(
            [mesh.cells, mesh.n_nodes + cell_edges], axis=1
        ).astype(np.int64)
        self.npe2 = self.cell_dofs2.shape[1]
        self.qp2, self.qw2 = _gauss_simplex(mesh.dim, quad_degree)
        self.vals2, rg = _p2_tabulate(mesh.dim, self.qp2, EDGE_VERTICES[mesh.dim])
        # physical gradients per cell: d xi_a / dx = grad(lambda_{a+1})
        A = mesh.cell_grads[:, 1:, :]  # (nc, d, d)
        self.pgrads2 = np.einsum("qia,cad->cqid", rg, A)
        self.dof_coords2 = np.concatenate(
            [mesh.points, mesh.points[edge_nodes].mean(axis=1)], axis=0
        )

    def _coo2(self, local):
        cd = self.cell_dofs2
        rows = np.repeat(cd, self.npe2, axis=1).ravel()
        cols = np.tile(cd, (1, self.npe2)).ravel()
        A = sp.coo_matrix(
            (local.ravel(), (rows, cols)), shape=(self.n_dofs2, self.n_dofs2)
        )
        return A.tocsr()

    def mass_matrix2(self):
        local = np.einsum("q,qi,qj->ij", self.qw2, self.vals2, self.vals2)
        return self._coo2(self.detJ[:, None, None] * local[None])

    def stiffness_matrix2(self, D_cell=1.0):
        D = np.broadcast_to(np.asarray(D_cell, float), (self.mesh.n_cells,))
        loc = np.einsum(
            "c,q,cqid,cqjd->cij", D * self.detJ, self.qw2, self.pgrads2, self.pgrads2
        )
        return self._coo2(loc)

    def mass_matrix_weighted_cell2(self, w_cell):
        local = np.einsum("q,qi,qj->ij", self.qw2, self.vals2, self.vals2)
        return self._coo2((w_cell * self.detJ)[:, None, None] * local[None])

    def weighted_mass_matrix_cellrho2(self, c, rho_cell):
        cq = c[self.cell_dofs2] @ self.vals2.T  # (nc, nq)
        loc = np.einsum(
            "c,cq,q,qi,qj->cij",
            rho_cell * self.detJ, cq, self.qw2, self.vals2, self.vals2,
        )
        return self._coo2(loc)

    def quadratic_load_weighted_cell2(self, c, rho_cell):
        cq = c[self.cell_dofs2] @ self.vals2.T
        loc = np.einsum(
            "c,cq,q,qi->ci", rho_cell * self.detJ, cq**2, self.qw2, self.vals2
        )
        out = np.zeros(self.n_dofs2)
        np.add.at(out, self.cell_dofs2.ravel(), loc.ravel())
        return out

    def load_vector2(self, f_cell=1.0):
        f = np.broadcast_to(np.asarray(f_cell, float), (self.mesh.n_cells,))
        loc = np.einsum("c,q,qi->ci", f * self.detJ, self.qw2, self.vals2)
        out = np.zeros(self.n_dofs2)
        np.add.at(out, self.cell_dofs2.ravel(), loc.ravel())
        return out

    def boundary_flux_vector2(self, facet_idx, q=1.0):
        """∫_Γ q φ_i ds over the selected boundary facets, exact closed
        forms for constant q (2D segment: L(1/6, 1/6, 2/3); 3D triangle:
        vertices 0, edges A/3)."""
        m = self.mesh
        fidx = np.asarray(facet_idx, int)
        fnodes = m.boundary_facet_nodes[fidx]
        area = m.boundary_facet_area[fidx]
        q = np.broadcast_to(np.asarray(q, float), (len(fidx),))
        out = np.zeros(self.n_dofs2)
        if m.dim == 2:
            eid = m.edge_ids_for_pairs(fnodes)
            np.add.at(out, fnodes[:, 0], q * area / 6.0)
            np.add.at(out, fnodes[:, 1], q * area / 6.0)
            np.add.at(out, m.n_nodes + eid, q * area * 2.0 / 3.0)
        else:
            pairs = np.concatenate(
                [fnodes[:, [1, 2]], fnodes[:, [0, 2]], fnodes[:, [0, 1]]], axis=0
            )
            eids = m.edge_ids_for_pairs(pairs).reshape(3, len(fidx)).T
            for k in range(3):
                np.add.at(out, m.n_nodes + eids[:, k], q * area / 3.0)
        return out

    def coupling_matrix_p2(self, mu_cell, lam_cell, coupling):
        """C[(i,a), j] = k(2μ+dλ) ∫ φ²_j div(φ_i e_a) dx with P2 column
        space: div(φ_i e_a) = g_i[a] constant, so entries are
        fac · g_i[a] · ∫_e φ²_j dx."""
        m = self.mesh
        d = self.dim
        mu = np.broadcast_to(np.asarray(mu_cell, float), (m.n_cells,))
        lam = np.broadcast_to(np.asarray(lam_cell, float), (m.n_cells,))
        fac = coupling * (2 * mu + d * lam)
        wj = np.einsum("c,q,qj->cj", self.detJ, self.qw2, self.vals2)  # (nc, npe2)
        npe = self.npe
        ii, aa, jj = np.meshgrid(
            np.arange(npe), np.arange(d), np.arange(self.npe2), indexing="ij"
        )
        rows = (m.cells[:, ii] * d + aa).ravel()
        cols = self.cell_dofs2[:, jj].ravel()
        vals = (
            fac[:, None, None, None] * self.grads[:, ii, aa] * wj[:, jj]
        ).ravel()
        C = sp.coo_matrix(
            (vals, (rows, cols)), shape=(m.n_nodes * d, self.n_dofs2)
        )
        return C.tocsr()

    def solve_step2(
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
        dirichlet_conc_dofs=None,
        dirichlet_conc_values=None,
        flux_facets=None,
        flux_value=0.0,
        flux_D_scaled=True,
        newton_tol=1e-12,
        max_newton=30,
    ):
        """One implicit-Euler step with P2 concentration: Newton + spsolve
        on the c-block, then P1 elasticity with the P2 coupling column."""
        m = self.mesh
        d = self.dim
        M = self.mass_matrix2()
        K = self.stiffness_matrix2(D_cell)
        rho = np.broadcast_to(np.asarray(rho_cell, float), (m.n_cells,))
        Mrho = self.mass_matrix_weighted_cell2(rho)

        cdn = (
            np.asarray(dirichlet_conc_dofs, int)
            if dirichlet_conc_dofs is not None
            else np.zeros(0, int)
        )
        cdv = (
            np.asarray(dirichlet_conc_values, float)
            if dirichlet_conc_values is not None
            else np.zeros(0)
        )
        g = np.zeros(self.n_dofs2)
        if flux_facets is not None and len(flux_facets):
            # reference scales the surface flux by D (and the step by dt)
            qv = flux_value
            if flux_D_scaled:
                Dfacet = np.broadcast_to(
                    np.asarray(D_cell, float), (m.n_cells,)
                )[m.boundary_facet_cell[np.asarray(flux_facets, int)]]
                qv = qv * Dfacet
            g = self.boundary_flux_vector2(flux_facets, qv)

        c = c_prev.copy()
        b_const = M @ c_prev + dt * g
        for _ in range(max_newton):
            Nc = self.quadratic_load_weighted_cell2(c, rho)
            R = M @ c - dt * (Mrho @ c - Nc) + dt * (K @ c) - b_const
            J = M + dt * K - dt * (
                Mrho - 2 * self.weighted_mass_matrix_cellrho2(c, rho)
            )
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

        Ku = self.elasticity_matrix(mu_cell, lam_cell)
        C = self.coupling_matrix_p2(mu_cell, lam_cell, coupling)
        rhs = C @ c
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
