"""Quadrature-based P2 (quadratic) concentration kernels.

The reference's quad model family uses degree-2 Lagrange concentration on
the same mesh (``simulation_tumor_growth_quad.py:69``; the brain-quad model
``simulation_tumor_growth_brain_quad.py`` drives the whole optimization
workflow).  P2 breaks the closed-form-P1 shortcut, so these kernels
integrate with tabulated quadrature (degree 6: exact for the cubic
``c^2 v`` logistic term with P2 ``c``).

Dof layout: ``[vertex dofs (n_nodes) | edge dofs (n_edges)]``; per-cell
P2 connectivity = ``[cells | n_nodes + cell_edges]``.

Geometry mapping is affine (P1 simplices), so physical basis gradients are
``ref_grad @ A_e`` with ``A_e[a, :] = grad(lambda_{a+1})`` taken from the
P1 gradient table — no per-quad-point Jacobians.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from glimslib_tpu.core.elements import P2Element, simplex_quadrature
from glimslib_tpu.ops.assembly import make_scatter_plan, scatter


class P2Kernels:
    """Matrix-free kernels for a scalar P2 field on a simplex mesh."""

    def __init__(self, mesh, dtype=None, quad_degree=6):
        if dtype is None:
            dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        self.dtype = dtype
        self.dim = mesh.dim
        self.mesh = mesh
        self.n_nodes = mesh.n_nodes
        self.n_cells = mesh.n_cells

        edge_nodes, cell_edges = mesh.edges()
        self.n_edges = len(edge_nodes)
        self.n_dofs = mesh.n_nodes + self.n_edges
        cell_dofs = np.concatenate(
            [mesh.cells, mesh.n_nodes + cell_edges], axis=1
        ).astype(np.int32)
        self.cell_dofs = jnp.asarray(cell_dofs)
        self.npe = cell_dofs.shape[1]
        self.plan = make_scatter_plan(cell_dofs, self.n_dofs)

        qp, qw = simplex_quadrature(mesh.dim, quad_degree)
        el = P2Element(mesh.dim)
        vals, rgrads = el.tabulate(qp)
        self.qw = jnp.asarray(qw, dtype)  # (nq,)
        self.vals = jnp.asarray(vals, dtype)  # (nq, npe)
        self.rgrads = jnp.asarray(rgrads, dtype)  # (nq, npe, d)
        self.detJ = jnp.asarray(
            mesh.cell_volumes * math.factorial(mesh.dim), dtype
        )  # (nc,)
        # affine map: A[e, a, d] = grad(lambda_{a+1})  (P1 gradient table)
        self.A = jnp.asarray(mesh.cell_grads[:, 1:, :], dtype)  # (nc, d, d)

        # dof coordinates (for IVs/targets): vertices + edge midpoints
        self.dof_coords = np.concatenate(
            [mesh.points, mesh.points[edge_nodes].mean(axis=1)], axis=0
        )

    # -- basics --------------------------------------------------------------

    def gather(self, f):
        return jnp.take(f, self.cell_dofs, axis=0)

    def at_quad(self, fe):
        """(nc, npe) dof values -> (nc, nq) values at quadrature points."""
        return jnp.sum(self.vals[None] * fe[:, None, :], axis=-1)

    def ref_grad_at_quad(self, fe):
        """(nc, npe) -> reference-space gradient (nc, nq, d)."""
        return jnp.sum(self.rgrads[None] * fe[:, None, :, None], axis=2)

    def phys_grad_at_quad(self, fe):
        """(nc, npe) -> physical gradient (nc, nq, d)."""
        rg = self.ref_grad_at_quad(fe)  # (nc, nq, a)
        return jnp.sum(rg[..., :, None] * self.A[:, None, :, :], axis=-2)

    def _accumulate(self, contrib):
        """(nc, npe) element contributions -> (n_dofs,)."""
        return scatter(self.plan, contrib.reshape(-1))

    def _wdet(self):
        return self.qw[None, :] * self.detJ[:, None]  # (nc, nq)

    # -- residuals -----------------------------------------------------------

    def rd_residual(self, c, c_prev, D, rho, dt, source=0.0, conc_max=1.0):
        """Implicit-Euler Fisher-KPP residual for P2 c, by quadrature."""
        ce = self.gather(c)
        cpe = self.gather(c_prev)
        D = jnp.broadcast_to(jnp.asarray(D, self.dtype), (self.n_cells,))
        rho = jnp.broadcast_to(jnp.asarray(rho, self.dtype), (self.n_cells,))
        source = jnp.broadcast_to(jnp.asarray(source, self.dtype), (self.n_cells,))
        wdet = self._wdet()  # (nc, nq)

        cq = self.at_quad(ce)
        cpq = self.at_quad(cpe)
        # mass + logistic + source pointwise factor
        point = (
            (cq - cpq)
            - dt * rho[:, None] * cq * (1.0 - cq / conc_max)
            - dt * source[:, None]
        )  # (nc, nq)
        mass_term = jnp.sum(
            (wdet * point)[:, :, None] * self.vals[None], axis=1
        )  # (nc, npe)
        # stiffness: dt D sum_q w detJ grad_c . grad_phi_i
        grad_c = self.phys_grad_at_quad(ce)  # (nc, nq, d)
        # grad_phi_i physical: rgrads[q,i,a] A[e,a,d]; contract d first:
        t = jnp.sum(grad_c[:, :, None, :] * self.A[:, None, :, :], axis=-1)
        # t[e, q, a] = sum_d grad_c[e,q,d] A[e,a,d]
        stiff = jnp.sum(
            (wdet)[:, :, None, None] * self.rgrads[None] * t[:, :, None, :],
            axis=(1, 3),
        )  # (nc, npe)
        contrib = mass_term + (dt * D)[:, None] * stiff
        return self._accumulate(contrib)

    def rd_mass_stiffness_diag(self, D, rho, dt):
        """Jacobi diagonal of (M + dt D K) (preconditioner only)."""
        D = jnp.broadcast_to(jnp.asarray(D, self.dtype), (self.n_cells,))
        wdet = self._wdet()
        mdiag = jnp.sum(wdet[:, :, None] * self.vals[None] ** 2, axis=1)
        # physical basis gradient pg[c,q,i,d] = sum_a rgrads[q,i,a] A[c,a,d];
        # broadcast mul+reduce (never einsum on TPU — bf16 MXU dots, CLAUDE.md)
        pg = jnp.sum(
            self.rgrads[None, :, :, :, None] * self.A[:, None, None, :, :],
            axis=3,
        )  # (nc, nq, npe, d)
        g2 = jnp.sum(pg * pg, axis=-1)  # (nc, nq, npe)
        kdiag = jnp.sum(wdet[:, :, None] * g2, axis=1)
        contrib = mdiag + (dt * D)[:, None] * kdiag
        return self._accumulate(contrib)

    def mass_residual(self, c):
        ce = self.gather(c)
        cq = self.at_quad(ce)
        contrib = jnp.sum(
            (self._wdet() * cq)[:, :, None] * self.vals[None], axis=1
        )
        return self._accumulate(contrib)

    def lumped_mass(self):
        """Row-sum lumped mass (positive for P2 via abs-row-sum fallback)."""
        ones = jnp.ones(self.n_dofs, self.dtype)
        m = self.mass_residual(ones)
        # P2 row sums can be ~0 at vertices; floor with a fraction of mean
        floor = jnp.mean(jnp.abs(m)) * 1e-2
        return jnp.where(jnp.abs(m) > floor, jnp.abs(m), floor)

    def cell_integral(self, c):
        """∫_e c dx per cell (nc,) — feeds the growth-strain coupling."""
        cq = self.at_quad(self.gather(c))
        return jnp.sum(self._wdet() * cq, axis=1)

    def integrate(self, c):
        return jnp.sum(self.cell_integral(c))

    # -- projection (IVs / targets) ------------------------------------------

    def project_pointwise(self, fn_or_values):
        """Nodal interpolation at P2 dof coordinates (vertices + edge mids)."""
        if callable(fn_or_values):
            return np.asarray(fn_or_values(self.dof_coords), dtype=np.float64)
        v = np.asarray(fn_or_values, dtype=np.float64)
        if v.shape == (self.n_dofs,):
            return v
        raise ValueError("expected callable or (n_dofs,) array")

    def vertex_part(self, c):
        """Restrict a P2 coefficient vector to its vertex dofs (for plotting
        and P1-based postprocessing)."""
        return c[: self.n_nodes]
