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


def p2_dof_layout(mesh):
    """Shared P2 dof numbering for a mesh: ``(perm, rank, n_edges)``.

    ``perm[new_id] = canonical_id`` and ``rank[canonical_id] = new_id``,
    where canonical = ``[vertices | n_nodes + edges]``.  By default the
    dofs are INTERLEAVED in Morton order over their coordinates (vertices
    at vertex positions, edge dofs at midpoints): vertex and edge dofs
    that are spatial neighbors get nearby ids, which is what the supernode
    halo-ELL operator layout (ops/p2_ell.py) needs — with the canonical
    segregated numbering every vertex↔edge coupling is block-external and
    the flagship plan explodes to Kh=890 / 248M dense slots (measured;
    interleaving cuts it to Kh=240 / 67M at s=32, and the per-matvec halo
    gather from 7.5M to 1.8M rows).  ``GLIMS_P2_INTERLEAVE=0`` restores
    the canonical order.

    Cached on the mesh object; every P2 consumer (P2Kernels, FunctionSpace
    projections, Dirichlet/von-Neumann BCs, results I/O) must map through
    this ONE layout."""
    import os

    cached = getattr(mesh, "_p2_layout_cache", None)
    if cached is not None:
        return cached
    edge_nodes, _ = mesh.edges()
    n, ne = mesh.n_nodes, len(edge_nodes)
    if os.environ.get("GLIMS_P2_INTERLEAVE", "1") == "0":
        perm = np.arange(n + ne, dtype=np.int64)
        rank = perm
    else:
        pts = np.asarray(mesh.points, np.float64)
        coords = np.concatenate([pts, pts[edge_nodes].mean(axis=1)], axis=0)
        bits = 10
        lo, hi = coords.min(axis=0), coords.max(axis=0)
        qv = ((coords - lo) / np.maximum(hi - lo, 1e-30) * ((1 << bits) - 1)
              ).astype(np.uint64)
        d = coords.shape[1]
        code = np.zeros(len(coords), np.uint64)
        for b in range(bits):
            for a in range(d):
                code |= (
                    (qv[:, a] >> np.uint64(b)) & np.uint64(1)
                ) << np.uint64(b * d + a)
        perm = np.argsort(code, kind="stable").astype(np.int64)
        rank = np.empty_like(perm)
        rank[perm] = np.arange(len(perm))
    out = (perm, rank, ne)
    object.__setattr__(mesh, "_p2_layout_cache", out)
    return out


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
        # interleaved-Morton dof numbering (see p2_dof_layout): rank maps
        # canonical [vertices | n + edges] ids to the actual dof ids
        perm, rank, _ = p2_dof_layout(mesh)
        self.dof_perm = perm
        self.dof_rank = rank
        self.vertex_ids = jnp.asarray(rank[: mesh.n_nodes].copy())
        cell_dofs = rank[np.concatenate(
            [mesh.cells, mesh.n_nodes + cell_edges], axis=1
        )].astype(np.int32)
        self.cell_dofs = jnp.asarray(cell_dofs)
        self.npe = cell_dofs.shape[1]
        self.plan = make_scatter_plan(cell_dofs, self.n_dofs)
        # cell-axis-LAST twin (SoA; lanes are 128-wide trailing — CLAUDE
        # perf model): the hot quadrature kernels keep every per-cell
        # tensor (…, nc) so the small npe/nq/d axes never land on lanes
        # (an (nc, npe) minor pads 10 -> 128, 12.8x the HBM traffic —
        # measured 53 ms -> ~4 ms on the 196k-tet flagship residual)
        self.cell_dofs_T = jnp.asarray(np.ascontiguousarray(cell_dofs.T))
        self.plan_T = make_scatter_plan(cell_dofs.T, self.n_dofs)
        # CLASS-SPLIT accumulation: one pull plan per dof-multiplicity
        # class.  P2 mixes vertex dofs (~24 incident tets) with edge dofs
        # (~6): a single plan pads EVERY dof to K=24 — 6.6M gathered rows
        # per accumulate at the 196k-tet flagship against 1.96M real
        # incidences.  Splitting at K=8 gathers 0.9M + 1.4M rows plus one
        # 274k combine gather (~2.6M total, measured 46 -> ~20 ms per
        # accumulate).  Entry order is cell_dofs_T (dof-slot-major).
        from glimslib_tpu.ops.assembly import make_scatter_plan_dropping

        counts = np.bincount(cell_dofs.ravel(), minlength=self.n_dofs)
        flatT = cell_dofs.T.ravel().astype(np.int64)
        lo = counts <= 8
        self._class_plans = []
        order = []
        for member in (lo, ~lo):
            ids = np.where(member)[0]
            if len(ids) == 0:
                continue
            rank_c = np.full(self.n_dofs, len(ids), dtype=np.int64)
            rank_c[ids] = np.arange(len(ids))
            self._class_plans.append(
                make_scatter_plan_dropping(rank_c[flatT], len(ids))
            )
            order.append(ids)
        pos = np.empty(self.n_dofs, dtype=np.int64)
        pos[np.concatenate(order)] = np.arange(self.n_dofs)
        self._class_unperm = jnp.asarray(pos)

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
        # cell-last twin for the hot kernels: A_T[a, d, nc]
        self.A_T = jnp.asarray(
            np.ascontiguousarray(
                np.transpose(np.asarray(mesh.cell_grads[:, 1:, :]), (1, 2, 0))
            ), dtype
        )

        # dof coordinates (for IVs/targets), in the interleaved dof order
        self.dof_coords = np.concatenate(
            [mesh.points, mesh.points[edge_nodes].mean(axis=1)], axis=0
        )[perm]

    # -- basics --------------------------------------------------------------

    def gather(self, f):
        # duplicated width-2 row-gather: ~3x faster than scalar gathers on
        # TPU (see ops/assembly.py ScatterPlan notes)
        pack = jnp.stack([f, f], axis=-1)
        return jnp.take(pack, self.cell_dofs.ravel(), axis=0).reshape(
            self.n_cells, self.npe, 2
        )[..., 0]

    def gather2(self, f, f2):
        """Row-gather two fields at once: -> (nc, npe, 2)."""
        pack = jnp.stack([f, f2], axis=-1)
        return jnp.take(pack, self.cell_dofs.ravel(), axis=0).reshape(
            self.n_cells, self.npe, 2
        )

    def gather_T(self, f):
        """(npe, nc) cell-dof values, CELL AXIS LAST (fast row-gather +
        SoA layout for the hot kernels)."""
        pack = jnp.stack([f, f], axis=-1)
        return jnp.take(pack, self.cell_dofs_T.ravel(), axis=0).reshape(
            self.npe, self.n_cells, 2
        )[..., 0]

    def gather2_T(self, f, f2):
        """Row-gather two fields at once, cell last: -> (npe, nc, 2)."""
        pack = jnp.stack([f, f2], axis=-1)
        return jnp.take(pack, self.cell_dofs_T.ravel(), axis=0).reshape(
            self.npe, self.n_cells, 2
        )

    def at_quad_T(self, feT):
        """(npe, nc) dof values -> (nq, nc) values at quadrature points."""
        return jnp.sum(self.vals[:, :, None] * feT[None], axis=1)

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

    def scatter_T(self, contrib_T):
        """(npe, nc) cell-last contributions -> (n_dofs,), via the
        class-split pull plans (see __init__) + one combine gather."""
        flat = contrib_T.ravel()
        outs = [scatter(p, flat) for p in self._class_plans]
        full = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
        pack = jnp.stack([full, full], axis=-1)
        return jnp.take(pack, self._class_unperm, axis=0)[..., 0]

    def _wdet(self):
        return self.qw[None, :] * self.detJ[:, None]  # (nc, nq)

    # -- residuals -----------------------------------------------------------

    def rd_residual(self, c, c_prev, D, rho, dt, source=0.0, conc_max=1.0):
        """Implicit-Euler Fisher-KPP residual for P2 c, by quadrature.

        CELL AXIS LAST throughout: every per-cell tensor is (..., nc), so
        the small npe/nq/d axes never ride the 128-lane minor dim — the
        (nc, npe)-minor formulation lane-pads 10 -> 128 and cost 53 ms at
        196k tets against a ~4 ms roofline (round-5 measurement).  Small
        static axes reduce via Python loops of (..., nc) fma passes,
        never einsum (CLAUDE.md: bf16 MXU dots)."""
        nq, npe, d = self.vals.shape[0], self.npe, self.dim
        nc = self.n_cells
        ge = self.gather2_T(c, c_prev)  # (npe, nc, 2)
        ceT = ge[..., 0]
        cpT = ge[..., 1]
        D = jnp.broadcast_to(jnp.asarray(D, self.dtype), (nc,))
        rho = jnp.broadcast_to(jnp.asarray(rho, self.dtype), (nc,))
        source = jnp.broadcast_to(jnp.asarray(source, self.dtype), (nc,))
        wdet = self.qw[:, None] * self.detJ[None, :]  # (nq, nc)

        cq = self.at_quad_T(ceT)  # (nq, nc)
        cpq = self.at_quad_T(cpT)
        point = (
            (cq - cpq)
            - dt * rho[None, :] * cq * (1.0 - cq / conc_max)
            - dt * source[None, :]
        )  # (nq, nc)
        wp = wdet * point
        mass_T = jnp.sum(self.vals[:, :, None] * wp[:, None, :], axis=0)
        # stiffness, cell last:
        #   rgq[q,a,nc] = Σ_i rgrads[q,i,a] ce[i,nc]     (ref-space grad)
        #   gc[q,d,nc]  = Σ_a rgq[q,a,nc] A_T[a,d,nc]    (physical grad)
        #   t[q,a,nc]   = Σ_d gc[q,d,nc] A_T[a,d,nc]
        #   stiff[i,nc] = Σ_{q,a} wdet[q,nc] rgrads[q,i,a] t[q,a,nc]
        rgq = jnp.zeros((nq, d, nc), self.dtype)
        for i in range(npe):
            rgq = rgq + self.rgrads[:, i, :, None] * ceT[i][None, None, :]
        gc = jnp.zeros((nq, d, nc), self.dtype)
        for a in range(d):
            gc = gc + rgq[:, a, None, :] * self.A_T[a][None, :, :]
        t = jnp.zeros((nq, d, nc), self.dtype)
        for dd in range(d):
            t = t + gc[:, dd, None, :] * self.A_T[:, dd][None, :, :]
        wt = wdet[:, None, :] * t  # (nq, a, nc)
        stiff_T = jnp.stack([
            jnp.sum(self.rgrads[:, i, :, None] * wt, axis=(0, 1))
            for i in range(npe)
        ])  # (npe, nc)
        contrib_T = mass_T + (dt * D)[None, :] * stiff_T
        return self.scatter_T(contrib_T)

    def rd_mass_stiffness_diag(self, D, rho, dt):
        """Jacobi diagonal of (M + dt D K) (preconditioner only); cell
        axis last (see rd_residual)."""
        nq, npe, d = self.vals.shape[0], self.npe, self.dim
        nc = self.n_cells
        D = jnp.broadcast_to(jnp.asarray(D, self.dtype), (nc,))
        wdet = self.qw[:, None] * self.detJ[None, :]  # (nq, nc)
        mdiag_T = jnp.sum(
            (self.vals ** 2)[:, :, None] * wdet[:, None, :], axis=0
        )  # (npe, nc)
        # physical basis gradient per i: pg[q,d,nc] = Σ_a rgrads[q,i,a]
        # A_T[a,d,nc]; kdiag[i,nc] = Σ_{q,d} wdet pg²
        rows = []
        for i in range(npe):
            pg = jnp.zeros((nq, d, nc), self.dtype)
            for a in range(d):
                pg = pg + self.rgrads[:, i, a][:, None, None] \
                    * self.A_T[a][None, :, :]
            rows.append(jnp.sum(wdet[:, None, :] * pg * pg, axis=(0, 1)))
        kdiag_T = jnp.stack(rows)  # (npe, nc)
        contrib_T = mdiag_T + (dt * D)[None, :] * kdiag_T
        return self.scatter_T(contrib_T)

    def mass_residual(self, c):
        ceT = self.gather_T(c)  # (npe, nc)
        cq = self.at_quad_T(ceT)  # (nq, nc)
        wq = (self.qw[:, None] * self.detJ[None, :]) * cq
        contrib_T = jnp.sum(self.vals[:, :, None] * wq[:, None, :], axis=0)
        return self.scatter_T(contrib_T)

    def lumped_mass(self):
        """Row-sum lumped mass (positive for P2 via abs-row-sum fallback)."""
        ones = jnp.ones(self.n_dofs, self.dtype)
        m = self.mass_residual(ones)
        # P2 row sums can be ~0 at vertices; floor with a fraction of mean
        floor = jnp.mean(jnp.abs(m)) * 1e-2
        return jnp.where(jnp.abs(m) > floor, jnp.abs(m), floor)

    def mass_diag(self):
        """Exact mass-matrix diagonal ∫ φ_i² dx — strictly positive, the
        right Jacobi preconditioner for P2 mass solves (unlike row-sum
        lumping, whose vertex rows are near zero)."""
        contrib = jnp.sum(self._wdet()[:, :, None] * self.vals[None] ** 2, axis=1)
        return self._accumulate(contrib)

    def cell_integral(self, c):
        """∫_e c dx per cell (nc,) — feeds the growth-strain coupling."""
        cq = self.at_quad_T(self.gather_T(c))  # (nq, nc)
        return jnp.sum((self.qw[:, None] * self.detJ[None, :]) * cq, axis=0)

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

    def project_rhs(self, fn_or_values, quad_degree=6):
        """RHS of the L2 projection: b_i = ∫ f φ_i dx by quadrature.

        ``fn_or_values`` is a callable evaluated at physical quadrature
        points, or a (n_dofs,) coefficient vector (then b = M f).  Matches
        the reference's projected IVs (helper_classes.py:983-986,
        ``fenics.project`` with cg/amg) instead of nodal interpolation.
        """
        if not callable(fn_or_values):
            return self.mass_residual(jnp.asarray(fn_or_values, self.dtype))
        qp, qw = simplex_quadrature(self.dim, quad_degree)
        el = P2Element(self.dim)
        vals, _ = el.tabulate(qp)
        from glimslib_tpu.core.elements import P1Element

        p1v, _ = P1Element(self.dim).tabulate(qp)  # (nq, d+1)
        X = self.mesh.points[self.mesh.cells]  # (nc, d+1, dim)
        xq = np.sum(p1v[None, :, :, None] * X[:, None, :, :], axis=2)
        fq = np.asarray(fn_or_values(xq.reshape(-1, self.dim)), dtype=np.float64)
        fq = fq.reshape(self.n_cells, len(qw))
        wdet = qw[None, :] * np.asarray(self.detJ)[:, None]
        contrib = jnp.asarray(
            np.sum((wdet * fq)[:, :, None] * vals[None], axis=1), self.dtype
        )
        return self._accumulate(contrib)

    def vertex_part(self, c):
        """Restrict a P2 coefficient vector to its vertex dofs (for plotting
        and P1-based postprocessing), in mesh-node order."""
        c = jnp.asarray(c)
        pack = jnp.stack([c, c], axis=-1)  # fast row-gather path
        return jnp.take(pack, self.vertex_ids, axis=0)[..., 0]

    def edge_dof_ids(self, eids):
        """Global dof ids of edge dofs given canonical edge indices."""
        return self.dof_rank[self.mesh.n_nodes + np.asarray(eids, np.int64)]

    def vertex_dof_ids(self, nids):
        """Global dof ids of vertex dofs given mesh-node indices."""
        return self.dof_rank[np.asarray(nids, np.int64)]


class P2FacetKernels:
    """Surface-integral kernels for a P2 scalar field on selected exterior
    facets: ∫_Γ q φ_i ds by facet quadrature on the trace element.

    The restriction of the cell P2 basis to a facet IS the P2 element of the
    (d-1)-simplex, with facet dofs = facet vertices + facet-edge midpoints —
    so the kernels tabulate :class:`P2Element(dim-1)` at facet quadrature
    points.  Replaces the reference's UFL ``q*v*ds`` terms for the quad
    models (helper_classes.py:861-908; previously NotImplemented here).
    """

    def __init__(self, mesh, facet_idx: np.ndarray, n_dofs: int, dtype=jnp.float64):
        from glimslib_tpu.core.elements import P1Element
        from glimslib_tpu.core.mesh import EDGE_VERTICES

        d = mesh.dim
        if d < 2:
            raise ValueError("P2 facet kernels need dim >= 2")
        self.dim = d
        self.dtype = dtype
        fidx = np.asarray(facet_idx, dtype=np.int64)
        self.n_facets = len(fidx)
        fnodes = mesh.boundary_facet_nodes[fidx]  # (nf, d) vertex ids
        self.facet_area = jnp.asarray(mesh.boundary_facet_area[fidx], dtype=dtype)

        # facet dof map ordered like P2Element(d-1): vertices then edges
        fev = EDGE_VERTICES[d - 1]
        if self.n_facets:
            pairs = np.concatenate([fnodes[:, list(p)] for p in fev], axis=0)
            eids = mesh.edge_ids_for_pairs(pairs)
            eids = eids.reshape(len(fev), self.n_facets).T  # (nf, ne_facet)
        else:
            eids = np.zeros((0, len(fev)), dtype=np.int32)
        _, rank, _ = p2_dof_layout(mesh)
        facet_dofs = rank[np.concatenate(
            [fnodes, mesh.n_nodes + eids], axis=1
        )].astype(np.int64)  # (nf, nfd), in the shared interleaved order
        self.facet_dofs = facet_dofs
        self.plan = make_scatter_plan(facet_dofs, n_dofs)

        qp, qw = simplex_quadrature(d - 1, 4)
        vals, _ = P2Element(d - 1).tabulate(qp)  # (nq, nfd)
        self.qw = jnp.asarray(qw * math.factorial(d - 1), dtype)  # sums to 1
        self.vals = jnp.asarray(vals, dtype)
        self.n_quad = len(qw)
        # physical quadrature coordinates (affine facet): (nf, nq, dim)
        p1v, _ = P1Element(d - 1).tabulate(qp)  # (nq, d)
        X = mesh.points[fnodes]  # (nf, d, dim)
        self.value_coords = jnp.asarray(
            np.sum(p1v[None, :, :, None] * X[:, None, :, :], axis=2), dtype
        )

    def scalar_flux_residual(self, q):
        """∫_Γ q φ_i ds with q constant, per-facet (nf,), or per-facet-
        quad-point (nf, nq).  Returns (n_dofs,)."""
        q = jnp.asarray(q, self.dtype)
        if q.ndim <= 1:
            qq = jnp.broadcast_to(
                q[..., None] if q.ndim == 1 else q,
                (self.n_facets, self.n_quad),
            )
        else:
            qq = q
        w = self.facet_area[:, None] * self.qw[None, :] * qq  # (nf, nq)
        contrib = jnp.sum(w[:, :, None] * self.vals[None], axis=1)  # (nf, nfd)
        return scatter(self.plan, contrib.reshape(-1))
