"""Matrix-free P1 element assembly: gather -> per-cell math -> sorted scatter.

This module is the TPU-native replacement for DOLFIN's sparse-matrix assembly
+ PETSc (SURVEY.md §2.2): instead of assembling a CSR matrix, the residual of
the coupled tumor-growth system (reference weak forms at
simulation_tumor_growth.py:110-122 and simulation_tumor_growth_brain_quad.py:83-105)
is evaluated directly:

  1. gather nodal values per cell           (``u[cells]``: HBM gather)
  2. dense per-cell element math            (VPU-vectorized over cells)
  3. scatter-add to nodes                   (sorted ``segment_sum``)

The scatter uses a precomputed sort permutation of the COO row indices so the
accumulation is a ``jax.ops.segment_sum`` with ``indices_are_sorted=True`` —
much friendlier to XLA:TPU than random-access scatter-add.

Jacobian actions come for free via ``jax.jvp`` of these residuals; Jacobi
preconditioner diagonals are assembled by the same scatter path.

All element integrals here are *exact* for P1 fields (closed-form barycentric
monomial integrals, elements.py), matching what FFC-generated quadrature
kernels compute for the same forms.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from glimslib_tpu.core.elements import p1_mass_matrix, p1_cubic_tensor


def _einsum(spec, *ops):
    """Tiny-contraction einsum as broadcast-multiply + reduce.

    The element contractions here run over axes of size 3-6; lowering them
    as ``dot_general`` puts them on the MXU where f32 inputs are truncated
    to bf16 by default (wrong answers for Newton/CG) and
    ``Precision.HIGHEST`` triggers a multi-pass codegen with pathological
    compile times on TPU.  Explicit multiply+reduce stays on the VPU: exact
    f32/f64 accumulation, fast compiles, and XLA fuses it with the
    surrounding elementwise work.
    """
    if spec in ("ij,cj->ci", "ij,fj->fi"):
        M, x = ops
        return jnp.sum(M[None] * x[:, None, :], axis=-1)
    if spec == "cj,cjd->cd":
        x, g = ops
        return jnp.sum(x[:, :, None] * g, axis=1)
    if spec == "cd,cid->ci":
        gc, g = ops
        return jnp.sum(gc[:, None, :] * g, axis=-1)
    if spec == "ijk,cj,ck->ci":
        T, a, b = ops
        return jnp.sum(
            T[None] * a[:, None, :, None] * b[:, None, None, :], axis=(-2, -1)
        )
    if spec == "cid,cid->ci":
        a, b = ops
        return jnp.sum(a * b, axis=-1)
    if spec == "cja,cjb->cab":
        u, g = ops
        return jnp.sum(u[:, :, :, None] * g[:, :, None, :], axis=1)
    if spec == "cab,cib->cia":
        s, g = ops
        return jnp.sum(s[:, None, :, :] * g[:, :, None, :], axis=-1)
    if spec in ("ij,cjd->cid", "ij,fja->fia"):
        M, u = ops
        return jnp.sum(M[None, :, :, None] * u[:, None, :, :], axis=2)
    raise NotImplementedError(spec)


# ---------------------------------------------------------------------------
# Scatter plan
# ---------------------------------------------------------------------------


class ScatterPlan(NamedTuple):
    """Precomputed sorted-scatter plan for element->node accumulation.

    sort_idx   (n_entries,)  permutation sorting the flattened cell->node map
    sorted_ids (n_entries,)  node id of each entry after permutation
    n_segments  int          number of nodes (static)
    """

    sort_idx: np.ndarray
    sorted_ids: np.ndarray
    n_segments: int


def make_scatter_plan(index_map: np.ndarray, n_segments: int) -> ScatterPlan:
    flat = np.asarray(index_map, dtype=np.int32).ravel()
    sort_idx = np.argsort(flat, kind="stable").astype(np.int32)
    return ScatterPlan(
        sort_idx=sort_idx, sorted_ids=flat[sort_idx], n_segments=int(n_segments)
    )


def scatter(plan: ScatterPlan, contrib_flat):
    """Accumulate per-entry contributions into segments (nodes).

    ``contrib_flat``: (n_entries, ...) — e.g. element residual contributions
    flattened over (cell, local node).
    """
    sorted_contrib = jnp.take(contrib_flat, plan.sort_idx, axis=0)
    return jax.ops.segment_sum(
        sorted_contrib,
        jnp.asarray(plan.sorted_ids),
        num_segments=plan.n_segments,
        indices_are_sorted=True,
    )


# ---------------------------------------------------------------------------
# P1 kernels for the coupled tumor-growth system
# ---------------------------------------------------------------------------


class P1Kernels:
    """Per-mesh matrix-free kernels for the mechanically-coupled
    Fisher-KPP + linear-elasticity system.

    Construction precomputes (host-side, numpy):
      - device copies of cells / volumes / P1 gradients,
      - the sorted scatter plan,
      - exact unit-simplex mass matrix and cubic tensor.

    All public methods are pure jnp functions of their array arguments and
    are safe to ``jit`` / differentiate / ``shard_map``.

    Coefficients (``D``, ``rho``, ``mu``, ``lam``, ``coupling``…) are scalars
    or per-cell arrays — per-tissue heterogeneity (reference
    ``DiscontinuousScalar``, helper_classes.py:47-58) is expressed as
    ``params_per_tissue[cell_labels]`` gathers and stays differentiable.
    """

    def __init__(self, mesh, dtype=None):
        if dtype is None:
            dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        self.dim = mesh.dim
        self.n_nodes = mesh.n_nodes
        self.n_cells = mesh.n_cells
        self.npe = mesh.dim + 1
        self.dtype = dtype

        self.cells = jnp.asarray(mesh.cells)
        self.vol = jnp.asarray(mesh.cell_volumes, dtype=dtype)
        self.grads = jnp.asarray(mesh.cell_grads, dtype=dtype)
        self.plan = make_scatter_plan(mesh.cells, mesh.n_nodes)
        self.mass_unit = jnp.asarray(p1_mass_matrix(self.dim), dtype=dtype)
        self.cubic_unit = jnp.asarray(p1_cubic_tensor(self.dim), dtype=dtype)

    # -- gathers ------------------------------------------------------------

    def gather(self, nodal):
        """nodal (n_nodes, ...) -> per-cell (n_cells, npe, ...)."""
        return jnp.take(nodal, self.cells, axis=0)

    # -- scalar reaction-diffusion block ------------------------------------

    def rd_residual(self, c, c_prev, D, rho, dt, source=0.0, conc_max=1.0):
        """Residual of the implicit-Euler Fisher-KPP equation
        (simulation_tumor_growth.py:115-120, von Neumann terms excluded):

          R_i = ∫ c v + dt D ∇c·∇v - c_prev v - dt ρ c(1-c/c_max) v - dt s v dx

        ``D``/``rho``/``source`` scalar or per-cell.  Returns (n_nodes,).
        """
        ce = self.gather(c)  # (nc, npe)
        cpe = self.gather(c_prev)
        v = self.vol
        D = jnp.broadcast_to(jnp.asarray(D, self.dtype), (self.n_cells,))
        rho = jnp.broadcast_to(jnp.asarray(rho, self.dtype), (self.n_cells,))
        source = jnp.broadcast_to(jnp.asarray(source, self.dtype), (self.n_cells,))

        # mass terms: V * M @ (c - c_prev)
        m_diff = v[:, None] * _einsum("ij,cj->ci", self.mass_unit, ce - cpe)
        # stiffness: dt D V (∇c · g_i)
        grad_c = _einsum("cj,cjd->cd", ce, self.grads)  # (nc, d)
        k_term = (dt * D * v)[:, None] * _einsum(
            "cd,cid->ci", grad_c, self.grads
        )
        # logistic: -dt ρ [ V M c - (1/c_max) V T : (c ⊗ c) ]
        m_c = _einsum("ij,cj->ci", self.mass_unit, ce)
        t_cc = _einsum("ijk,cj,ck->ci", self.cubic_unit, ce, ce)
        logistic = (dt * rho * v)[:, None] * (m_c - t_cc / conc_max)
        # source: -dt s V/(d+1)
        src = (dt * source * v / (self.dim + 1))[:, None] * jnp.ones(
            (1, self.npe), self.dtype
        )

        contrib = m_diff + k_term - logistic - src  # (nc, npe)
        return scatter(self.plan, contrib.reshape(-1))

    def rd_mass_stiffness_diag(self, D, rho, dt):
        """Diagonal of (M + dt D K) for Jacobi preconditioning of the
        concentration block (rho unused but kept for interface stability)."""
        v = self.vol
        D = jnp.broadcast_to(jnp.asarray(D, self.dtype), (self.n_cells,))
        mdiag = v[:, None] * jnp.diag(self.mass_unit)[None, :]
        kdiag = (dt * D * v)[:, None] * _einsum(
            "cid,cid->ci", self.grads, self.grads
        )
        return scatter(self.plan, (mdiag + kdiag).reshape(-1))

    # -- vector elasticity block --------------------------------------------

    def elasticity_residual(self, u, c, mu, lam, coupling, body_force=None):
        """Residual of the growth-coupled linear elasticity equation
        (simulation_tumor_growth.py:110-113):

          R_{i,a} = ∫ σ(u):ε(φ_i e_a) - σ(φ_i e_a):(k c I) - b·(φ_i e_a) dx

        Uses σ(v):(k c I) = k c (2μ + d λ) div v.  Returns (n_nodes, d).
        ``u`` is (n_nodes, d); ``c`` (n_nodes,).
        """
        ce = self.gather(c)  # (nc, npe)
        c_int = ce.mean(axis=1) * self.vol  # exact ∫c per cell for P1 c
        return self.elasticity_residual_cint(u, c_int, mu, lam, coupling,
                                             body_force)

    def elasticity_residual_cint(self, u, c_int, mu, lam, coupling,
                                 body_force=None):
        """Elasticity residual with the concentration entering only through
        its per-cell integral ``c_int = ∫_e c dx`` — shared by P1 and P2
        concentration spaces (quad models)."""
        d = self.dim
        ue = self.gather(u)  # (nc, npe, d)
        v = self.vol
        mu = jnp.broadcast_to(jnp.asarray(mu, self.dtype), (self.n_cells,))
        lam = jnp.broadcast_to(jnp.asarray(lam, self.dtype), (self.n_cells,))

        grad_u = _einsum("cja,cjb->cab", ue, self.grads)  # (nc, d, d)
        eps = 0.5 * (grad_u + jnp.swapaxes(grad_u, 1, 2))
        tr_eps = jnp.trace(eps, axis1=1, axis2=2)
        sigma = (
            2.0 * mu[:, None, None] * eps
            + (lam * tr_eps)[:, None, None] * jnp.eye(d, dtype=self.dtype)
        )
        # ∫ σ(u):ε(v): V σ[a,b] g_i[b]
        term_stress = v[:, None, None] * _einsum("cab,cib->cia", sigma, self.grads)
        # coupling: -k (2μ + dλ) ∫ c div v = -k(2μ+dλ) (∫c)_e g_i[a]
        kfac = coupling * (2.0 * mu + d * lam) * c_int  # (nc,)
        term_coupling = -kfac[:, None, None] * self.grads  # (nc, npe=i, d=a)
        contrib = term_stress + term_coupling
        if body_force is not None:
            bf = jnp.broadcast_to(
                jnp.asarray(body_force, self.dtype), (self.n_cells, d)
            )
            contrib = contrib - (v / (d + 1))[:, None, None] * bf[:, None, :]
        out = scatter(self.plan, contrib.reshape(-1, d))
        return out

    def elasticity_diag(self, mu, lam):
        """Diagonal of the elasticity stiffness operator, per (node, comp):
        A[(i,a),(i,a)] = Σ_cells V [ μ(|g_i|² + g_i[a]²) + λ g_i[a]² ]."""
        v = self.vol
        mu = jnp.broadcast_to(jnp.asarray(mu, self.dtype), (self.n_cells,))
        lam = jnp.broadcast_to(jnp.asarray(lam, self.dtype), (self.n_cells,))
        g2 = _einsum("cid,cid->ci", self.grads, self.grads)  # |g_i|^2
        ga2 = self.grads**2  # (nc, npe, d)
        diag = (
            v[:, None, None] * mu[:, None, None] * (g2[:, :, None] + ga2)
            + v[:, None, None] * lam[:, None, None] * ga2
        )
        return scatter(self.plan, diag.reshape(-1, self.dim))

    # -- generic helpers -----------------------------------------------------

    def mass_residual(self, c):
        """∫ c v dx  (consistent mass action), (n_nodes,) -> (n_nodes,)."""
        ce = self.gather(c)
        contrib = self.vol[:, None] * _einsum("ij,cj->ci", self.mass_unit, ce)
        return scatter(self.plan, contrib.reshape(-1))

    def mass_vector_residual(self, u):
        """Vector-field consistent mass action, (n_nodes, d)."""
        ue = self.gather(u)
        contrib = self.vol[:, None, None] * _einsum(
            "ij,cjd->cid", self.mass_unit, ue
        )
        return scatter(self.plan, contrib.reshape(-1, self.dim))

    def lumped_mass(self):
        """Row-sum lumped mass vector (n_nodes,)."""
        contrib = (self.vol / (self.dim + 1))[:, None] * jnp.ones(
            (1, self.npe), self.dtype
        )
        return scatter(self.plan, contrib.reshape(-1))

    def stiffness_residual(self, c, D=1.0):
        """∫ D ∇c·∇v dx."""
        ce = self.gather(c)
        D = jnp.broadcast_to(jnp.asarray(D, self.dtype), (self.n_cells,))
        grad_c = _einsum("cj,cjd->cd", ce, self.grads)
        contrib = (D * self.vol)[:, None] * _einsum(
            "cd,cid->ci", grad_c, self.grads
        )
        return scatter(self.plan, contrib.reshape(-1))

    def integrate_cellwise(self, values_per_cell):
        """∫ f dx with f piecewise constant: Σ f_e V_e."""
        return jnp.sum(values_per_cell * self.vol)

    def integrate_p1(self, c):
        """∫ c dx with c P1 nodal: Σ_e V_e mean(c_e)."""
        return jnp.sum(self.vol * self.gather(c).mean(axis=1))

    def cell_average(self, c):
        """Per-cell average of a P1 field."""
        return self.gather(c).mean(axis=1)

    def cell_gradient(self, c):
        """Per-cell (constant) gradient of a P1 scalar field, (nc, d)."""
        return _einsum("cj,cjd->cd", self.gather(c), self.grads)

    def cell_vector_gradient(self, u):
        """Per-cell displacement gradient ∇u[a,b] = ∂u_a/∂x_b, (nc, d, d)."""
        return _einsum("cja,cjb->cab", self.gather(u), self.grads)


# ---------------------------------------------------------------------------
# Facet (boundary-integral) kernels — von Neumann BCs
# ---------------------------------------------------------------------------


class FacetKernels:
    """Surface-integral kernels over a selected set of boundary facets.

    Implements the von Neumann terms the reference builds via
    ``BoundaryConditions.implement_von_neumann_bc`` (helper_classes.py:861-908):
    ∫_Γ q φ_i ds (scalar flux into subspace 1) and ∫_Γ t·v ds (traction into
    subspace 0).  Facet P1 mass matrix on a (d-1)-simplex with d nodes:
    M^f_ij = A (1+δ_ij)/(d(d+1)).
    """

    def __init__(self, mesh, facet_idx: np.ndarray, n_nodes: int, dtype=jnp.float64):
        self.dim = mesh.dim
        self.dtype = dtype
        fidx = np.asarray(facet_idx, dtype=np.int64)
        self.n_facets = len(fidx)
        self.facet_nodes = jnp.asarray(mesh.boundary_facet_nodes[fidx])
        self.facet_area = jnp.asarray(mesh.boundary_facet_area[fidx], dtype=dtype)
        self.facet_normal = jnp.asarray(
            mesh.boundary_facet_normal[fidx], dtype=dtype
        )
        self.facet_coords = jnp.asarray(
            mesh.points[mesh.boundary_facet_nodes[fidx]], dtype=dtype
        )  # (nf, d, dim)
        self.plan = make_scatter_plan(
            mesh.boundary_facet_nodes[fidx], n_nodes
        )
        d = mesh.dim
        nfn = d  # nodes per facet
        M = np.full((nfn, nfn), 1.0 / (d * (d + 1)))
        M[np.diag_indices(nfn)] *= 2.0
        self.facet_mass_unit = jnp.asarray(M, dtype=dtype)

    def scalar_flux_residual(self, q):
        """∫_Γ q φ_i ds with q constant, per-facet (nf,), or per-facet-node
        (nf, d) values.  Returns (n_nodes,)."""
        q = jnp.asarray(q, self.dtype)
        if q.ndim <= 1:
            qn = jnp.broadcast_to(
                q[..., None] if q.ndim == 1 else q,
                (self.n_facets, self.dim),
            )
        else:
            qn = q
        contrib = self.facet_area[:, None] * _einsum(
            "ij,fj->fi", self.facet_mass_unit, qn
        )
        return scatter(self.plan, contrib.reshape(-1))

    def traction_residual(self, t):
        """∫_Γ t·v ds with t constant (d,), per-facet (nf, d), or per-facet-
        node (nf, d_nodes, d).  Returns (n_nodes, d)."""
        t = jnp.asarray(t, self.dtype)
        if t.ndim <= 2:
            tn = jnp.broadcast_to(
                t if t.ndim == 2 else t[None, :],
                (self.n_facets, t.shape[-1]),
            )[:, None, :].repeat(self.dim, axis=1)
        else:
            tn = t
        contrib = self.facet_area[:, None, None] * _einsum(
            "ij,fja->fia", self.facet_mass_unit, tn
        )
        return scatter(self.plan, contrib.reshape(-1, contrib.shape[-1]))
