"""Matrix-free P1 element assembly: row-gather -> per-cell math -> pull-gather.

This module is the TPU-native replacement for DOLFIN's sparse-matrix assembly
+ PETSc (SURVEY.md §2.2): instead of assembling a CSR matrix, the residual of
the coupled tumor-growth system (reference weak forms at
simulation_tumor_growth.py:110-122 and simulation_tumor_growth_brain_quad.py:83-105)
is evaluated directly:

  1. row-packed gather of nodal values per cell (all fields in one
     multi-column row-gather — ~3x faster per row than scalar gathers)
  2. dense per-cell element math            (VPU-vectorized over cells)
  3. PULL-gather accumulation to nodes      (static incidence tables)

Node accumulation is the transpose gather, not segment_sum/scatter-add:
measured on v5e, TPU scatters run at ~0.13 G elem/s while row-gathers run
~40x faster, so each node gathers its incident element contributions
through a precomputed padded table (``ScatterPlan``).

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
    """Precomputed PULL-gather plan for element->node accumulation.

    TPU rationale (measured on v5e): scatter-adds (and equivalently
    ``segment_sum``, which XLA lowers to scatter on TPU) run at
    ~0.14 G elem/s, while gathers run at ~6-18 G elem/s — a 40-100x gap.
    So node accumulation is reformulated as its transpose: every node
    *gathers* the contributions of its incident (cell, local-node) entries
    through a static padded table.  This is the make-or-break change for
    matrix-free FEM on unstructured meshes (SURVEY §7 'hard parts').

    pull_table (n_segments, K)  entry index per incident slot, where
                                n_entries serves as the zero-pad slot
    n_entries   int             number of real entries (static)
    n_segments  int             number of nodes (static)
    """

    pull_table: np.ndarray
    n_entries: int
    n_segments: int


def make_scatter_plan(index_map: np.ndarray, n_segments: int) -> ScatterPlan:
    flat = np.asarray(index_map, dtype=np.int64).ravel()
    n_entries = len(flat)
    order = np.argsort(flat, kind="stable")
    sorted_ids = flat[order]
    starts = np.searchsorted(sorted_ids, np.arange(n_segments))
    ends = np.searchsorted(sorted_ids, np.arange(n_segments) + 1)
    counts = ends - starts
    K = int(counts.max()) if n_segments else 0
    # padded slots point at the sentinel entry (index n_entries -> zero row)
    table = np.full((n_segments, max(K, 1)), n_entries, dtype=np.int32)
    # vectorized fill: position of each sorted entry within its segment
    within = np.arange(n_entries) - starts[sorted_ids]
    table[sorted_ids, within] = order
    return ScatterPlan(
        pull_table=table, n_entries=n_entries, n_segments=int(n_segments)
    )


def make_scatter_plan_dropping(index_map: np.ndarray,
                               n_segments: int) -> ScatterPlan:
    """Like :func:`make_scatter_plan`, but entries whose id is
    ``>= n_segments`` are silently dropped (they claim no slot and do not
    inflate the per-segment width K).

    Used by the node-sharded unstructured path (parallel/bellshard.py):
    each device accumulates only into its OWNED rows; contributions its
    cells make to neighbor-owned rows are computed redundantly by the
    owner (overlap assembly), so the local plan simply drops them."""
    flat = np.asarray(index_map, dtype=np.int64).ravel()
    n_entries = len(flat)
    order = np.argsort(flat, kind="stable")
    sorted_ids = flat[order]
    starts = np.searchsorted(sorted_ids, np.arange(n_segments))
    ends = np.searchsorted(sorted_ids, np.arange(n_segments) + 1)
    counts = ends - starts
    K = int(counts.max()) if n_segments else 0
    table = np.full((n_segments, max(K, 1)), n_entries, dtype=np.int32)
    keep = sorted_ids < n_segments
    within = np.arange(n_entries) - starts[
        np.minimum(sorted_ids, max(n_segments - 1, 0))
    ]
    table[sorted_ids[keep], within[keep]] = order[keep]
    return ScatterPlan(
        pull_table=table, n_entries=n_entries, n_segments=int(n_segments)
    )


def pull_accumulate(pull_table_flat, n_segments: int, contrib_flat,
                    chunk_rows: int = None):
    """Core pull-gather accumulation: pad contributions with one zero row
    (the sentinel target), gather (n_segments * K) incident entries,
    reduce over K.  Shared by :func:`scatter` and the shard-mapped kernels
    (parallel/shard.py).

    TPU detail (measured): row-gathers of width >= 2 run ~3x faster per row
    than scalar gathers per element, so 1-D contributions are pulled as
    duplicated width-2 rows (the extra column costs streaming bandwidth,
    the row form saves gather time).

    ``chunk_rows``: process the segments in row chunks under ``lax.map``.
    The gathered (n_segments, K, w) intermediate carries its small tail on
    LANES — the TPU pads w to 128 in any materialized layout, and at P2
    flagship scale (7.4M off-diag pairs, K=6) XLA's AOT planner allocates
    the padded buffer outright: f32[5, 7404096, 6] plans as 18.9 GB > HBM
    (the round-5 quad-flagship compile OOM).  Chunking bounds the
    transient to chunk_rows*K*128*4 bytes regardless of fusion."""
    c = contrib_flat
    was_1d = c.ndim == 1
    if was_1d:
        c = jnp.stack([c, c], axis=-1)
    pad_width = [(0, 1)] + [(0, 0)] * (c.ndim - 1)
    padded = jnp.pad(c, pad_width)
    K = pull_table_flat.size // max(n_segments, 1)
    if chunk_rows and n_segments > chunk_rows:
        import jax

        n_chunks = -(-n_segments // chunk_rows)
        sentinel = padded.shape[0] - 1  # the zero row
        pad_len = n_chunks * chunk_rows * K - pull_table_flat.size
        tbl = jnp.concatenate([
            pull_table_flat.ravel(),
            jnp.full((pad_len,), sentinel, pull_table_flat.dtype),
        ]).reshape(n_chunks, chunk_rows * K)

        def body(idx_chunk):
            pulled = jnp.take(padded, idx_chunk, axis=0)
            red = jnp.sum(
                pulled.reshape((chunk_rows, K) + c.shape[1:]), axis=1
            )
            # finalize the duplicated width-2 rows INSIDE the body: the
            # lax.map output buffer is materialized as stacked chunks, and
            # a trailing width-2 lane dim would pad 2 -> 128 (64x)
            return red[..., 0] if was_1d else red

        out = jax.lax.map(body, tbl).reshape(
            (n_chunks * chunk_rows,) + (() if was_1d else c.shape[1:])
        )[:n_segments]
        return out
    pulled = jnp.take(padded, pull_table_flat, axis=0)
    out = jnp.sum(pulled.reshape((n_segments, -1) + c.shape[1:]), axis=1)
    return out[..., 0] if was_1d else out


def scatter(plan: ScatterPlan, contrib_flat):
    """Accumulate per-entry contributions into segments (nodes) by
    pull-gather through the plan's static incidence table.

    ``contrib_flat``: (n_entries, ...) — e.g. element residual contributions
    flattened over (cell, local node)."""
    return pull_accumulate(
        jnp.asarray(plan.pull_table).ravel(), plan.n_segments, contrib_flat
    )


# ---------------------------------------------------------------------------
# P1 kernels for the coupled tumor-growth system
# ---------------------------------------------------------------------------



# ---------------------------------------------------------------------------
# Shared element-contribution math (SoA layout: cell axis last)
# Used by both P1Kernels and the shard-mapped kernels.
# ---------------------------------------------------------------------------


def rd_element_contrib(ce, cpe, gT, vol, D, rho, dt, source, conc_max, m0, t0,
                       dim):
    """Fisher-KPP implicit-Euler element contributions (npe, nc).

    ce/cpe (npe, nc), gT (npe, d, nc), vol (nc,); D/rho/source scalar or
    (nc,).  Mass and cubic terms use the closed forms
    (M c)_i = m0 (S + c_i), (T:cc)_i = t0 (S^2 + 2 c_i S + Q + 2 c_i^2).
    """
    m_diff = m0 * (jnp.sum(ce - cpe, axis=0) + (ce - cpe))
    grad_c = jnp.sum(ce[:, None, :] * gT, axis=0)  # (d, nc)
    k_term = jnp.sum(grad_c[None] * gT, axis=1)  # (npe, nc)
    S = jnp.sum(ce, axis=0)
    Q = jnp.sum(ce * ce, axis=0)
    m_c = m0 * (S + ce)
    t_cc = t0 * (S * S + Q + 2.0 * ce * (S + ce))
    return vol * (
        m_diff
        + (dt * D) * k_term
        - (dt * rho) * (m_c - t_cc / conc_max)
        - (dt * source / (dim + 1))
    )


def rd_diag_contrib(gT, vol, D, dt, m0, dim):
    """Jacobi diagonal of (M + dt D K), element contributions (npe, nc)."""
    mdiag = (2.0 * m0) * vol
    g2 = jnp.sum(gT * gT, axis=1)  # (npe, nc)
    return jnp.broadcast_to(mdiag, g2.shape) + (dt * D) * vol * g2


def elasticity_element_contrib(ue, c_int, gT, vol, mu, lam, coupling, bf_T,
                               dim):
    """Growth-coupled elasticity element contributions (npe, d, nc).

    ue (d, npe, nc), c_int (nc,) = per-cell ∫c, gT (npe, d, nc),
    bf_T None | (d, 1) | (d, nc)."""
    d = dim
    grad_u = jnp.sum(ue[:, None, :, :] * gT.transpose(1, 0, 2)[None], axis=2)
    eps = 0.5 * (grad_u + jnp.swapaxes(grad_u, 0, 1))  # (d, d, nc)
    tr_eps = jnp.trace(eps, axis1=0, axis2=1)
    eye = jnp.eye(d, dtype=eps.dtype)[:, :, None]
    sigma = 2.0 * mu * eps + (lam * tr_eps) * eye
    term_stress = vol * jnp.sum(gT[:, None, :, :] * sigma[None], axis=2)
    kfac = coupling * (2.0 * mu + d * lam) * c_int
    contrib = term_stress - kfac * gT
    if bf_T is not None:
        contrib = contrib - (vol / (d + 1)) * bf_T[None]
    return contrib


def elasticity_diag_contrib(gT, vol, mu, lam):
    """Elasticity Jacobi diagonal, element contributions (npe, d, nc)."""
    g2 = jnp.sum(gT * gT, axis=1)  # (npe, nc)
    ga2 = gT**2  # (npe, d, nc)
    return vol * (mu * (g2[:, None, :] + ga2) + lam * ga2)


class P1Kernels:
    """Per-mesh matrix-free kernels for the mechanically-coupled
    Fisher-KPP + linear-elasticity system.

    TPU layout note (structure-of-arrays): TPU vector lanes are 128-wide on
    the trailing axis.  Arrays shaped (n_cells, npe) with npe = 3..4 waste
    ~97% of each vector register, so all internal per-cell tensors put the
    *cell axis last*: cells (npe, nc), gradients (npe, d, nc), element
    contributions (npe, nc).  Measured ~10x residual-evaluation speedup on
    v5e vs the cell-major layout.  External array layouts are unchanged
    (nodal fields (n_nodes,), (n_nodes, d); per-cell outputs (nc, ...)).

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

        self.cells = jnp.asarray(mesh.cells)  # (nc, npe) AoS view (compat)
        self.cells_T = jnp.asarray(np.ascontiguousarray(mesh.cells.T))  # (npe, nc)
        self.vol = jnp.asarray(mesh.cell_volumes, dtype=dtype)  # (nc,)
        self.grads_T = jnp.asarray(
            np.ascontiguousarray(np.moveaxis(mesh.cell_grads, 0, -1)),
            dtype=dtype,
        )  # (npe, d, nc)
        # scatter plan over the transposed (npe-major) entry order
        self.plan = make_scatter_plan(
            np.ascontiguousarray(mesh.cells.T), mesh.n_nodes
        )
        # flat entry->node map for row-packed gathers (npe-major)
        self.cells_flat = jnp.asarray(
            np.ascontiguousarray(mesh.cells.T).ravel()
        )
        self.mass_unit = jnp.asarray(p1_mass_matrix(self.dim), dtype=dtype)
        self.cubic_unit = jnp.asarray(p1_cubic_tensor(self.dim), dtype=dtype)
        import math

        # closed-form contraction constants (unit-volume simplex):
        #   (M c)_i = m0 (S + c_i),           m0 = 1/((d+1)(d+2))
        #   (T:cc)_i = t0 (S^2 + 2 c_i S + Q + 2 c_i^2),  t0 = d!/(d+3)!
        # with S = sum_j c_j, Q = sum_j c_j^2 — these avoid the
        # (npe, npe[, npe], nc) intermediates entirely.
        self._m0 = 1.0 / ((self.dim + 1) * (self.dim + 2))
        self._t0 = math.factorial(self.dim) / math.factorial(self.dim + 3)

    def _mass_apply(self, xe):
        """(npe, nc) -> (npe, nc): unit-simplex mass matrix action."""
        return self._m0 * (jnp.sum(xe, axis=0) + xe)

    def _cubic_apply(self, ce):
        """(npe, nc) -> (npe, nc): (T : c⊗c)_i closed form."""
        S = jnp.sum(ce, axis=0)
        Q = jnp.sum(ce * ce, axis=0)
        return self._t0 * (S * S + Q + 2.0 * ce * (S + ce))

    # -- gathers ------------------------------------------------------------

    def gather(self, nodal):
        """nodal (n_nodes, ...) -> per-cell (n_cells, npe, ...) (AoS view,
        for host-side/postprocess use)."""
        return jnp.take(nodal, self.cells, axis=0)

    def _gather_T(self, c):
        """scalar nodal (n_nodes,) -> (npe, nc).

        Implemented as a duplicated width-2 row-gather: on TPU, row-gathers
        (width >= 2) run ~3x faster per row than scalar gathers per
        element, which dominates the matrix-free unstructured path."""
        ge = self._gather_rows(jnp.stack([c, c], axis=-1))
        return ge[..., 0]

    def _gather_rows(self, pack):
        """(n_nodes, w) packed fields -> (npe, nc, w) per-entry rows — one
        row-gather fetches every packed field at once."""
        return jnp.take(pack, self.cells_flat, axis=0).reshape(
            self.npe, -1, pack.shape[1]
        )

    def _cellco(self, x):
        """Coefficient -> broadcastable over (nc,)."""
        return jnp.asarray(x, self.dtype)

    def _scatter_scalar(self, contrib):
        """(npe, nc) element contributions -> (n_nodes,)."""
        return scatter(self.plan, contrib.reshape(-1))

    def _scatter_vector(self, contrib):
        """(npe, d, nc) element contributions -> (n_nodes, d): one
        row-packed pull over all components (npe-major entry order)."""
        ent = jnp.moveaxis(contrib, 1, -1).reshape(-1, self.dim)
        return scatter(self.plan, ent)

    # -- scalar reaction-diffusion block ------------------------------------

    def rd_residual(self, c, c_prev, D, rho, dt, source=0.0, conc_max=1.0):
        """Residual of the implicit-Euler Fisher-KPP equation
        (simulation_tumor_growth.py:115-120, von Neumann terms excluded):

          R_i = ∫ c v + dt D ∇c·∇v - c_prev v - dt ρ c(1-c/c_max) v - dt s v dx

        ``D``/``rho``/``source`` scalar or per-cell.  Returns (n_nodes,).
        """
        g = self.grads_T
        v = self.vol
        D = self._cellco(D)
        rho = self._cellco(rho)
        source = self._cellco(source)

        # one packed row-gather for both fields
        ge = self._gather_rows(jnp.stack([c, c_prev], axis=-1))
        ce = ge[..., 0]  # (npe, nc)
        cpe = ge[..., 1]
        m_diff = self._mass_apply(ce - cpe)  # (npe, nc)
        grad_c = jnp.sum(ce[:, None, :] * g, axis=0)  # (d, nc)
        k_term = jnp.sum(grad_c[None] * g, axis=1)  # (npe, nc)
        m_c = self._mass_apply(ce)
        t_cc = self._cubic_apply(ce)
        contrib = v * (
            m_diff
            + (dt * D) * k_term
            - (dt * rho) * (m_c - t_cc / conc_max)
            - (dt * source / (self.dim + 1))
        )
        return self._scatter_scalar(contrib)

    @property
    def _quad_pull_cells(self):
        """(n, K) CELL index per incident slot (sentinel nc): the per-cell
        view of the entry pull table — entries are npe-major, so
        cell = entry % nc (sentinel npe*nc maps to the pad row nc)."""
        if not hasattr(self, "_quad_pull_cells_cache"):
            pt = np.asarray(self.plan.pull_table, dtype=np.int64)
            nc = self.n_cells
            # cache NUMPY, convert per call: a jnp constant created during
            # one jit trace is a tracer there — caching it leaks it into
            # later traces (UnexpectedTracerError)
            self._quad_pull_cells_cache = np.where(
                pt == self.plan.n_entries, nc, pt % nc
            ).astype(np.int32)
        return jnp.asarray(self._quad_pull_cells_cache)

    def rd_quad_residual(self, c, rho, dt, conc_max=1.0):
        """Only the QUADRATIC logistic term of :meth:`rd_residual`:

          q_i = + dt ρ / c_max ∫ c² φ_i dx

        — the one part of the Fisher-KPP residual that cannot ride the
        assembled supernode halo-ELL matvecs (ops/bell.py build_bell_mass
        docstring).

        Factored pull (measured 7.9 -> ~4 ms at 197k tets): the per-entry
        contribution vol ρ t0 (S² + Q + 2 c_i (S + c_i)) splits into
        per-CELL scalars [ρ vol (S²+Q), ρ vol S, ρ vol] pulled once as
        width-3 rows, with the c_i-dependent factors applied per NODE
        after the reduction — q_i = (dt t0/c_max)(A_i + 2 c_i (B_i +
        c_i C_i)).  Exactly the same sum, re-associated; the pull operand
        shrinks from (npe·nc) entry rows to (nc, 3) packed cell rows."""
        rho = self._cellco(rho)
        ce = self._gather_T(c)  # (npe, nc)
        S = jnp.sum(ce, axis=0)
        Q = jnp.sum(ce * ce, axis=0)
        rv = rho * self.vol
        pack = jnp.stack([rv * (S * S + Q), rv * S, rv], axis=-1)  # (nc, 3)
        packp = jnp.pad(pack, ((0, 1), (0, 0)))
        pulled = jnp.take(packp, self._quad_pull_cells.ravel(), axis=0)
        agg = jnp.sum(
            pulled.reshape(self.n_nodes, -1, 3), axis=1
        )  # (n, 3)
        return (dt / conc_max) * self._t0 * (
            agg[:, 0] + 2.0 * c * (agg[:, 1] + c * agg[:, 2])
        )

    def rd_mass_stiffness_diag(self, D, rho, dt):
        """Diagonal of (M + dt D K) for Jacobi preconditioning of the
        concentration block (rho unused but kept for interface stability)."""
        g = self.grads_T
        v = self.vol
        D = self._cellco(D)
        mdiag = jnp.diag(self.mass_unit)[:, None] * v[None]  # (npe, nc)
        g2 = jnp.sum(g * g, axis=1)  # (npe, nc)
        kdiag = (dt * D) * v * g2
        return self._scatter_scalar(mdiag + kdiag)

    # -- vector elasticity block --------------------------------------------

    def elasticity_residual(self, u, c, mu, lam, coupling, body_force=None):
        """Residual of the growth-coupled linear elasticity equation
        (simulation_tumor_growth.py:110-113):

          R_{i,a} = ∫ σ(u):ε(φ_i e_a) - σ(φ_i e_a):(k c I) - b·(φ_i e_a) dx

        Uses σ(v):(k c I) = k c (2μ + d λ) div v.  Returns (n_nodes, d).
        ``u`` is (n_nodes, d); ``c`` (n_nodes,).
        """
        # one packed row-gather fetches u AND c per entry
        d = self.dim
        ge = self._gather_rows(jnp.concatenate([u, c[:, None]], axis=1))
        ue = jnp.transpose(ge[..., :d], (2, 0, 1))  # (d, npe, nc)
        c_int = ge[..., d].mean(axis=0) * self.vol  # exact ∫c per cell (P1)
        return self._elasticity_from_ue(ue, c_int, mu, lam, coupling,
                                        body_force)

    def elasticity_residual_cint(self, u, c_int, mu, lam, coupling,
                                 body_force=None):
        """Elasticity residual with the concentration entering only through
        its per-cell integral ``c_int = ∫_e c dx`` — shared by P1 and P2
        concentration spaces (quad models)."""
        ue = jnp.transpose(self._gather_rows(u), (2, 0, 1))  # (d, npe, nc)
        return self._elasticity_from_ue(ue, c_int, mu, lam, coupling,
                                        body_force)

    def _elasticity_from_ue(self, ue, c_int, mu, lam, coupling,
                            body_force=None):
        d = self.dim
        g = self.grads_T  # (npe, d, nc)
        v = self.vol
        mu = self._cellco(mu)
        lam = self._cellco(lam)
        # grad_u[a, b] = sum_j ue[a, j] g[j, b]
        grad_u = jnp.sum(ue[:, None, :, :] * g.transpose(1, 0, 2)[None], axis=2)
        # shapes: ue (a, 1, j->npe, nc) * g' (1, b->d, j->npe? ...) — see below
        eps = 0.5 * (grad_u + jnp.swapaxes(grad_u, 0, 1))  # (d, d, nc)
        tr_eps = jnp.trace(eps, axis1=0, axis2=1)  # (nc,)
        eye = jnp.eye(d, dtype=eps.dtype)[:, :, None]
        sigma = 2.0 * mu * eps + (lam * tr_eps) * eye  # (d, d, nc)
        # term_stress[i, a] = v * sum_b sigma[a, b] g[i, b]
        term_stress = v * jnp.sum(
            g[:, None, :, :] * sigma[None, :, :, :], axis=2
        )  # (npe, d, nc)
        kfac = coupling * (2.0 * mu + d * lam) * c_int  # (nc,)
        contrib = term_stress - kfac * g
        if body_force is not None:
            bf = jnp.asarray(body_force, self.dtype)
            if bf.ndim == 1:
                bf_T = bf[:, None]  # (d, 1)
            else:
                bf_T = bf.T  # (d, nc)
            contrib = contrib - (v / (d + 1)) * bf_T[None]
        return self._scatter_vector(contrib)

    def elasticity_diag(self, mu, lam):
        """Diagonal of the elasticity stiffness operator, per (node, comp):
        A[(i,a),(i,a)] = Σ_cells V [ μ(|g_i|² + g_i[a]²) + λ g_i[a]² ]."""
        g = self.grads_T
        v = self.vol
        mu = self._cellco(mu)
        lam = self._cellco(lam)
        g2 = jnp.sum(g * g, axis=1)  # (npe, nc)
        ga2 = g**2  # (npe, d, nc)
        diag = v * (mu * (g2[:, None, :] + ga2) + lam * ga2)
        return self._scatter_vector(diag)

    def elasticity_diag_blocks(self, mu, lam):
        """Per-node (d, d) diagonal blocks of the elasticity operator:
        A[(i,a),(i,b)] = Σ_cells V [ μ(g_i[a] g_i[b] + δ_ab |g_i|²)
                                     + λ g_i[a] g_i[b] ].

        Assembled by scatter (any mesh — the gather-path analogue of the
        stencil path's zero-offset plane).  Feeds
        :meth:`block_jacobi_inverse_blocks`: a far stronger preconditioner
        than the scalar diagonal for near-incompressible elasticity
        (nu ~ 0.45, reference brain configs)."""
        g = self.grads_T  # (npe, d, nc)
        v = self.vol
        mu = self._cellco(mu)
        lam = self._cellco(lam)
        gg = g[:, :, None, :] * g[:, None, :, :]  # (npe, a, b, nc)
        g2 = jnp.sum(g * g, axis=1)  # (npe, nc)
        eye = jnp.eye(self.dim, dtype=self.dtype)[None, :, :, None]
        contrib = v * (mu * (gg + eye * g2[:, None, None, :]) + lam * gg)
        # scatter (npe, a, b, nc) -> (n_nodes, d, d); the plan is npe-major
        # (built over cells.T), so entries flatten as (npe, nc, ...)
        d = self.dim
        flat = jnp.moveaxis(contrib, -1, 1).reshape(-1, d * d)
        out = scatter(self.plan, flat)
        return out.reshape(-1, d, d)

    def block_jacobi_inverse_blocks(self, B, mask=None):
        """Invert per-node (d, d) diagonal blocks; masked (Dirichlet) nodes
        get identity blocks.  Returns (n_nodes, d, d)."""
        d = self.dim
        if mask is not None:
            m = jnp.any(mask, axis=1)
            eye = jnp.eye(d, dtype=B.dtype)[None]
            B = jnp.where(m[:, None, None], eye, B)
        return jnp.linalg.inv(B)

    def apply_block_jacobi(self, Binv, r):
        """r (n, d) -> (n, d) per-node block solve."""
        return jnp.sum(Binv * r[:, None, :], axis=2)

    # -- generic helpers -----------------------------------------------------

    def mass_residual(self, c):
        """∫ c v dx  (consistent mass action), (n_nodes,) -> (n_nodes,)."""
        ce = self._gather_T(c)
        return self._scatter_scalar(self.vol * self._mass_apply(ce))

    def mass_vector_residual(self, u):
        """Vector-field consistent mass action, (n_nodes, d)."""
        ue = self._gather_rows(u)  # (npe, nc, d)
        contrib = self.vol[None, :, None] * self._m0 * (
            jnp.sum(ue, axis=0, keepdims=True) + ue
        )
        return scatter(self.plan, contrib.reshape(-1, self.dim))

    def lumped_mass(self):
        """Row-sum lumped mass vector (n_nodes,)."""
        contrib = jnp.broadcast_to(
            self.vol / (self.dim + 1), (self.npe, self.n_cells)
        ).astype(self.dtype)
        return self._scatter_scalar(contrib)

    def stiffness_residual(self, c, D=1.0):
        """∫ D ∇c·∇v dx."""
        g = self.grads_T
        ce = self._gather_T(c)
        D = self._cellco(D)
        grad_c = jnp.sum(ce[:, None, :] * g, axis=0)
        contrib = (D * self.vol) * jnp.sum(grad_c[None] * g, axis=1)
        return self._scatter_scalar(contrib)

    def integrate_cellwise(self, values_per_cell):
        """∫ f dx with f piecewise constant: Σ f_e V_e."""
        return jnp.sum(values_per_cell * self.vol)

    def integrate_p1(self, c):
        """∫ c dx with c P1 nodal: Σ_e V_e mean(c_e)."""
        return jnp.sum(self.vol * self._gather_T(c).mean(axis=0))

    def cell_average(self, c):
        """Per-cell average of a P1 field, (nc,)."""
        return self._gather_T(c).mean(axis=0)

    def cell_integral(self, c):
        """∫_e c dx per cell, (nc,) — exact for P1 c (V_e · mean of vertex
        values).  Masked sums of this implement the reference's
        subdomain-restricted ``dx(i)`` measures (helper_classes.py:539-562)."""
        return self.vol * self._gather_T(c).mean(axis=0)

    def cell_gradient(self, c):
        """Per-cell (constant) gradient of a P1 scalar field, (nc, d)."""
        ce = self._gather_T(c)
        return jnp.sum(ce[:, None, :] * self.grads_T, axis=0).T

    def cell_vector_gradient(self, u):
        """Per-cell displacement gradient ∇u[a,b] = ∂u_a/∂x_b, (nc, d, d)."""
        ue = jnp.transpose(self._gather_rows(u), (2, 0, 1))  # (d, npe, nc)
        grad_u = jnp.sum(ue[:, None, :, :] * self.grads_T.transpose(1, 0, 2)[None],
                         axis=2)
        return jnp.moveaxis(grad_u, -1, 0)


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

    def __init__(self, mesh, facet_idx: np.ndarray, n_nodes: int, dtype=jnp.float64,
                 facet_nodes: np.ndarray = None):
        """Build over exterior facets (``facet_idx`` into the mesh's
        boundary facet arrays) or over an explicit facet-node array
        (``facet_nodes`` (nf, dim), e.g. interior inter-tissue facets for
        the 'dS' measure — exceeds the reference, which binds
        subdomain_boundary BCs to the empty exterior intersection,
        helper_classes.py:747-767).  With ``facet_nodes``, area and normal
        come from the facet geometry; the normal's sign is arbitrary
        (interior facets have no outward side)."""
        self.dim = mesh.dim
        self.dtype = dtype
        if facet_nodes is None:
            fidx = np.asarray(facet_idx, dtype=np.int64)
            fnodes = mesh.boundary_facet_nodes[fidx]
            area = mesh.boundary_facet_area[fidx]
            normal = mesh.boundary_facet_normal[fidx]
        else:
            fnodes = np.asarray(facet_nodes, dtype=np.int64)
            coords = mesh.points[fnodes]  # (nf, dim, dim)
            if mesh.dim == 2:
                e = coords[:, 1] - coords[:, 0]
                area = np.linalg.norm(e, axis=1)
                normal = np.stack([e[:, 1], -e[:, 0]], axis=1)
            elif mesh.dim == 3:
                e1 = coords[:, 1] - coords[:, 0]
                e2 = coords[:, 2] - coords[:, 0]
                cr = np.cross(e1, e2)
                area = 0.5 * np.linalg.norm(cr, axis=1)
                normal = cr
            else:
                raise NotImplementedError("facet geometry needs dim 2 or 3")
            normal = normal / np.maximum(
                np.linalg.norm(normal, axis=1, keepdims=True), 1e-300
            )
        self.n_facets = len(fnodes)
        self.facet_nodes = jnp.asarray(fnodes)
        self.facet_area = jnp.asarray(area, dtype=dtype)
        self.facet_normal = jnp.asarray(normal, dtype=dtype)
        self.facet_coords = jnp.asarray(
            mesh.points[fnodes], dtype=dtype
        )  # (nf, d, dim)
        # where callables are evaluated (uniform interface with P2FacetKernels)
        self.value_coords = self.facet_coords
        self.plan = make_scatter_plan(fnodes, n_nodes)
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
