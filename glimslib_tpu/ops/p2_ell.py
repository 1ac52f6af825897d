"""Assembled supernode halo-ELL operators for the P2 concentration space.

The reference's production workflow drives the QUAD model family
(``image_based_optimization.py:26`` imports ``TumorGrowthBrain`` from
``simulation_tumor_growth_brain_quad``), whose concentration element is
degree-2 Lagrange (``simulation_tumor_growth_quad.py:69``).  Round 3 left
that model on the matrix-free quadrature path: every Newton-CG iteration
jvp'd the gather+scatter residual of ops/p2.py (VERDICT r3 #6).  This
module assembles the P2 rd Jacobian into the same supernode halo-ELL
layout the P1 path uses (ops/bell.py, generic over the dof space), so the
concentration solves become streamed batched matvecs.

Exactness: the Jacobian entries are integrated with the SAME quadrature
rule as the residual (degree 6), but without any per-cell quadrature loop —
the affine geometry map factors every entry into constant reference
tensors contracted with small per-cell geometry factors:

    M^e_ij            = det_e * M0[i, j]
    (dt D K)^e_ij     = dt D_e * det_e * sum_ab T[i, j, a, b] (A_e A_e^T)_ab
    W(c)^e_ij         = det_e * sum_k c^e_k C[i, j, k]

with M0 = Σ_q w φiφj, T = Σ_q w ∇̂φi ⊗ ∇̂φj, C = Σ_q w φiφjφk tabulated
once on the reference simplex (host, f64).  The assembled operator's
matvec therefore equals the jvp of ``P2Kernels.rd_residual`` to float
round-off — the IFT adjoint (solvers/coupled.py step_bwd) keeps exact
gradients.

The chord (modified-Newton) source replaces the per-step consistent
logistic correction with its LUMPED row sums (Σ_j W(c)_ij = Σ_q w det c φi
= det Σ_k c_k M0[i, k] since Σ_j φj = 1) — Newton still converges the
exact residual, so solutions are unchanged (ops/bell.py
build_bell_rd_wc_lumped rationale).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from glimslib_tpu.ops.assembly import pull_accumulate
from glimslib_tpu.ops.bell import BellPlan


@functools.lru_cache(maxsize=None)
def p2_ref_tensors(dim: int, quad_degree: int = 6):
    """(M0, T, C) constant reference-simplex tensors (numpy f64):
    M0 (npe, npe), T (npe, npe, d, d), C (npe, npe, npe)."""
    from glimslib_tpu.core.elements import P2Element, simplex_quadrature

    qp, qw = simplex_quadrature(dim, quad_degree)
    vals, rgrads = P2Element(dim).tabulate(qp)  # (nq, npe), (nq, npe, d)
    M0 = np.sum(qw[:, None, None] * vals[:, :, None] * vals[:, None, :],
                axis=0)
    T = np.sum(
        qw[:, None, None, None, None]
        * rgrads[:, :, None, :, None] * rgrads[:, None, :, None, :],
        axis=0,
    )  # (i, j, a, b)
    C = np.sum(
        qw[:, None, None, None]
        * vals[:, :, None, None] * vals[:, None, :, None]
        * vals[:, None, None, :],
        axis=0,
    )  # (i, j, k)
    return M0, T, C


def make_p2_plan(p2k, s: int = 32):
    """Supernode halo-ELL plan over the P2 dof space (interleaved-Morton
    dof layout, ops/p2.py p2_dof_layout: vertex and edge dofs numbered
    together in spatial order, so contiguous supernode blocks stay
    compact — see the layout table in docs/numerics.md).

    The halo is CHUNK-ALIGNED by default (``GLIMS_P2_HALO_CHUNK``, 4):
    the P2 matvec is halo-gather-row bound, and on the interleaved dof
    space externals form consecutive-id runs, so gathering aligned
    4-dof rows cuts the dominant per-CG-iteration cost ~3x for ~30-40%
    more zero-padded table slots (ops/bell.py BellPlan halo_chunk)."""
    import os

    return BellPlan(
        conn=np.asarray(p2k.cell_dofs), n=p2k.n_dofs, s=s, prefix="_P2B",
        halo_chunk=int(os.environ.get("GLIMS_P2_HALO_CHUNK", "4")),
    )


def _geom(p2k, dtype):
    """(AAT (nc, d, d), det (nc,)) per-cell geometry factors."""
    A = jnp.asarray(p2k.A, dtype)  # (nc, d, d): rows are ref gradients
    AAT = jnp.sum(A[:, :, None, :] * A[:, None, :, :], axis=3)
    return AAT, jnp.asarray(p2k.detJ, dtype)


def _const_entries(p2k, D, rho, dt, dtype):
    """(npe, npe, nc) entries of M + dt D K - dt rho M."""
    d = p2k.dim
    npe = p2k.npe
    nc = p2k.n_cells
    M0_, T_, _ = p2_ref_tensors(d)
    M0 = jnp.asarray(M0_, dtype)
    T = jnp.asarray(T_.reshape(npe * npe, d * d), dtype)
    AAT, det = _geom(p2k, dtype)
    AAT2 = AAT.reshape(nc, d * d)
    D = jnp.broadcast_to(jnp.asarray(D, dtype), (nc,))
    rho = jnp.broadcast_to(jnp.asarray(rho, dtype), (nc,))
    # K entries: chunked mul+reduce over the d*d axis (a (npe^2, nc, d^2)
    # intermediate would run to ~700 MB at flagship; never einsum for
    # small contractions — CLAUDE.md)
    K = jnp.zeros((npe * npe, nc), dtype)
    for ab in range(d * d):
        K = K + T[:, ab, None] * AAT2[None, :, ab]
    ent = (
        ((1.0 - dt * rho) * det)[None, None, :] * M0[:, :, None]
        + (dt * D * det)[None, None, :] * K.reshape(npe, npe, nc)
    )
    return ent


def build_p2_rd_const(plan: BellPlan, p2k, D, rho, dt, dtype, tables=None):
    """(nb, s, Kh) halo-ELL values of M + dt D K - dt rho M over P2."""
    from glimslib_tpu.ops.bell import assemble_maybe_chunked

    return assemble_maybe_chunked(
        plan, _const_entries(p2k, D, rho, dt, dtype), tables
    )


def build_p2_rd_wc(plan: BellPlan, p2k, c, rho, dt, conc_max, dtype,
                   tables=None):
    """(nb, s, Kh) values of the logistic Jacobian correction
    +2 dt rho W(c)/c_max with W(c)_ij = ∫ c φi φj dx."""
    npe = p2k.npe
    nc = p2k.n_cells
    _, _, C_ = p2_ref_tensors(p2k.dim)
    C = jnp.asarray(C_, dtype)
    _, det = _geom(p2k, dtype)
    rho = jnp.broadcast_to(jnp.asarray(rho, dtype), (nc,))
    ceT = p2k.gather_T(jnp.asarray(c, dtype))  # (npe, nc) cell-last
    W = jnp.zeros((npe, npe, nc), dtype)
    for k in range(npe):  # chunked over k: (npe, npe, nc) per term
        W = W + C[:, :, k, None] * ceT[k][None, None, :]
    ent = ((2.0 * dt / conc_max) * rho * det)[None, None, :] * W
    from glimslib_tpu.ops.bell import assemble_maybe_chunked

    return assemble_maybe_chunked(plan, ent, tables)


def p2_mass_entries(p2k, dtype):
    """(npe, npe, nc) P2 consistent-mass entries det_e * M0[i, j]."""
    M0_, _, _ = p2_ref_tensors(p2k.dim)
    M0 = jnp.asarray(M0_, dtype)
    _, det = _geom(p2k, dtype)
    return M0[:, :, None] * det[None, None, :]


def p2_cubic_residual(plan: BellPlan, p2k, c, rho, dt, conc_max, dtype,
                      tables=None):
    """(n_dofs,) quadratic logistic residual term
    q_i = + dt ρ / c_max ∫ c² φ_i dx for P2 c, by the factored reference
    tensor: q^e_i = det_e Σ_jk c_j c_k C[i,j,k] with C = Σ_q w φφφ (the
    SAME degree-6 rule as P2Kernels.rd_residual, so the streamed residual
    equals the quadrature evaluation to round-off).  Accumulated per dof
    through the plan's diag pull; the contraction runs as npe chunked
    (nc, npe) fma passes (never einsum — CLAUDE.md)."""
    nc, npe = p2k.n_cells, p2k.npe
    _, det = _geom(p2k, dtype)
    rho = jnp.broadcast_to(jnp.asarray(rho, dtype), (nc,))
    # quadrature form, CELL AXIS LAST: q_i = Σ_q w φ_i(q) c(q)² — exactly
    # Σ_jk C[i,j,k] c_j c_k with C = Σ_q w φφφ (same degree-6 rule), but
    # without the (nc, npe, npe) lane-padded intermediates of the tensor
    # contraction (measured 49 ms -> ~1 ms at 196k tets)
    ceT = p2k.gather_T(jnp.asarray(c, dtype))  # (npe, nc)
    cq = p2k.at_quad_T(ceT)  # (nq, nc)
    w = ((dt / conc_max) * rho * det)[None, :] * p2k.qw[:, None]  # (nq, nc)
    wq = w * cq * cq
    contrib_T = jnp.sum(p2k.vals[:, :, None] * wq[:, None, :], axis=0)
    # class-split accumulate (P2Kernels.scatter_T): the flat diag pull
    # pads every dof to the vertex multiplicity (~24) — 2.5x the rows
    return p2k.scatter_T(contrib_T)


def build_p2_rd_wc_lumped(plan: BellPlan, p2k, c, rho, dt, conc_max, dtype,
                          tables=None):
    """(n_dofs,) LUMPED logistic correction: row sums of
    :func:`build_p2_rd_wc` (Σ_j W_ij = det Σ_k c_k M0[i, k]); chord
    operator only — see the module docstring."""
    npe = p2k.npe
    nc = p2k.n_cells
    M0_, _, _ = p2_ref_tensors(p2k.dim)
    M0 = jnp.asarray(M0_, dtype)
    _, det = _geom(p2k, dtype)
    rho = jnp.broadcast_to(jnp.asarray(rho, dtype), (nc,))
    # CELL AXIS LAST: rowsum[i, nc] = Σ_k M0[i,k] ce[k, nc] as one
    # (npe, npe, nc) broadcast mul+reduce (minor axis stays nc)
    ceT = p2k.gather_T(jnp.asarray(c, dtype))  # (npe, nc)
    rowsum_T = jnp.sum(M0[:, :, None] * ceT[None, :, :], axis=1)
    contrib_T = ((2.0 * dt / conc_max) * rho * det)[None, :] * rowsum_T
    # class-split accumulate (see p2_cubic_residual)
    return p2k.scatter_T(contrib_T)
