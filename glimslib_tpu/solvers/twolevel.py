"""Two-level coarse-space preconditioning for unstructured elasticity.

The reference preconditions its elasticity Krylov solves with PETSc AMG
(simulation_base.py:101-103); PETSc's GAMG builds its coarse space from
per-aggregate near-null modes.  Geometric multigrid with P1 coarse spaces
fails on the nu ~ 0.45 brain configs (solvers/multigrid.py notes), and
measurements on the flagship unstructured problem (tools/bench_twolevel.py)
show per-aggregate AFFINE modes (translations + the full displacement
gradient, q = d + d^2 modes) beat rigid modes at matched coarse size:
at n=24 the elasticity CG drops 163 -> 75 iterations with 64-node
aggregates (additive combination with block-Jacobi).

TPU-shaped design (no gathers on the per-iteration hot path):

- Aggregates are CONTIGUOUS ranges of ``agg_size`` nodes in the mesh
  ordering.  Ordering matters: Morton (space-filling-curve) ordered
  meshes (core/mesh.py reordered_morton) give compact blob aggregates —
  measured 87 vs 156 iterations against RCM-ordered slabs at n=24.
  Restriction/prolongation are then reshape + broadcast/sum over a
  (nagg, m, d) view: zero gathers, zero scatters per application.
- Per-node mode matrix M_i (d, q): affine u(x) = t + G r_i with offsets
  r_i = x_i - centroid(agg) scaled to O(1) per aggregate (conditioning
  of the coarse Gram).  Dirichlet dofs fold in by zeroing M rows, making
  the coarse operator consistent with the masked CG operator
  A'' = m + (1-m) A (1-m) of solvers/coupled.py.
- The Galerkin coarse matrix A_c = P~^T A P~ assembles from the
  block-ELL values (ops/ell.py) by one scatter-add into a DENSE
  (q*nagg)^2 matrix, inverted once.  This costs O(n K q^2) scatter
  traffic, so it runs EAGERLY AT SETUP (models/base.py), frozen at the
  setup-time parameters — a preconditioner only shapes the iteration
  count, never the solution or its IFT adjoint, so freezing it across
  an optimizer's theta updates is sound (standard frozen-preconditioner
  practice) and keeps the in-jit per-step cost at exactly one dense
  matvec + two reshape transfers.

The preconditioner is the SPD additive combination
    M(r) = blockJacobi(r) + P~ A_c^{-1} P~^T r
(sum of an SPD and a PSD map), so plain CG remains valid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def n_affine_modes(d: int) -> int:
    return d + d * d  # translations + full displacement gradient


def n_scalar_modes(d: int) -> int:
    return 1 + d  # constant + linear (the P1 coarse space per aggregate)


class AggPlan:
    """Host-precomputed contiguous-aggregate affine coarse space.

    Aggregates are node ranges [g*m, (g+1)*m) in mesh order (use a
    Morton-ordered mesh); node count zero-padded to a multiple of ``m``.
    """

    def __init__(self, mesh, agg_size: int = 64):
        n = mesh.n_nodes
        d = mesh.dim
        m = int(agg_size)
        nagg = (n + m - 1) // m
        self.n, self.d, self.m, self.nagg = n, d, m, nagg
        self.n_pad = nagg * m
        self.q = n_affine_modes(d)

        pts = np.zeros((self.n_pad, d), dtype=np.float64)
        pts[:n] = np.asarray(mesh.points, dtype=np.float64)
        cent = pts.reshape(nagg, m, d).mean(axis=1)
        off = pts - np.repeat(cent, m, axis=0)
        off[n:] = 0.0
        # per-aggregate O(1) scaling for coarse-Gram conditioning
        scale = np.maximum(
            np.abs(off.reshape(nagg, m, d)).max(axis=(1, 2)), 1e-12
        )
        self.offsets = off / np.repeat(scale, m)[:, None]  # (n_pad, d)
        # aggregate id per node + sentinel slot used by ELL adjacency
        agg_of = np.empty(n + 1, dtype=np.int32)
        agg_of[:n] = np.arange(n, dtype=np.int32) // m
        agg_of[n] = nagg
        self.agg_of = agg_of

    def mode_matrix(self, f):
        """Masked per-node mode matrices M~ (n_pad, d, q): affine modes
        u = t + G r with rows scaled by f = 1-mask (f: (n, d))."""
        d, q, n, n_pad = self.d, self.q, self.n, self.n_pad
        off = self.offsets
        M = np.zeros((n_pad, d, q), dtype=np.float64)
        M[:, :, :d] = np.eye(d)
        for a in range(d):
            for c in range(d):
                M[:, a, d + a * d + c] = off[:, c]
        M[n:] = 0.0
        Mj = jnp.asarray(M)
        fp = jnp.pad(jnp.asarray(f, Mj.dtype), ((0, n_pad - n), (0, 0)))
        return Mj * fp[:, :, None]

    # -- transfers (reshape-only) -------------------------------------------

    def restrict(self, Mt, r):
        """P~^T r: fine (n, d) -> coarse (nagg*q,)."""
        m, nagg, q, d = self.m, self.nagg, self.q, self.d
        rp = jnp.pad(r, ((0, self.n_pad - self.n), (0, 0)))
        per = jnp.sum(Mt * rp[:, :, None], axis=1)  # (n_pad, q)
        return jnp.sum(per.reshape(nagg, m, q), axis=1).reshape(-1)

    def prolong(self, Mt, w):
        """P~ w: coarse (nagg*q,) -> fine (n, d)."""
        m, nagg, q = self.m, self.nagg, self.q
        wq = jnp.repeat(w.reshape(nagg, q), m, axis=0)  # (n_pad, q)
        return jnp.sum(Mt * wq[:, None, :], axis=2)[: self.n]

    # -- node-axis-LAST transfers (TPU fast path) ----------------------------
    # The canonical (n_pad, d, q) mode matrix pads its q=12-wide minor dim
    # to 128 lanes (a 10x tile blow-up: ~55 MB touched per transfer at 36k
    # nodes); the (d, q, n_pad) layout is fully packed (~5 MB), same math.

    def restrict_T(self, MtT, r):
        """P~^T r with MtT (d, q, n_pad); r (n, d) -> (nagg*q,)."""
        m, nagg, q = self.m, self.nagg, self.q
        rT = jnp.pad(r.T, ((0, 0), (0, self.n_pad - self.n)))  # (d, n_pad)
        per = jnp.sum(MtT * rT[:, None, :], axis=0)  # (q, n_pad)
        w = jnp.sum(per.reshape(q, nagg, m), axis=2)  # (q, nagg)
        return w.T.reshape(-1)

    def prolong_T(self, MtT, w):
        """P~ w with MtT (d, q, n_pad); (nagg*q,) -> (n, d)."""
        m, nagg, q = self.m, self.nagg, self.q
        wq = jnp.repeat(w.reshape(nagg, q).T, m, axis=1)  # (q, n_pad)
        out = jnp.sum(MtT * wq[None, :, :], axis=1)  # (d, n_pad)
        return out[:, : self.n].T

    # -- scalar-field coarse space (rd concentration block) ------------------

    def mode_matrix_scalar(self, f):
        """Masked per-node scalar mode matrix M~s (n_pad, qs): affine modes
        c(x) = a + b·r with rows scaled by f = 1-mask (f: (n,))."""
        qs = n_scalar_modes(self.d)
        n, n_pad = self.n, self.n_pad
        M = np.zeros((n_pad, qs), dtype=np.float64)
        M[:, 0] = 1.0
        M[:, 1:] = self.offsets
        M[n:] = 0.0
        Mj = jnp.asarray(M)
        fp = jnp.pad(jnp.asarray(f, Mj.dtype), (0, n_pad - n))
        return Mj * fp[:, None]

    def restrict_scalar(self, Ms, r):
        """Ps~^T r: fine (n,) -> coarse (nagg*qs,)."""
        m, nagg = self.m, self.nagg
        qs = Ms.shape[1]
        rp = jnp.pad(r, (0, self.n_pad - self.n))
        per = Ms * rp[:, None]  # (n_pad, qs)
        return jnp.sum(per.reshape(nagg, m, qs), axis=1).reshape(-1)

    def prolong_scalar(self, Ms, w):
        """Ps~ w: coarse (nagg*qs,) -> fine (n,)."""
        m, nagg = self.m, self.nagg
        qs = Ms.shape[1]
        wq = jnp.repeat(w.reshape(nagg, qs), m, axis=0)  # (n_pad, qs)
        return jnp.sum(Ms * wq, axis=1)[: self.n]

    def restrict_scalar_T(self, MsT, r):
        """Ps~^T r with MsT (qs, n_pad); r (n,) -> (nagg*qs,)."""
        m, nagg = self.m, self.nagg
        qs = MsT.shape[0]
        rp = jnp.pad(r, (0, self.n_pad - self.n))
        per = MsT * rp[None, :]  # (qs, n_pad)
        return jnp.sum(per.reshape(qs, nagg, m), axis=2).T.reshape(-1)

    def prolong_scalar_T(self, MsT, w):
        """Ps~ w with MsT (qs, n_pad); (nagg*qs,) -> (n,)."""
        m, nagg = self.m, self.nagg
        qs = MsT.shape[0]
        wq = jnp.repeat(w.reshape(nagg, qs).T, m, axis=1)  # (qs, n_pad)
        return jnp.sum(MsT * wq, axis=0)[: self.n]


def build_coarse(plan: AggPlan, adj, B, mask_u, reg: float = 1e-8):
    """Dense Galerkin coarse matrix A_c = P~^T A P~ from block-ELL values.

    ``adj`` (n, K) int32 with sentinel n; ``B`` (n, K, d, d); ``mask_u``
    (n, d) bool.  One-time scatter-add of n*K*q^2 values — call eagerly at
    setup, not inside the per-step jit.  Everything under stop_gradient.
    """
    n, d, q, nagg = plan.n, plan.d, plan.q, plan.nagg
    K = adj.shape[1]
    B = jax.lax.stop_gradient(jnp.asarray(B))
    dtype = B.dtype
    f = 1.0 - jax.lax.stop_gradient(jnp.asarray(mask_u)).astype(dtype)
    Mt = plan.mode_matrix(np.asarray(f)).astype(dtype)  # (n_pad, d, q)
    Mi = Mt[:n]  # (n, d, q)
    # neighbor modes, gathered once (sentinel row n_pad-? -> use zero row)
    Mpad = jnp.concatenate([Mi, jnp.zeros((1, d, q), dtype)], axis=0)
    Mj = jnp.take(Mpad, jnp.minimum(adj.ravel(), n), axis=0).reshape(
        n, K, d, q
    )
    # ent[i,k,p,q'] = sum_a sum_b Mi[i,a,p] B[i,k,a,b] Mj[i,k,b,q']
    # (mul+reduce, never einsum/@ for small contractions — CLAUDE.md)
    tmp = jnp.sum(
        Mi[:, None, :, :, None] * B[:, :, :, None, :], axis=2
    )  # (n, K, p, b)
    ent = jnp.sum(
        tmp[:, :, :, :, None] * Mj[:, :, None, :, :], axis=3
    )  # (n, K, p, q')

    gi = jnp.asarray(plan.agg_of[:n], jnp.int32)
    gj = jnp.take(jnp.asarray(plan.agg_of), adj.ravel()).reshape(n, K)
    gj = jnp.minimum(gj, nagg - 1)  # sentinel cols carry zero ent
    dim_c = nagg * q
    p_idx = jnp.arange(q, dtype=jnp.int32)
    rowc = gi[:, None, None, None] * q + p_idx[None, None, :, None]
    colc = gj[:, :, None, None] * q + p_idx[None, None, None, :]
    flat = (rowc * dim_c + colc).reshape(-1)
    Ac = jnp.zeros((dim_c * dim_c,), dtype).at[flat].add(ent.reshape(-1))
    Ac = Ac.reshape(dim_c, dim_c)

    # ridge keeps masked-out / degenerate modes invertible
    dg = jnp.diagonal(Ac)
    eps = reg * jnp.max(dg) + jnp.asarray(1e-30, dtype)
    Ac = Ac + (eps + jnp.where(dg <= 0, 1.0, 0.0)) * jnp.eye(
        dim_c, dtype=dtype
    )
    return Ac


def build_coarse_scalar(plan: AggPlan, adj, W, mask_c, reg: float = 1e-8):
    """Dense Galerkin coarse matrix of the SCALAR rd Jacobian from node-ELL
    values: A_c = Ps~^T A Ps~ with per-aggregate affine modes.

    ``adj`` (n, K) int32 with sentinel n; ``W`` (n, K); ``mask_c`` (n,)
    bool.  One-time scatter-add — call eagerly at setup (preconditioner
    only; frozen at setup-time theta like the elasticity coarse)."""
    n, nagg = plan.n, plan.nagg
    qs = n_scalar_modes(plan.d)
    K = adj.shape[1]
    W = jax.lax.stop_gradient(jnp.asarray(W))
    dtype = W.dtype
    f = 1.0 - jax.lax.stop_gradient(jnp.asarray(mask_c)).astype(dtype)
    Ms = plan.mode_matrix_scalar(np.asarray(f)).astype(dtype)  # (n_pad, qs)
    Mi = Ms[:n]
    Mpad = jnp.concatenate([Mi, jnp.zeros((1, qs), dtype)], axis=0)
    Mj = jnp.take(Mpad, jnp.minimum(adj.ravel(), n), axis=0).reshape(
        n, K, qs
    )
    # ent[i,k,p,q'] = Mi[i,p] W[i,k] Mj[i,k,q']  (mul+reduce, no einsum)
    ent = (
        Mi[:, None, :, None] * W[:, :, None, None] * Mj[:, :, None, :]
    )  # (n, K, p, q')

    gi = jnp.asarray(plan.agg_of[:n], jnp.int32)
    gj = jnp.take(jnp.asarray(plan.agg_of), adj.ravel()).reshape(n, K)
    gj = jnp.minimum(gj, nagg - 1)  # sentinel cols carry zero ent
    dim_c = nagg * qs
    p_idx = jnp.arange(qs, dtype=jnp.int32)
    rowc = gi[:, None, None, None] * qs + p_idx[None, None, :, None]
    colc = gj[:, :, None, None] * qs + p_idx[None, None, None, :]
    flat = (rowc * dim_c + colc).reshape(-1)
    Ac = jnp.zeros((dim_c * dim_c,), dtype).at[flat].add(ent.reshape(-1))
    Ac = Ac.reshape(dim_c, dim_c)

    dg = jnp.diagonal(Ac)
    eps = reg * jnp.max(dg) + jnp.asarray(1e-30, dtype)
    Ac = Ac + (eps + jnp.where(dg <= 0, 1.0, 0.0)) * jnp.eye(
        dim_c, dtype=dtype
    )
    return Ac


def coarse_inverse(Ac, droptol: float = 1e-7, k: int | None = None):
    """Gram FACTOR of the coarse inverse: B with B Bᵀ ≈ Ac⁻¹, computed
    EAGERLY on the host in f64 (eager-only by contract — build_coarse
    already is).

    Why a factor and not the inverse: at nu ~ 0.45 the Galerkin coarse
    matrix's condition exceeds f32 resolution, so the f32-ROUNDED dense
    inverse is effectively indefinite — and an indefinite preconditioner
    diverges CG outright (measured on the v5e: ok=False at n=32, even
    with full-precision matvecs).  The factored form  w = B (Bᵀ r)  is
    positive semidefinite BY CONSTRUCTION in any float precision.  Built
    from the f64 eigendecomposition with the near-null spectrum clipped
    (λ < droptol·λmax contributes nothing instead of 1/λ noise).

    ``k`` truncates the factor to its k LARGEST-WEIGHT columns (smallest
    surviving eigenvalues — the near-null directions block-Jacobi fails
    on, which is where the coarse correction earns its keep).  Dropping
    column j perturbs the preconditioner by exactly 1/λ_j ≤ 1/λ_cut, so
    a modest k keeps almost all of the iteration win while cutting the
    per-application HBM traffic from 2·dim_c² to 2·dim_c·k — the factor
    stream is the dominant cost of the two-level apply on TPU."""
    A = np.asarray(jax.lax.stop_gradient(Ac), dtype=np.float64)
    lam, V = np.linalg.eigh(0.5 * (A + A.T))
    lmax = float(lam.max()) if len(lam) else 1.0
    inv_sqrt = np.where(lam > droptol * lmax, 1.0 / np.sqrt(
        np.maximum(lam, 1e-300)), 0.0)
    B = V * inv_sqrt[None, :]
    if k is not None and 0 < k < B.shape[1]:
        idx = np.argsort(-inv_sqrt, kind="stable")[:k]
        B = np.ascontiguousarray(B[:, idx])
    return jnp.asarray(B, dtype=Ac.dtype)


def make_twolevel_precond(plan: AggPlan, B, Mt, base_apply):
    """M(r) = base_apply(r) + P~ B Bᵀ P~^T r  (additive, SPD — the coarse
    term is a Gram form, PSD in any float precision, see
    :func:`coarse_inverse`).

    ``Mt`` is the masked mode matrix from :meth:`AggPlan.mode_matrix` —
    either canonical (n_pad, d, q) or node-axis-last (d, q, n_pad) (the
    TPU layout, see :meth:`AggPlan.restrict_T`); the layout is detected
    from the shape.  Precomputed EAGERLY at setup — this function may be
    called at trace time (the coupled step is closure-converted under
    custom_vjp, which lifts captured arrays to tracers), so no host
    conversions here."""
    dtype = B.dtype
    node_last = Mt.shape[-1] == plan.n_pad and Mt.shape[0] == plan.d
    restrict = plan.restrict_T if node_last else plan.restrict
    prolong = plan.prolong_T if node_last else plan.prolong

    if dtype == jnp.bfloat16:
        # HBM-saving storage (models/base.py runtime_aux casts the factor
        # on TPU f32 runs): the dense factor is the preconditioner's
        # dominant traffic — 182 MB f32 at 36k nodes, streamed twice per
        # CG iteration.  The Gram form stays PSD under rounding
        # (rᵀ B(Bᵀr) = zᵀz̃ with z̃ a 0.4%-rounded z), and a preconditioner
        # perturbation of that size costs ~no iterations.  Accumulation
        # is f32 on the MXU (preferred_element_type).
        def M(r):
            rc = restrict(Mt, r).astype(dtype)
            z = jnp.dot(B.T, rc, preferred_element_type=jnp.float32)
            w = jnp.dot(B, z.astype(dtype),
                        preferred_element_type=jnp.float32)
            coarse = prolong(Mt.astype(jnp.float32), w)
            return base_apply(r) + coarse.astype(r.dtype)

        return M

    def M(r):
        rc = restrict(Mt, r.astype(dtype))
        # two dense matvecs (~45 MFLOP each) — full f32 accumulation, the
        # default bf16 MXU rounding costs iterations on the amplified
        # near-null directions
        z = jnp.dot(B.T, rc, precision=jax.lax.Precision.HIGHEST)
        w = jnp.dot(B, z, precision=jax.lax.Precision.HIGHEST)
        coarse = prolong(Mt, w)
        return base_apply(r) + coarse.astype(r.dtype)

    return M


def make_twolevel_precond_scalar(plan: AggPlan, B, Ms, base_apply):
    """Scalar-field analogue of :func:`make_twolevel_precond` for the rd
    concentration block: M(r) = base_apply(r) + Ps~ B Bᵀ Ps~^T r.

    ``Ms`` is (n_pad, qs) canonical or (qs, n_pad) node-axis-last."""
    dtype = B.dtype
    node_last = Ms.shape[-1] == plan.n_pad and Ms.shape[0] != plan.n_pad
    restrict = plan.restrict_scalar_T if node_last else plan.restrict_scalar
    prolong = plan.prolong_scalar_T if node_last else plan.prolong_scalar

    if dtype == jnp.bfloat16:
        def M(r):
            rc = restrict(Ms, r).astype(dtype)
            z = jnp.dot(B.T, rc, preferred_element_type=jnp.float32)
            w = jnp.dot(B, z.astype(dtype),
                        preferred_element_type=jnp.float32)
            coarse = prolong(Ms.astype(jnp.float32), w)
            return base_apply(r) + coarse.astype(r.dtype)

        return M

    def M(r):
        rc = restrict(Ms, r.astype(dtype))
        z = jnp.dot(B.T, rc, precision=jax.lax.Precision.HIGHEST)
        w = jnp.dot(B, z, precision=jax.lax.Precision.HIGHEST)
        coarse = prolong(Ms, w)
        return base_apply(r) + coarse.astype(r.dtype)

    return M
