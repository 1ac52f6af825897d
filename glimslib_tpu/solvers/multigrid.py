"""Geometric multigrid preconditioning on lattice meshes.

The reference preconditions its Krylov solves with PETSc's ``amg``
(simulation_base.py:101-103, brain_quad.py:116-119).  On lattice meshes —
the offset-stencil fast path's home turf — the TPU-shaped equivalent is
*geometric* multigrid: every level is another lattice, grid transfers are
axis-wise linear interpolation (pure reshapes/adds, no gathers), and the
level operators are the same offset-stencil planes at coarser resolution.
Everything is static-shape and streaming, so the whole V-cycle jits into
the CG ``while_loop`` body.

Design:
- hierarchy: halve every lattice axis while even (rediscretized coarse
  ``box_mesh``/``rectangle_mesh`` on the same extents);
- coefficient restriction: per-cell coefficients average over the fine
  cells in each coarse voxel (precomputed static index table, traced mean
  — stays differentiable w.r.t. tissue parameters);
- smoother: Chebyshev polynomial over the block-Jacobi inner
  preconditioner (solvers/cg.py), targeting the upper spectrum
  [lmax/8, lmax] — symmetric, so the V(1,1) cycle with ``R = Pᵀ`` is a
  symmetric positive preconditioner and plain CG stays valid;
- coarsest level: exact dense solve (the halving recursion bottoms out
  below 4 cells/axis, so the coarse inverse is a tiny (n_dofs, n_dofs)
  matrix) — stronger than a polynomial sweep and it keeps ~1e3 unrolled
  stencil applications out of the CG while-loop body (pathological XLA
  CPU compile times); degree-``coarse_degree`` Chebyshev remains the
  fallback above ``DENSE_COARSE_MAX_DOFS``;
- Dirichlet masks restricted by injection; all level vectors keep masked
  dofs at exactly zero.

Measured behavior (v5e/CPU, tests/test_multigrid.py): the scalar
concentration block gets textbook MG convergence in stiffness-dominated
regimes (~10 CG iterations vs ~156 with Jacobi at dt·D/h² ≈ 5); the
elasticity block at nu = 0.45 (near-incompressible, the reference's brain
configs) is the known hard case for geometric MG with pointwise smoothers
— coarse P1 spaces cannot represent fine divergence-free modes — so
block-Jacobi remains the production elasticity preconditioner and the
V-cycle is an opt-in component for compressible regimes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from glimslib_tpu.solvers.cg import estimate_lmax, make_chebyshev_precond


# ---------------------------------------------------------------------------
# grid transfers (axis-wise linear interpolation and its exact adjoint)
# ---------------------------------------------------------------------------


def _prolong_axis(a, axis):
    """Linear interpolation along one axis: size m -> 2m-1."""
    a = jnp.moveaxis(a, axis, 0)
    even = a  # (m, ...)
    odd = 0.5 * (a[:-1] + a[1:])  # (m-1, ...)
    # interleave: [e0, o0, e1, o1, ..., e_{m-2}, o_{m-2}] + [e_{m-1}]
    body = jnp.stack([even[:-1], odd], axis=1).reshape(
        (2 * (a.shape[0] - 1),) + a.shape[1:]
    )
    out = jnp.concatenate([body, even[-1:]], axis=0)
    return jnp.moveaxis(out, 0, axis)


def _restrict_axis(r, axis):
    """Exact adjoint of :func:`_prolong_axis`: size 2m-1 -> m."""
    r = jnp.moveaxis(r, axis, 0)
    even = r[0::2]  # (m, ...)
    odd = r[1::2]  # (m-1, ...)
    half = 0.5 * odd
    pad = [(0, 0)] * r.ndim
    out = (
        even
        + jnp.pad(half, [(1, 0)] + pad[1:])
        + jnp.pad(half, [(0, 1)] + pad[1:])
    )
    return jnp.moveaxis(out, 0, axis)


def prolong(xc, coarse_shape, ndim):
    """Coarse flat node field -> fine flat node field.

    ``xc``: (n_coarse,) or (n_coarse, d); shapes follow the lattice's
    descending-stride axis order (``Mesh.lattice_shape``)."""
    comp = xc.shape[1:]
    g = xc.reshape(tuple(coarse_shape) + comp)
    for ax in range(ndim):
        g = _prolong_axis(g, ax)
    n_fine = 1
    for s in g.shape[:ndim]:
        n_fine *= s
    return g.reshape((n_fine,) + comp)


def restrict(rf, fine_shape, ndim):
    """Fine flat node field -> coarse flat node field (adjoint of prolong)."""
    comp = rf.shape[1:]
    g = rf.reshape(tuple(fine_shape) + comp)
    for ax in range(ndim):
        g = _restrict_axis(g, ax)
    n_coarse = 1
    for s in g.shape[:ndim]:
        n_coarse *= s
    return g.reshape((n_coarse,) + comp)


def inject_mask(mask, fine_shape, ndim):
    """Coarse mask by injection (every other node along each axis)."""
    comp = mask.shape[1:]
    g = np.asarray(mask).reshape(tuple(fine_shape) + comp)
    sl = tuple(slice(None, None, 2) for _ in range(ndim))
    g = g[sl]
    n = 1
    for s in g.shape[:ndim]:
        n *= s
    return g.reshape((n,) + comp)


# ---------------------------------------------------------------------------
# hierarchy
# ---------------------------------------------------------------------------


def _axis_cells(mesh):
    return tuple(s - 1 for s in mesh.lattice_shape)


def _coarsen_mesh(mesh):
    """Half-resolution lattice mesh over the same extents (or None)."""
    from glimslib_tpu.core.mesh import box_mesh, rectangle_mesh

    cells = _axis_cells(mesh)
    if any(c % 2 for c in cells) or min(cells) < 4:
        return None
    p0 = mesh.points.min(axis=0)
    p1 = mesh.points.max(axis=0)
    if mesh.dim == 2:
        # lattice axis order is (y, x) for rectangle meshes
        ny, nx = cells
        return rectangle_mesh(tuple(p0), tuple(p1), nx // 2, ny // 2)
    nx, ny, nz = cells
    return box_mesh(tuple(p0), tuple(p1), nx // 2, ny // 2, nz // 2)


def _cell_voxel_keys(mesh):
    """Voxel index per cell, raveled over the *voxel* grid in lattice-axis
    order."""
    cells = np.asarray(_axis_cells(mesh))
    p0 = mesh.points.min(axis=0)
    p1 = mesh.points.max(axis=0)
    mids = mesh.cell_midpoints
    # lattice axis order vs coordinate axis order: strides are descending
    # over lattice axes; rectangle = (y, x), box = (x, y, z).  Recover the
    # coordinate axis for each lattice axis by matching node counts is
    # ambiguous for equal counts — instead use the known constructors'
    # conventions.
    if mesh.dim == 2:
        coord_axes = (1, 0)  # lattice (y, x)
    else:
        coord_axes = (0, 1, 2)
    vi = []
    for la, ca in enumerate(coord_axes):
        h = (p1[ca] - p0[ca]) / cells[la]
        idx = np.clip(
            np.floor((mids[:, ca] - p0[ca]) / h).astype(np.int64),
            0, cells[la] - 1,
        )
        vi.append(idx)
    key = vi[0]
    for la in range(1, mesh.dim):
        key = key * cells[la] + vi[la]
    return key, cells


def _coeff_restriction_table(fine_mesh, coarse_mesh):
    """(nc_coarse, K) int32 table of fine-cell children per coarse cell
    (-1 padded): fine cells whose voxel falls inside the coarse cell's
    voxel."""
    fine_key, fine_cells = _cell_voxel_keys(fine_mesh)
    coarse_key, coarse_cells = _coeff_keys_coarse(coarse_mesh)
    # fine voxel -> coarse voxel
    d = fine_mesh.dim
    fv = fine_key
    # unravel fine key, halve, re-ravel over coarse voxel grid
    idxs = []
    rem = fv
    for la in reversed(range(d)):
        idxs.append(rem % fine_cells[la])
        rem = rem // fine_cells[la]
    idxs = idxs[::-1]  # per lattice axis
    ck = idxs[0] // 2
    for la in range(1, d):
        ck = ck * coarse_cells[la] + idxs[la] // 2
    order = np.argsort(ck, kind="stable")
    sorted_ck = ck[order]
    ncv = int(np.prod(coarse_cells))
    starts = np.searchsorted(sorted_ck, np.arange(ncv))
    ends = np.searchsorted(sorted_ck, np.arange(ncv) + 1)
    K = int((ends - starts).max()) if ncv else 0
    table = np.full((ncv, K), -1, dtype=np.int64)
    for v in range(ncv):
        ch = order[starts[v]:ends[v]]
        table[v, : len(ch)] = ch
    return table[coarse_key], K


def _coeff_keys_coarse(mesh):
    return _cell_voxel_keys(mesh)


def restrict_cell_coeff(coeff, table):
    """Mean of fine-cell coefficient over each coarse cell's children
    (traced; scalar coefficients pass through)."""
    coeff = jnp.asarray(coeff)
    if coeff.ndim == 0:
        return coeff
    t = jnp.asarray(np.maximum(table, 0))
    valid = jnp.asarray((table >= 0).astype(coeff.dtype))
    vals = coeff[t] * valid
    cnt = jnp.maximum(valid.sum(axis=1), 1.0)
    return vals.sum(axis=1) / cnt


class LatticeHierarchy:
    """Static (host-side) multigrid hierarchy for a lattice mesh."""

    def __init__(self, mesh, dtype, max_levels=10):
        from glimslib_tpu.ops.stencil import StencilOperators

        self.dtype = dtype
        self.meshes = [mesh]
        self.tables = []  # coefficient restriction per level pair
        m = mesh
        while len(self.meshes) < max_levels:
            c = _coarsen_mesh(m)
            if c is None:
                break
            table, _ = _coeff_restriction_table(m, c)
            self.meshes.append(c)
            self.tables.append(table)
            m = c
        self.n_levels = len(self.meshes)
        self.ops = [StencilOperators(mm, dtype=dtype) for mm in self.meshes]
        self.shapes = [mm.lattice_shape for mm in self.meshes]
        self.ndim = mesh.dim

    @property
    def usable(self):
        return self.n_levels >= 2


class _MGBase:
    """Shared V(1,1)-cycle machinery: per-level Dirichlet masks by
    injection, Chebyshev smoothing on the upper spectrum, exact-adjoint
    transfers.  Subclasses provide the level operator apply, the inner
    preconditioner apply, and the per-level operator data (``build``)."""

    def __init__(self, hierarchy: LatticeHierarchy, mask,
                 smooth_degree=3, coarse_degree=40, smooth_lmin_factor=0.125):
        self.h = hierarchy
        self.smooth_degree = smooth_degree
        self.coarse_degree = coarse_degree
        self.smooth_lmin_factor = smooth_lmin_factor
        self.masks = [jnp.asarray(mask)]
        m = np.asarray(mask)
        for lv in range(1, hierarchy.n_levels):
            m = inject_mask(m, hierarchy.shapes[lv - 1], hierarchy.ndim)
            self.masks.append(jnp.asarray(m))

    # subclass hooks -------------------------------------------------------

    # dense coarse solves stay affordable up to this many dofs (Cinv is
    # n_dofs^2; 2048 -> 32 MB f64)
    DENSE_COARSE_MAX_DOFS = 2048

    def _apply_op(self, lv, data_lv, v):
        raise NotImplementedError

    def _apply_inner(self, lv, data_lv, r):
        raise NotImplementedError

    def _dense_coarse_inverse(self, lv, data_lv, shape):
        """Exact inverse of the masked coarsest-level operator.

        The coarsest lattice is tiny (halving stops below 4 cells/axis),
        so the V-cycle bottom is one dense (n_dofs, n_dofs) matvec instead
        of a degree-40 Chebyshev sweep — stronger, and it keeps ~1e3
        unrolled stencil applications out of the CG while-loop body
        (measured: the unrolled coarse Chebyshev made the jitted
        MG-preconditioned CG compile pathologically slow on 1-core XLA
        CPU).  Masked dofs are identity rows by construction of the
        masked op."""
        n_dofs = 1
        for s in shape:
            n_dofs *= s
        A = self._masked_op(lv, data_lv)
        eye = jnp.eye(n_dofs, dtype=self.h.dtype)
        cols = jax.vmap(lambda e: A(e.reshape(shape)).reshape(-1))(eye)
        return jnp.linalg.inv(cols.T)

    def _masked_op(self, lv, data_lv):
        mask = self.masks[lv]

        def A(v):
            return jnp.where(
                mask, v, self._apply_op(lv, data_lv, jnp.where(mask, 0.0, v))
            )

        return A

    def _masked_inner(self, lv, data_lv):
        mask = self.masks[lv]

        def M(r):
            return jnp.where(
                mask, r,
                self._apply_inner(lv, data_lv, jnp.where(mask, 0.0, r)),
            )

        return M

    # application ----------------------------------------------------------

    def apply(self, data, r):
        """V-cycle approximate solve on the finest level."""
        return self._cycle(0, data, r)

    def _cycle(self, lv, data, r):
        h = self.h
        A = self._masked_op(lv, data[lv])
        M_in = self._masked_inner(lv, data[lv])
        if lv == h.n_levels - 1:
            if "Cinv" in data[lv]:
                z = data[lv]["Cinv"] @ r.reshape(-1)
                return z.reshape(r.shape)
            return make_chebyshev_precond(
                A, M_in, data[lv]["lmax"], self.coarse_degree)(r)
        lmax = data[lv]["lmax"]
        # smoother: damp the upper spectrum only (classic Chebyshev
        # smoothing interval) — a wide interval at low degree smooths
        # nothing and stalls the cycle
        S = make_chebyshev_precond(
            A, M_in, lmax, self.smooth_degree,
            lmin_factor=self.smooth_lmin_factor,
        )
        x = S(r)
        rc = restrict(r - A(x), h.shapes[lv], h.ndim)
        rc = jnp.where(self.masks[lv + 1], 0.0, rc)
        xc = self._cycle(lv + 1, data, rc)
        corr = prolong(xc, h.shapes[lv + 1], h.ndim)
        x = x + jnp.where(self.masks[lv], 0.0, corr)
        x = x + S(r - A(x))
        return x


class MGElasticity(_MGBase):
    """V(1,1)-cycle preconditioner for the vector elasticity block."""

    def build(self, mu, lam):
        """Build per-level operator data (a pytree carried in theta)."""
        h = self.h
        data = []
        mu_l, lam_l = mu, lam
        for lv in range(h.n_levels):
            if lv > 0:
                mu_l = restrict_cell_coeff(mu_l, h.tables[lv - 1])
                lam_l = restrict_cell_coeff(lam_l, h.tables[lv - 1])
            ops = h.ops[lv]
            W = ops.build_elasticity(mu_l, lam_l)
            Binv = ops.block_jacobi_inverse(W, mask=self.masks[lv])
            d = {"W": W, "Binv": Binv}
            A = self._masked_op(lv, d)
            M = self._masked_inner(lv, d)
            n = h.meshes[lv].n_nodes
            if (lv == h.n_levels - 1
                    and n * h.ndim <= self.DENSE_COARSE_MAX_DOFS):
                d["Cinv"] = self._dense_coarse_inverse(lv, d, (n, h.ndim))
            else:
                d["lmax"] = estimate_lmax(A, M, (n, h.ndim), W.dtype)
            data.append(d)
        return tuple(data)

    def _apply_op(self, lv, data_lv, v):
        return self.h.ops[lv].apply_vector(data_lv["W"], v)

    def _apply_inner(self, lv, data_lv, r):
        return self.h.ops[lv].apply_block_jacobi(data_lv["Binv"], r)


class MGScalar(_MGBase):
    """V(1,1)-cycle preconditioner for the scalar concentration block
    (operator M + dt·D·K, rebuilt per Newton iteration via its planes)."""

    def build(self, D, rho, dt, conc_max=1.0):
        """Per-level planes of the *constant* part of the rd Jacobian
        (M + dt D K − dt ρ M); the rank-structure logistic correction is
        left to the smoother on the fine level (preconditioner-grade)."""
        h = self.h
        data = []
        D_l, rho_l = D, rho
        for lv in range(h.n_levels):
            if lv > 0:
                D_l = restrict_cell_coeff(D_l, h.tables[lv - 1])
                rho_l = restrict_cell_coeff(rho_l, h.tables[lv - 1])
            ops = h.ops[lv]
            W = ops.build_rd_jacobian_const(D_l, rho_l, dt)
            o0 = ops.offsets.index(0)
            diag = W[o0]
            mask = self.masks[lv]
            diag = jnp.where(mask, 1.0, jnp.where(diag > 0, diag, 1.0))
            d = {"W": W, "diag": diag}
            A = self._masked_op(lv, d)
            M = self._masked_inner(lv, d)
            n = h.meshes[lv].n_nodes
            if (lv == h.n_levels - 1
                    and n <= self.DENSE_COARSE_MAX_DOFS):
                d["Cinv"] = self._dense_coarse_inverse(lv, d, (n,))
            else:
                d["lmax"] = estimate_lmax(A, M, (n,), W.dtype)
            data.append(d)
        return tuple(data)

    def _apply_op(self, lv, data_lv, v):
        return self.h.ops[lv].apply_scalar(data_lv["W"], v)

    def _apply_inner(self, lv, data_lv, r):
        return r / data_lv["diag"]
