"""Matrix-free preconditioned conjugate gradients under ``lax.while_loop``.

TPU-native replacement for PETSc KSP (reference uses ``cg``+``amg`` for
projections, simulation_base.py:101-102, and SNES-internal Krylov solves).
The operator is a callable (typically a ``jax.jvp`` of a residual kernel);
the preconditioner is a callable too (Jacobi by default — pass
``lambda r: r / diag``).

Works on arbitrary pytrees/shapes: vectors are flattened views handled by the
caller; here we treat ``x`` as a single array of any shape (dot products sum
over all axes), which covers both the scalar concentration block (n_nodes,)
and the vector displacement block (n_nodes, d) with no reshaping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dot(a, b):
    return jnp.sum(a * b)


def pcg(A, b, x0=None, M=None, rtol=1e-10, atol=0.0, maxiter=500):
    """Solve A x = b with preconditioned CG.

    A : callable(x) -> array, symmetric positive definite action
    M : callable(r) -> array, preconditioner application (approx A^{-1})
    Returns (x, info) where info = dict(iters, resnorm) of traced scalars.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if M is None:
        M = lambda r: r

    r0 = b - A(x0)
    z0 = M(r0)
    bnorm = jnp.sqrt(_dot(b, b))
    tol2 = jnp.maximum(rtol * bnorm, atol) ** 2

    def cond(state):
        x, r, z, p, rz, k = state
        return jnp.logical_and(k < maxiter, _dot(r, r) > tol2)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = A(p)
        pAp = _dot(p, Ap)
        alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _dot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    state0 = (x0, r0, z0, z0, _dot(r0, z0), jnp.asarray(0))
    x, r, z, p, rz, k = jax.lax.while_loop(cond, body, state0)
    return x, {"iters": k, "resnorm": jnp.sqrt(_dot(r, r))}


def estimate_lmax(A, Minner, shape_like, dtype, iters=12, safety=1.1):
    """Largest eigenvalue of the preconditioned operator M⁻¹A (M = Jacobi or
    block-Jacobi) by power iteration with a deterministic start vector; runs
    traced inside jit.

    The estimate parameterizes the Chebyshev preconditioner only — it never
    affects the solution CG converges to — so it is wrapped in
    ``stop_gradient``."""
    n = 1
    for s in shape_like:
        n *= s
    v0 = jnp.sin(jnp.arange(n, dtype=dtype) * 0.7 + 0.3).reshape(shape_like)
    v0 = v0 / jnp.sqrt(_dot(v0, v0))

    def body(v, _):
        w = Minner(A(v))
        nrm = jnp.sqrt(_dot(w, w))
        return w / jnp.maximum(nrm, 1e-300), nrm

    _, nrms = jax.lax.scan(body, v0, None, length=iters)
    return jax.lax.stop_gradient(nrms[-1] * safety)


def make_chebyshev_precond(A, Minner, lmax, degree, lmin_factor=1.0 / 30.0):
    """Chebyshev polynomial preconditioner z = p_k(M⁻¹A) M⁻¹ r.

    Fixed-degree Chebyshev iteration targeting the interval
    [lmin_factor·lmax, lmax] of the M⁻¹A spectrum (the classic AMG
    polynomial smoother; Saad, Iterative Methods, alg. 12.1).  ``Minner``
    applies the inner (Jacobi or block-Jacobi) preconditioner.  A fixed
    polynomial in A composed with a symmetric M is itself a symmetric
    positive-definite preconditioner, so plain (non-flexible) CG stays
    valid.  Replaces PETSc's amg/lu preconditioners (reference
    brain_quad.py:116-119) with pure streaming matvecs — the TPU-idiomatic
    way to cut CG iteration counts (each preconditioner application costs
    ``degree-1`` extra matvecs but removes the per-iteration loop/reduction
    overhead of many CG steps).
    """
    # Positivity guard: for eigenvalues ABOVE the targeted lmax, the
    # residual polynomial of the Chebyshev iteration can overshoot so that
    # lam*p(lam) < 0 for EVEN degrees, making the preconditioner indefinite
    # and breaking CG.  Odd degrees keep lam*p(lam) > 0 for all lam > 0, so
    # the degree is rounded up to odd; the spectral estimate's safety
    # factor then only affects convergence rate, never definiteness.
    if degree % 2 == 0:
        degree = degree + 1
    lmin = lmin_factor * lmax
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta

    def M(r):
        # unrolled: degree is small and static, and unrolling avoids nesting
        # a lax.scan inside the CG while_loop (which blows up compile time)
        z = Minner(r) / theta
        d = z
        rho = 1.0 / sigma1
        for _ in range(degree - 1):
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            resid = Minner(r - A(z))
            d = rho_new * rho * d + (2.0 * rho_new / delta) * resid
            z = z + d
            rho = rho_new
        return z

    return M


def cg_fixed_iters(A, b, x0=None, M=None, iters=50):
    """CG with a fixed iteration count (scan) — reverse-mode differentiable,
    used where a solve must sit inside ``jax.grad`` without custom_vjp."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if M is None:
        M = lambda r: r
    r0 = b - A(x0)
    z0 = M(r0)

    def body(state, _):
        x, r, z, p, rz = state
        Ap = A(p)
        pAp = _dot(p, Ap)
        alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _dot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return (x, r, z, p, rz_new), None

    (x, r, *_), _ = jax.lax.scan(body, (x0, r0, z0, z0, _dot(r0, z0)), None, length=iters)
    return x
