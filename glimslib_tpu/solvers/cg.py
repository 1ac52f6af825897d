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
