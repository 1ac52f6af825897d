"""Matrix-free Newton for nonlinear residual systems.

TPU-native replacement for PETSc SNES as driven by
``fenics.NonlinearVariationalSolver`` with ``'snes'``
(reference simulation_tumor_growth.py:126-140).  Convergence criteria mirror
SNES defaults: relative decrease of ||F|| below ``rtol`` (SNES default 1e-8)
or ||F|| below ``atol``.

The Jacobian action is obtained with ``jax.jvp`` of the residual at the
current iterate — the analogue of ``J = fenics.derivative(F, u)``
(simulation_tumor_growth.py:124) without symbolic differentiation.

The loop is a ``lax.while_loop`` (no early-exit on TPU: the loop simply stops
contributing once converged).  Non-convergence is reported via a flag the
time loop uses to freeze the simulation, matching the reference's graceful
shutdown (simulation_base.py:284-288).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from glimslib_tpu.solvers.cg import pcg


def _norm(x):
    return jnp.sqrt(jnp.sum(x * x))


def newton(
    residual,
    x0,
    precond_diag=None,
    rtol=1e-8,
    atol=1e-10,
    maxiter=25,
    cg_rtol=1e-10,
    cg_maxiter=1000,
):
    """Solve residual(x) = 0 by Newton-CG.

    residual : callable(x) -> array (same shape as x); must be jnp-pure.
    precond_diag : optional diagonal (same shape as x) for Jacobi CG precond.
    Returns (x, converged, info).
    """
    M = None
    if precond_diag is not None:
        M = lambda r: r / precond_diag

    r0 = residual(x0)
    f0 = _norm(r0)
    ftol = jnp.maximum(rtol * f0, atol)

    def cond(state):
        x, fnorm, k, stalled = state
        return jnp.logical_and(
            jnp.logical_and(k < maxiter, fnorm > ftol),
            jnp.logical_not(stalled),
        )

    def body(state):
        x, fnorm, k, stalled = state
        r = residual(x)
        A = lambda v: jax.jvp(residual, (x,), (v,))[1]
        dx, _ = pcg(A, -r, M=M, rtol=cg_rtol, maxiter=cg_maxiter)
        x_new = x + dx
        fnorm_new = _norm(residual(x_new))
        # divergence guard: residual must not blow up / become non-finite
        bad = jnp.logical_or(
            ~jnp.isfinite(fnorm_new), fnorm_new > 1e8 * (f0 + 1.0)
        )
        x_out = jnp.where(bad, x, x_new)
        return (x_out, jnp.where(bad, fnorm, fnorm_new), k + 1, bad)

    x, fnorm, k, stalled = jax.lax.while_loop(cond, body, (x0, f0, 0, jnp.asarray(False)))
    converged = jnp.logical_and(fnorm <= ftol, ~stalled)
    return x, converged, {"fnorm": fnorm, "iters": k}
