"""Solver unit tests: preconditioned CG and Newton on known systems."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glimslib_tpu.solvers.cg import cg_fixed_iters, pcg
from glimslib_tpu.solvers.newton import newton


@pytest.fixture()
def spd_system():
    rng = np.random.default_rng(0)
    n = 60
    Q = rng.standard_normal((n, n))
    A = Q @ Q.T + n * np.eye(n)
    b = rng.standard_normal(n)
    return jnp.asarray(A), jnp.asarray(b)


def test_pcg_solves_spd(spd_system):
    A, b = spd_system
    x, info = pcg(lambda v: A @ v, b, rtol=1e-12, maxiter=500)
    assert np.allclose(np.asarray(A @ x), np.asarray(b), atol=1e-8)
    assert int(info["iters"]) < 500


def test_pcg_preconditioner_reduces_iterations(spd_system):
    A, b = spd_system
    # make it badly scaled
    s = jnp.asarray(np.logspace(0, 4, b.shape[0]))
    As = A * s[None, :] * s[:, None]
    _, info_plain = pcg(lambda v: As @ v, b, rtol=1e-10, maxiter=2000)
    diag = jnp.diag(As)
    _, info_jac = pcg(lambda v: As @ v, b, M=lambda r: r / diag,
                      rtol=1e-10, maxiter=2000)
    assert int(info_jac["iters"]) < int(info_plain["iters"])


def test_cg_fixed_iters_differentiable(spd_system):
    A, b = spd_system

    def solve_norm(bb):
        x = cg_fixed_iters(lambda v: A @ v, bb, iters=80)
        return jnp.sum(x**2)

    g = jax.grad(solve_norm)(b)
    eps = 1e-5
    v = jnp.asarray(np.random.default_rng(1).standard_normal(b.shape))
    fd = (solve_norm(b + eps * v) - solve_norm(b - eps * v)) / (2 * eps)
    assert np.isclose(float(g @ v), float(fd), rtol=1e-4)


def test_newton_scalar_system():
    """Solve x_i^3 + x_i = b_i (diagonal nonlinear system)."""
    b = jnp.asarray(np.linspace(0.5, 3.0, 17))
    residual = lambda x: x**3 + x - b
    x, converged, info = newton(residual, jnp.zeros_like(b), rtol=1e-12)
    assert bool(converged)
    assert np.allclose(np.asarray(residual(x)), 0.0, atol=1e-8)


def test_newton_reports_nonconvergence():
    # residual with no root and exploding values
    residual = lambda x: jnp.exp(x) + 1.0
    x, converged, info = newton(residual, jnp.zeros(4), maxiter=5)
    assert not bool(converged)
    assert np.isfinite(np.asarray(x)).all()
