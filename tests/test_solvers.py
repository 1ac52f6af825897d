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


def test_chebyshev_precond_cuts_iterations(spd_system):
    """Chebyshev polynomial preconditioning (solvers/cg.py) reaches the same
    solution in ≥2x fewer CG iterations than Jacobi alone."""
    from glimslib_tpu.solvers.cg import estimate_lmax, make_chebyshev_precond

    A, b = spd_system
    # FEM-like conditioning: Laplacian + mass scaling
    n = b.shape[0]
    L = 2.0 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
    As = jnp.asarray(np.eye(n) + 40.0 * L)
    Aop = lambda v: As @ v
    diag = jnp.diag(As)
    Mj = lambda r: r / diag
    xj, info_j = pcg(Aop, b, M=Mj, rtol=1e-10, maxiter=2000)

    lmax = estimate_lmax(Aop, Mj, b.shape, b.dtype)
    Mc = make_chebyshev_precond(Aop, Mj, lmax, degree=8)
    xc, info_c = pcg(Aop, b, M=Mc, rtol=1e-10, maxiter=2000)

    assert np.allclose(np.asarray(xc), np.asarray(xj), atol=1e-7)
    assert int(info_c["iters"]) * 2 <= int(info_j["iters"]), (
        int(info_c["iters"]), int(info_j["iters"]))


def test_chebyshev_step_solution_unchanged(tmp_path):
    """A coupled forward run with precond_degree=6 matches the Jacobi run to
    solver tolerance, and the adjoint gradient still passes FD."""
    from glimslib_tpu.core.mesh import rectangle_mesh
    from glimslib_tpu.models.tumor_growth import TumorGrowth

    class Boundary:
        def inside(self, x, on_boundary):
            return on_boundary

    def run(degree):
        mesh = rectangle_mesh((-5, -5), (5, 5), 12, 12)
        sim = TumorGrowth(mesh)
        sim.setup_global_parameters(
            boundaries={"boundary_all": Boundary()},
            dirichlet_bcs={
                "clamped": {"bc_value": np.zeros(2),
                            "named_boundary": "boundary_all",
                            "subspace_id": 0}
            },
        )
        sim.setup_model_parameters(
            iv_expression={0: np.zeros(2),
                           1: lambda x: np.exp(-0.5 * (x**2).sum(axis=1))},
            diffusion=0.2, coupling=0.2, proliferation=0.1, E=0.001,
            poisson=0.45, sim_time=3, sim_time_step=1,
        )
        sim.step_config = sim.step_config._replace(precond_degree=degree)
        sim.run(save_method=None, plot=False,
                output_dir=str(tmp_path / f"d{degree}"))
        return sim

    s0 = run(0)
    s6 = run(6)
    c0 = np.asarray(s0.solution[1])
    c6 = np.asarray(s6.solution[1])
    assert np.linalg.norm(c6 - c0) / np.linalg.norm(c0) < 1e-8
    u0 = np.asarray(s0.solution[0])
    u6 = np.asarray(s6.solution[0])
    assert np.linalg.norm(u6 - u0) / max(np.linalg.norm(u0), 1e-30) < 1e-7


def test_mixed_precision_refinement_beats_f32(tmp_path):
    """f32 + refine_f64 (f64-kernel Newton residuals, StepConfig.refine_f64)
    lands well under the 1e-6 north-star parity target where plain f32
    misses it — the TPU accuracy answer of SURVEY §7 hard part #1."""
    from glimslib_tpu.core.mesh import rectangle_mesh
    from glimslib_tpu.models.tumor_growth import TumorGrowth
    from glimslib_tpu.solvers.coupled import StepConfig
    from reference_fem import ReferenceFEM

    class Boundary:
        def inside(self, x, on_boundary):
            return on_boundary

    def build(refine):
        mesh = rectangle_mesh((-5, -5), (5, 5), 30, 30)
        sim = TumorGrowth(mesh, dtype=jnp.float32)
        sim.setup_global_parameters(
            boundaries={"boundary_all": Boundary()},
            dirichlet_bcs={"clamped": {"bc_value": np.zeros(2),
                                       "named_boundary": "boundary_all",
                                       "subspace_id": 0}},
        )
        sim.setup_model_parameters(
            iv_expression={0: np.zeros(2),
                           1: lambda x: np.exp(-(x**2).sum(axis=1))},
            diffusion=0.1, coupling=1.0, proliferation=0.1, E=0.001,
            poisson=0.45, sim_time=3, sim_time_step=1,
        )
        sim.step_config = StepConfig(
            newton_rtol=1e-5, newton_atol=1e-6, cg_rtol=3e-7,
            cg_maxiter=2000, refine_f64=refine,
        )
        return sim

    def final_state(sim):
        theta = sim.make_theta(sim.params.as_dict())
        theta = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32)
            if jnp.asarray(a).dtype.kind == "f" else a, theta)
        iv = sim.params.create_initial_value_function()
        u_traj, c_traj, ok, _ = jax.jit(sim.build_simulate_fn(3, 1.0))(
            theta, jnp.asarray(iv[0], jnp.float32),
            jnp.asarray(iv[1], jnp.float32))
        assert bool(np.asarray(ok).all())
        return np.asarray(u_traj[-1]), np.asarray(c_traj[-1])

    # f64 scipy ground truth
    sim = build(False)
    mesh = sim.mesh
    ref = ReferenceFEM(mesh)
    iv = sim.params.create_initial_value_function()
    c = np.asarray(iv[1], dtype=np.float64)
    u = np.zeros(mesh.n_nodes * 2)
    bn = mesh.boundary_nodes
    E, nu = 0.001, 0.45
    mu = E / (2 * (1 + nu))
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    for _ in range(3):
        u, c = ref.solve_step(
            u, c, 0.1, 0.1, mu, lam, 1.0, 1.0,
            dirichlet_disp_nodes=bn,
            dirichlet_disp_values=np.zeros((len(bn), 2)))

    u32, c32 = final_state(build(False))
    ur, cr = final_state(build(True))
    rel = lambda a, b: np.linalg.norm(
        a.astype(np.float64).ravel() - b.ravel()) / np.linalg.norm(b.ravel())
    # refinement must beat plain f32 and clear the 1e-6 target
    assert rel(cr, c) < 1e-6, rel(cr, c)
    assert rel(ur, u.reshape(-1, 2)) < 1e-6, rel(ur, u.reshape(-1, 2))
    assert rel(cr, c) < rel(c32, c)


def test_refine_f64_auto_default(monkeypatch):
    """GLIMS_REFINE_F64 defaults to 'auto': ON for f32 models when x64 is
    available (VERDICT r2 #5 — 1e-6 north-star holds with default flags),
    OFF for f64 models and under an explicit '0'."""
    import jax.numpy as jnp

    from glimslib_tpu import config as glims_config
    from glimslib_tpu.core.mesh import rectangle_mesh
    from glimslib_tpu.models.tumor_growth import TumorGrowth

    monkeypatch.setattr(glims_config, "refine_f64", "auto")
    # tests run with jax_enable_x64 on (conftest), so auto => True for f32
    assert glims_config.resolve_refine_f64(jnp.float32) is True
    assert glims_config.resolve_refine_f64(jnp.float64) is False
    monkeypatch.setattr(glims_config, "refine_f64", "0")
    assert glims_config.resolve_refine_f64(jnp.float32) is False
    monkeypatch.setattr(glims_config, "refine_f64", "1")
    assert glims_config.resolve_refine_f64(jnp.float32) is True

    monkeypatch.setattr(glims_config, "refine_f64", "auto")
    mesh = rectangle_mesh((0, 0), (1, 1), 4, 4)
    assert TumorGrowth(mesh, dtype=jnp.float32).step_config.refine_f64
    assert not TumorGrowth(mesh, dtype=jnp.float64).step_config.refine_f64
