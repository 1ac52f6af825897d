"""Offset-stencil operator correctness: the assembled streaming operators
must equal the jvp of the matrix-free residuals exactly (same linear
systems), and stencil-mode simulations must match matrix-free runs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glimslib_tpu.core.mesh import box_mesh, rectangle_mesh
from glimslib_tpu.ops.assembly import P1Kernels
from glimslib_tpu.ops.stencil import StencilOperators


@pytest.mark.parametrize(
    "mesh", [rectangle_mesh((-1, -1), (1, 1), 7, 5),
             box_mesh((0, 0, 0), (1, 1, 1), 3, 4, 3)],
    ids=["tri", "tet"],
)
def test_rd_jacobian_matches_jvp(mesh):
    k = P1Kernels(mesh)
    ops = StencilOperators(mesh)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.uniform(0, 1, mesh.n_nodes))
    cp = jnp.asarray(rng.uniform(0, 1, mesh.n_nodes))
    D = jnp.asarray(rng.uniform(0.01, 0.3, mesh.n_cells))
    rho = jnp.asarray(rng.uniform(0.01, 0.3, mesh.n_cells))
    dt = 0.7
    v = jnp.asarray(rng.standard_normal(mesh.n_nodes))

    f = lambda x: k.rd_residual(x, cp, D, rho, dt)
    _, jv = jax.jvp(f, (c,), (v,))
    W = ops.build_rd_jacobian(c, D, rho, dt)
    got = ops.apply_scalar(W, v)
    assert np.allclose(np.asarray(got), np.asarray(jv), atol=1e-11)


@pytest.mark.parametrize(
    "mesh", [rectangle_mesh((-1, -1), (1, 1), 7, 5),
             box_mesh((0, 0, 0), (1, 1, 1), 3, 4, 3)],
    ids=["tri", "tet"],
)
def test_elasticity_operator_matches_jvp(mesh):
    k = P1Kernels(mesh)
    ops = StencilOperators(mesh)
    d = mesh.dim
    rng = np.random.default_rng(1)
    mu = jnp.asarray(rng.uniform(0.5, 2.0, mesh.n_cells))
    lam = jnp.asarray(rng.uniform(0.5, 2.0, mesh.n_cells))
    c = jnp.zeros(mesh.n_nodes)
    v = jnp.asarray(rng.standard_normal((mesh.n_nodes, d)))

    f = lambda u: k.elasticity_residual(u, c, mu, lam, 0.0)
    _, jv = jax.jvp(f, (jnp.zeros((mesh.n_nodes, d)),), (v,))
    W = ops.build_elasticity(mu, lam)
    got = ops.apply_vector(W, v)
    assert np.allclose(np.asarray(got), np.asarray(jv), atol=1e-11)


def test_stencil_simulation_matches_matrix_free(tmp_path):
    """Full forward run: stencil operators vs forced matrix-free path."""
    from glimslib_tpu.models.tumor_growth import TumorGrowth

    mesh = rectangle_mesh((-5, -5), (5, 5), 10, 10)

    class Boundary:
        def inside(self, x, on_boundary):
            return on_boundary

    def run(mode):
        sim = TumorGrowth(mesh)
        sim.operator_mode = mode
        sim.setup_global_parameters(
            boundaries={"boundary_all": Boundary()},
            dirichlet_bcs={
                "clamped": {"bc_value": np.zeros(2),
                            "named_boundary": "boundary_all", "subspace_id": 0}
            },
        )
        sim.setup_model_parameters(
            iv_expression={0: np.zeros(2),
                           1: lambda x: np.exp(-(x**2).sum(axis=1))},
            diffusion=0.1, coupling=0.5, proliferation=0.1, E=0.001,
            poisson=0.45, sim_time=3, sim_time_step=1,
        )
        sim.run(save_method=None, plot=False, output_dir=str(tmp_path / mode))
        return sim

    a = run("auto")
    assert hasattr(a, "_stencil_ops")  # stencil path actually engaged
    b = run("matrix-free")
    for sid in (0, 1):
        x, y = np.asarray(a.solution[sid]), np.asarray(b.solution[sid])
        assert np.allclose(x, y, atol=1e-9), sid


def test_stencil_adjoint_gradient(tmp_path):
    """Gradients through the stencil-mode step match finite differences."""
    from glimslib_tpu.models.tumor_growth import TumorGrowth
    from glimslib_tpu.optimize.adjoint import InverseProblem, tumor_growth_param_map

    mesh = rectangle_mesh((-3, -3), (3, 3), 6, 6)

    class Boundary:
        def inside(self, x, on_boundary):
            return on_boundary

    sim = TumorGrowth(mesh)
    assert sim.operator_mode == "auto"
    sim.setup_global_parameters(
        boundaries={"boundary_all": Boundary()},
        dirichlet_bcs={
            "clamped": {"bc_value": np.zeros(2),
                        "named_boundary": "boundary_all", "subspace_id": 0}
        },
    )
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(2),
                       1: lambda x: np.exp(-0.5 * (x**2).sum(axis=1))},
        diffusion=0.1, coupling=0.1, proliferation=0.1, E=0.001, poisson=0.45,
        sim_time=2, sim_time_step=1,
    )
    names, update = tumor_growth_param_map(2)
    theta = sim.make_theta({**sim.params.as_dict(), **update([0.12, 0.09])})
    iv = sim.params.create_initial_value_function()
    simulate = jax.jit(sim.build_simulate_fn(2, 1.0))
    u_traj, c_traj, ok, _ = simulate(theta, jnp.asarray(iv[0]), jnp.asarray(iv[1]))
    targets = {"conc": np.asarray(c_traj[-1]), "disp": np.asarray(u_traj[-1])}
    ip = InverseProblem(sim, names, targets, update_fn=update)
    v0 = np.array([0.08, 0.15])
    J0, g = ip.value_and_grad(v0)
    eps = 1e-6
    for i in range(2):
        vp = v0.copy(); vp[i] += eps
        vm = v0.copy(); vm[i] -= eps
        fd = (ip.objective(vp) - ip.objective(vm)) / (2 * eps)
        rel = abs(fd - g[i]) / max(abs(fd), 1e-12)
        assert rel < 1e-5, (i, fd, g[i], rel)


def test_streaming_rd_residual_with_static_source(tmp_path):
    """Static source through the fully-streaming rd residual == scipy."""
    import scipy.sparse.linalg as spla

    from glimslib_tpu.models.tumor_growth import TumorGrowth
    from reference_fem import ReferenceFEM

    mesh = rectangle_mesh((-2, -2), (2, 2), 8, 8)

    class B:
        def inside(self, x, ob):
            return ob

    sim = TumorGrowth(mesh)
    sim.setup_global_parameters(
        boundaries={"all": B()},
        dirichlet_bcs={"c": {"bc_value": np.zeros(2), "named_boundary": "all",
                             "subspace_id": 0}},
    )
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(2), 1: 0.0},
        diffusion=0.1, coupling=0.0, proliferation=0.0, E=0.001, poisson=0.4,
        source_term=0.3, sim_time=2, sim_time_step=1,
    )
    sim.run(save_method=None, plot=False, output_dir=str(tmp_path))
    assert hasattr(sim, "_stencil_ops")

    ref = ReferenceFEM(mesh)
    M = ref.mass_matrix()
    K = ref.stiffness_matrix(0.1)
    load = ref.load_vector(1.0)
    c = np.zeros(mesh.n_nodes)
    for _ in range(2):
        c = spla.spsolve((M + K).tocsc(), M @ c + 0.3 * load)
    rel = np.linalg.norm(sim.solution[1] - c) / np.linalg.norm(c)
    assert rel < 1e-9, rel


def test_symmetric_folded_applies_match_full():
    """fold_sym + apply_*_sym reproduce the full-plane applies exactly
    (the folded path halves plane traffic in CG matvecs)."""
    import jax.numpy as jnp
    from glimslib_tpu.core.mesh import box_mesh, rectangle_mesh
    from glimslib_tpu.ops.stencil import StencilOperators

    rng = np.random.default_rng(7)
    for mesh in (rectangle_mesh((0, 0), (2, 1), 6, 5),
                 box_mesh((0, 0, 0), (1, 2, 1), 3, 4, 3)):
        ops = StencilOperators(mesh, dtype=jnp.float64)
        mids = mesh.cell_midpoints
        mu = jnp.asarray(1.0 + mids[:, 0])
        lam = jnp.asarray(2.0 + mids[:, 1])
        W = ops.build_elasticity(mu, lam)
        Ws = ops.fold_sym(W)
        u = jnp.asarray(rng.standard_normal((mesh.n_nodes, mesh.dim)))
        full = np.asarray(ops.apply_vector(W, u))
        sym = np.asarray(ops.apply_vector_sym(Ws, u))
        assert np.allclose(sym, full, atol=1e-12), np.abs(sym - full).max()

        c = jnp.asarray(rng.standard_normal(mesh.n_nodes))
        Wrd = ops.build_rd_jacobian(c * 0.1 + 0.5, jnp.asarray(0.3),
                                    jnp.asarray(0.2), 1.0)
        Wrds = ops.fold_sym(Wrd)
        full_s = np.asarray(ops.apply_scalar(Wrd, c))
        sym_s = np.asarray(ops.apply_scalar_sym(Wrds, c))
        assert np.allclose(sym_s, full_s, atol=1e-12)

        Binv_full = np.asarray(ops.block_jacobi_inverse(W))
        Binv_sym = np.asarray(ops.block_jacobi_inverse_sym(Ws))
        assert np.allclose(Binv_full, Binv_sym, atol=1e-13)
