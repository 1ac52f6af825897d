"""Supernode halo-ELL operators (ops/bell.py) vs the matrix-free jvp and
the node block-ELL path — the deduplicated-halo storage must reproduce the
Jacobian actions exactly, and the supernode block-Jacobi must invert the
true per-supernode self-blocks (identity on masked/padded dofs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glimslib_tpu.core.mesh import Mesh, box_mesh, rectangle_mesh
from glimslib_tpu.ops.assembly import P1Kernels
from glimslib_tpu.ops import bell


def _morton(mesh):
    return Mesh.from_arrays(mesh.points, mesh.cells).reordered_morton()


@pytest.mark.parametrize(
    "mesh,s", [(rectangle_mesh((0, 0), (2, 1), 6, 5), 8),
               (box_mesh((0, 0, 0), (1, 1, 2), 3, 3, 4), 16)],
    ids=["tri", "tet"],
)
def test_bell_elasticity_matches_jvp(mesh, s):
    mesh = _morton(mesh)
    k = P1Kernels(mesh)
    plan = bell.BellPlan(mesh, s=s)
    rng = np.random.default_rng(0)
    mids = mesh.cell_midpoints
    mu = jnp.asarray(1.0 + mids[:, 0])
    lam = jnp.asarray(2.0 + mids[:, 1])
    W = bell.build_bell_elasticity(plan, (k.grads_T, k.vol), mu, lam, k.dtype)
    u = jnp.asarray(rng.standard_normal((mesh.n_nodes, mesh.dim)))
    c0 = jnp.zeros(mesh.n_nodes)

    got = np.asarray(
        bell.apply_bell_vector(plan, jnp.asarray(plan.ext_ids), W, u)
    )
    resid = lambda uu: k.elasticity_residual(uu, c0, mu, lam, 0.0)
    want = np.asarray(jax.jvp(resid, (jnp.zeros_like(u),), (u,))[1])
    assert np.allclose(got, want, atol=1e-11), np.abs(got - want).max()


@pytest.mark.parametrize(
    "mesh,s", [(rectangle_mesh((0, 0), (2, 1), 6, 5), 8),
               (box_mesh((0, 0, 0), (1, 1, 2), 3, 3, 4), 16)],
    ids=["tri", "tet"],
)
def test_bell_rd_jacobian_matches_jvp(mesh, s):
    mesh = _morton(mesh)
    k = P1Kernels(mesh)
    plan = bell.BellPlan(mesh, s=s)
    rng = np.random.default_rng(1)
    mids = mesh.cell_midpoints
    D = jnp.asarray(0.1 + 0.05 * mids[:, 0])
    rho = jnp.asarray(0.2 + 0.1 * mids[:, 1])
    dt = 0.7
    c = jnp.asarray(rng.random(mesh.n_nodes))
    v = jnp.asarray(rng.standard_normal(mesh.n_nodes))

    W = bell.build_bell_rd_const(plan, (k.grads_T, k.vol), D, rho, dt,
                                 k._m0, k.dtype)
    W = W + bell.build_bell_rd_wc(plan, (k.grads_T, k.vol), k.cells_flat, c,
                                  rho, dt, k._t0, 1.0, k.dtype)
    got = np.asarray(
        bell.apply_bell_scalar(plan, jnp.asarray(plan.ext_ids), W, v)
    )
    resid = lambda cc: k.rd_residual(cc, c, D, rho, dt)
    want = np.asarray(jax.jvp(resid, (c,), (v,))[1])
    assert np.allclose(got, want, atol=1e-11), np.abs(got - want).max()


def test_bell_rd_wc_lumped_is_row_sums():
    """The lumped logistic correction equals the row sums of the assembled
    wc matrix: W(c) @ 1 == lumped (Σ_j φj = 1 on each P1 element)."""
    mesh = _morton(box_mesh((0, 0, 0), (1, 1, 2), 3, 3, 4))
    k = P1Kernels(mesh)
    plan = bell.BellPlan(mesh, s=16)
    rng = np.random.default_rng(3)
    mids = mesh.cell_midpoints
    rho = jnp.asarray(0.2 + 0.1 * mids[:, 1])
    dt, cmax = 0.7, 1.0
    c = jnp.asarray(rng.random(mesh.n_nodes))

    W = bell.build_bell_rd_wc(plan, (k.grads_T, k.vol), k.cells_flat, c,
                              rho, dt, k._t0, cmax, k.dtype)
    ones = jnp.ones(mesh.n_nodes)
    want = np.asarray(
        bell.apply_bell_scalar(plan, jnp.asarray(plan.ext_ids), W, ones)
    )
    got = np.asarray(
        bell.build_bell_rd_wc_lumped(plan, (k.grads_T, k.vol), k.cells_flat,
                                     c, rho, dt, k._t0, cmax, k.dtype)
    )
    assert np.allclose(got, want, atol=1e-12), np.abs(got - want).max()


def test_batched_matvec_kernel_interpret():
    """ops/bell_pallas.py batched matvec (interpret mode) == XLA
    mul+reduce, at the flagship shapes' awkward (non-128) K."""
    from glimslib_tpu.ops import bell_pallas

    rng = np.random.default_rng(7)
    for B, M, K in ((16, 96, 474), (8, 32, 158), (24, 48, 48)):
        A = jnp.asarray(rng.standard_normal((B, M, K)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
        want = np.asarray(jnp.sum(A * x[:, None, :], axis=2))
        g = bell_pallas._pick_batch_group(B, M, K)
        assert g in (8, 16), g
        got = np.asarray(bell_pallas._bmv_call(B, M, K, g, True)(A, x))
        assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()
    # non-8-divisible block counts fall back to the XLA path
    assert bell_pallas._pick_batch_group(6, 96, 474) == 0


def test_bell_T_applies_match_canonical(monkeypatch):
    """Block-lanes (interpret-mode) applies == canonical applies on f32."""
    monkeypatch.setenv("GLIMS_PALLAS_INTERPRET", "1")
    mesh = _morton(box_mesh((0, 0, 0), (1, 1, 2), 3, 3, 4))
    k = P1Kernels(mesh, dtype=jnp.float32)
    plan = bell.BellPlan(mesh, s=8)
    assert plan.nb % 8 == 0
    rng = np.random.default_rng(5)
    W = bell.build_bell_elasticity(plan, (k.grads_T, k.vol), 1.0, 9.0,
                                   jnp.float32)
    Wrd = bell.build_bell_rd_const(plan, (k.grads_T, k.vol), 0.1, 0.2, 0.7,
                                   k._m0, jnp.float32)
    halo = jnp.asarray(plan.ext_ids)
    u = jnp.asarray(rng.standard_normal((mesh.n_nodes, mesh.dim)),
                    jnp.float32)
    v = jnp.asarray(rng.standard_normal(mesh.n_nodes), jnp.float32)
    Binv = bell.supernode_jacobi_inverse(
        plan, bell.extract_self_blocks_vector(plan, W))
    T = bell.transpose_tables_T(plan, W=W, Wrd=Wrd, Binv=Binv)

    want = np.asarray(bell.apply_bell_vector(plan, halo, W, u))
    got = np.asarray(bell.apply_bell_vector_T(plan, halo, T["_BellWelT"], u))
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()

    want = np.asarray(bell.apply_bell_scalar(plan, halo, Wrd, v))
    got = np.asarray(
        bell.apply_bell_scalar_T(plan, halo, T["_BellWrdCT"], v))
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()

    want = np.asarray(bell.apply_supernode_jacobi(plan, Binv, u))
    got = np.asarray(
        bell.apply_supernode_jacobi_T(plan, T["_BinvSNT"], u))
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()


def test_bell_C_layout_applies_match_canonical(monkeypatch):
    """Chunk-contiguous (nb/128, M, K, 128) kernel layout (interpret mode)
    == canonical applies; exercised at nb == 128 (1024-node mesh, s=8) so
    transpose_tables_T actually selects the C layout."""
    from glimslib_tpu.ops import bell_pallas

    monkeypatch.setenv("GLIMS_PALLAS_INTERPRET", "1")
    mesh = _morton(box_mesh((0, 0, 0), (1, 1, 2), 7, 7, 15))
    k = P1Kernels(mesh, dtype=jnp.float32)
    plan = bell.BellPlan(mesh, s=8)
    assert plan.nb == 128, plan.nb
    assert bell_pallas.bmv_C_available(plan.nb, plan.s * 3, plan.Kh * 3)
    rng = np.random.default_rng(9)
    W = bell.build_bell_elasticity(plan, (k.grads_T, k.vol), 1.0, 9.0,
                                   jnp.float32)
    Wrd = bell.build_bell_rd_const(plan, (k.grads_T, k.vol), 0.1, 0.2, 0.7,
                                   k._m0, jnp.float32)
    halo = jnp.asarray(plan.ext_ids)
    u = jnp.asarray(rng.standard_normal((mesh.n_nodes, mesh.dim)),
                    jnp.float32)
    v = jnp.asarray(rng.standard_normal(mesh.n_nodes), jnp.float32)
    Binv = bell.supernode_jacobi_inverse(
        plan, bell.extract_self_blocks_vector(plan, W))
    T = bell.transpose_tables_T(plan, W=W, Wrd=Wrd, Binv=Binv)
    assert T["_BellWelT"].ndim == 4, "C layout not selected at nb=128"
    # round-trip through the layout helper
    Wrt = bell.from_kernel_layout(T["_BellWelT"]).reshape(
        plan.nb, plan.s, 3, plan.Kh, 3)
    assert np.allclose(np.asarray(Wrt), np.asarray(W), atol=0)

    want = np.asarray(bell.apply_bell_vector(plan, halo, W, u))
    got = np.asarray(bell.apply_bell_vector_T(plan, halo, T["_BellWelT"], u))
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()

    want = np.asarray(bell.apply_bell_scalar(plan, halo, Wrd, v))
    got = np.asarray(
        bell.apply_bell_scalar_T(plan, halo, T["_BellWrdCT"], v))
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()

    want = np.asarray(bell.apply_supernode_jacobi(plan, Binv, u))
    got = np.asarray(
        bell.apply_supernode_jacobi_T(plan, T["_BinvSNT"], u))
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_supernode_jacobi_inverts_self_blocks():
    """apply_supernode_jacobi(Binv, r) solves the per-supernode self-block
    system: dense-reconstruct block 0 and compare; masked dofs identity."""
    mesh = _morton(box_mesh((0, 0, 0), (1, 1, 2), 3, 3, 4))
    n, d = mesh.n_nodes, mesh.dim
    k = P1Kernels(mesh)
    s = 16
    plan = bell.BellPlan(mesh, s=s)
    W = bell.build_bell_elasticity(plan, (k.grads_T, k.vol), 1.0, 9.0,
                                   k.dtype)
    mask = np.zeros((n, d), bool)
    mask[mesh.boundary_nodes] = True
    B = bell.extract_self_blocks_vector(plan, W)

    # dense reconstruction of supernode 0's self-block from halo storage
    halos = plan.halo_ids[0]
    Wnp = np.asarray(W)  # (nb, s, d, Kh, d)
    m = s * d
    B0 = np.zeros((m, m))
    for i in range(min(s, n)):
        for kh, j in enumerate(halos):
            if 0 <= j < s:  # own nodes of block 0 are ids [0, s)
                B0[i * d:(i + 1) * d, j * d:(j + 1) * d] = Wnp[0, i, :, kh, :]
    assert np.allclose(np.asarray(B)[0], B0, atol=1e-12)

    Binv = bell.supernode_jacobi_inverse(plan, B, mask=jnp.asarray(mask))
    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.standard_normal((n, d)))
    z = np.asarray(bell.apply_supernode_jacobi(plan, Binv, r))
    # per-block check against a dense masked solve
    fm = mask.reshape(-1)[: m]
    Bm = B0 * np.outer(1 - fm, 1 - fm) + np.diag(fm.astype(float))
    want0 = np.linalg.solve(Bm, np.asarray(r).reshape(-1)[:m])
    assert np.allclose(z.reshape(-1)[:m], want0, atol=1e-9)
    # masked dofs pass through unchanged
    rm = np.asarray(r).reshape(-1)[:m][fm]
    assert np.allclose(z.reshape(-1)[:m][fm], rm, atol=1e-12)


def test_bell_streaming_el_residual_matches_matrix_free():
    """The assembled streaming elasticity residual (A u + C c - load,
    models/base.py bell branch + ops/bell.py build_bell_coupling_uc)
    equals the matrix-free per-cell evaluation on an unstructured mesh."""
    from glimslib_tpu.models.tumor_growth import TumorGrowth

    mesh = _morton(box_mesh((-1, -1, -1), (1, 1, 1), 5, 5, 5))

    class Boundary:
        def inside(self, x, on_boundary):
            return on_boundary

    sim = TumorGrowth(mesh)
    sim.setup_global_parameters(
        boundaries={"all": Boundary()},
        dirichlet_bcs={"clamped": {"bc_value": np.zeros(3),
                                   "named_boundary": "all",
                                   "subspace_id": 0}},
    )
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(3),
                       1: lambda x: np.exp(-(x ** 2).sum(axis=1))},
        diffusion=0.1, coupling=0.2, proliferation=0.1, E=0.01,
        poisson=0.45, sim_time=2, sim_time_step=1,
    )
    theta = sim.make_theta(sim.params.as_dict())
    aug = sim._augment_theta_with_operators({**theta, **sim.runtime_aux()})
    assert "_Bell_el_load" in aug, "streaming el residual not built"
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.standard_normal((mesh.n_nodes, 3)), sim.dtype)
    c = jnp.asarray(rng.random(mesh.n_nodes), sim.dtype)
    t = jnp.asarray(1.0, sim.dtype)

    got = np.asarray(sim.el_residual(u, c, aug, t))
    want = np.asarray(sim.el_residual(u, c, theta, t))  # matrix-free
    assert np.allclose(got, want, atol=1e-9), np.abs(got - want).max()


def test_bell_streaming_rd_residual_matches_matrix_free():
    """The streamed rd residual (W_const c + dtρ/c_max ∫c²φ − M c_prev −
    load, models/base.py bell branch + ops/bell.py build_bell_mass) equals
    the matrix-free per-cell Fisher-KPP evaluation on an unstructured
    mesh (reference weak form simulation_tumor_growth.py:115-120)."""
    from glimslib_tpu.models.tumor_growth import TumorGrowth

    mesh = _morton(box_mesh((-1, -1, -1), (1, 1, 1), 5, 5, 5))

    class Boundary:
        def inside(self, x, on_boundary):
            return on_boundary

    sim = TumorGrowth(mesh)
    sim.setup_global_parameters(
        boundaries={"all": Boundary()},
        dirichlet_bcs={"clamped": {"bc_value": np.zeros(3),
                                   "named_boundary": "all",
                                   "subspace_id": 0}},
    )
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(3),
                       1: lambda x: np.exp(-(x ** 2).sum(axis=1))},
        diffusion=0.1, coupling=0.2, proliferation=0.1, E=0.01,
        poisson=0.45, sim_time=2, sim_time_step=1,
    )
    theta = sim.make_theta(sim.params.as_dict())
    aug = sim._augment_theta_with_operators({**theta, **sim.runtime_aux()})
    assert "_Bell_rd_load" in aug, "streaming rd residual not built"
    rng = np.random.default_rng(7)
    c = jnp.asarray(rng.random(mesh.n_nodes), sim.dtype)
    c_prev = jnp.asarray(rng.random(mesh.n_nodes), sim.dtype)
    t = jnp.asarray(1.0, sim.dtype)

    got = np.asarray(sim.rd_residual(c, c_prev, aug, t))
    want = np.asarray(sim.rd_residual(c, c_prev, theta, t))  # matrix-free
    assert np.allclose(got, want, atol=1e-9), np.abs(got - want).max()
