"""Cross-validation of the matrix-free JAX kernels against the independent
scipy sparse-assembly reference (tests/reference_fem.py).

This is the rebuild's equivalent of validating against FEniCS fields
(BASELINE.json north star: 1e-6 rel-L2; here both paths are float64 on the
same mesh, so agreement is ~1e-12)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glimslib_tpu.core.mesh import box_mesh, rectangle_mesh
from glimslib_tpu.ops.assembly import FacetKernels, P1Kernels

from reference_fem import ReferenceFEM


def _meshes():
    return [
        rectangle_mesh((-1, -1), (1, 1), 7, 5),
        box_mesh((0, 0, 0), (1, 1, 1), 3, 3, 3),
    ]


@pytest.mark.parametrize("mesh", _meshes(), ids=["tri", "tet"])
def test_mass_action(mesh):
    k = P1Kernels(mesh)
    ref = ReferenceFEM(mesh)
    rng = np.random.default_rng(0)
    c = rng.standard_normal(mesh.n_nodes)
    got = np.asarray(k.mass_residual(jnp.asarray(c)))
    want = ref.mass_matrix() @ c
    assert np.allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("mesh", _meshes(), ids=["tri", "tet"])
def test_stiffness_action(mesh):
    k = P1Kernels(mesh)
    ref = ReferenceFEM(mesh)
    rng = np.random.default_rng(1)
    c = rng.standard_normal(mesh.n_nodes)
    D = rng.uniform(0.5, 2.0, mesh.n_cells)
    got = np.asarray(k.stiffness_residual(jnp.asarray(c), jnp.asarray(D)))
    want = ref.stiffness_matrix(D) @ c
    assert np.allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("mesh", _meshes(), ids=["tri", "tet"])
def test_rd_residual_vs_reference(mesh):
    """Full Fisher-KPP implicit-Euler residual, heterogeneous coefficients."""
    k = P1Kernels(mesh)
    ref = ReferenceFEM(mesh)
    rng = np.random.default_rng(2)
    c = rng.uniform(0, 1, mesh.n_nodes)
    cp = rng.uniform(0, 1, mesh.n_nodes)
    D = rng.uniform(0.01, 0.2, mesh.n_cells)
    rho = rng.uniform(0.01, 0.2, mesh.n_cells)
    dt = 0.5

    got = np.asarray(
        k.rd_residual(jnp.asarray(c), jnp.asarray(cp), jnp.asarray(D), jnp.asarray(rho), dt)
    )
    M = ref.mass_matrix()
    K = ref.stiffness_matrix(D)
    Mrho = ref.mass_matrix_weighted_cell(rho)
    Nc = ref.quadratic_load_weighted_cell(c, rho)
    want = M @ (c - cp) + dt * (K @ c) - dt * (Mrho @ c - Nc)
    assert np.allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("mesh", _meshes(), ids=["tri", "tet"])
def test_elasticity_residual_vs_reference(mesh):
    k = P1Kernels(mesh)
    ref = ReferenceFEM(mesh)
    d = mesh.dim
    rng = np.random.default_rng(3)
    u = rng.standard_normal((mesh.n_nodes, d))
    c = rng.uniform(0, 1, mesh.n_nodes)
    mu = rng.uniform(0.5, 2.0, mesh.n_cells)
    lam = rng.uniform(0.5, 2.0, mesh.n_cells)
    coupling = 0.37

    got = np.asarray(
        k.elasticity_residual(
            jnp.asarray(u), jnp.asarray(c), jnp.asarray(mu), jnp.asarray(lam), coupling
        )
    )
    Ku = ref.elasticity_matrix(mu, lam)
    C = ref.coupling_matrix(mu, lam, coupling)
    want = (Ku @ u.ravel() - C @ c).reshape(mesh.n_nodes, d)
    assert np.allclose(got, want, atol=1e-11)


@pytest.mark.parametrize("mesh", _meshes(), ids=["tri", "tet"])
def test_body_force(mesh):
    k = P1Kernels(mesh)
    ref = ReferenceFEM(mesh)
    d = mesh.dim
    u = np.zeros((mesh.n_nodes, d))
    c = np.zeros(mesh.n_nodes)
    bf = np.arange(1.0, d + 1.0)
    got = np.asarray(
        k.elasticity_residual(jnp.asarray(u), jnp.asarray(c), 1.0, 1.0, 0.0, body_force=bf)
    )
    load = ref.load_vector(1.0)  # ∫ λ_i
    want = -np.outer(load, bf)
    assert np.allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("mesh", _meshes(), ids=["tri", "tet"])
def test_diagonals(mesh):
    """Jacobi preconditioner diagonals match the sparse-matrix diagonals."""
    k = P1Kernels(mesh)
    ref = ReferenceFEM(mesh)
    rng = np.random.default_rng(4)
    D = rng.uniform(0.5, 2.0, mesh.n_cells)
    mu = rng.uniform(0.5, 2.0, mesh.n_cells)
    lam = rng.uniform(0.5, 2.0, mesh.n_cells)
    dt = 0.25
    got_c = np.asarray(k.rd_mass_stiffness_diag(jnp.asarray(D), 0.0, dt))
    want_c = (ref.mass_matrix() + dt * ref.stiffness_matrix(D)).diagonal()
    assert np.allclose(got_c, want_c, atol=1e-12)
    got_u = np.asarray(k.elasticity_diag(jnp.asarray(mu), jnp.asarray(lam)))
    want_u = ref.elasticity_matrix(mu, lam).diagonal().reshape(mesh.n_nodes, mesh.dim)
    assert np.allclose(got_u, want_u, atol=1e-12)


@pytest.mark.parametrize("mesh", _meshes(), ids=["tri", "tet"])
def test_jvp_matches_fd(mesh):
    """Jacobian action via jax.jvp == finite differences of the residual."""
    k = P1Kernels(mesh)
    rng = np.random.default_rng(5)
    c = jnp.asarray(rng.uniform(0, 1, mesh.n_nodes))
    cp = jnp.asarray(rng.uniform(0, 1, mesh.n_nodes))
    v = jnp.asarray(rng.standard_normal(mesh.n_nodes))
    f = lambda x: k.rd_residual(x, cp, 0.1, 0.2, 1.0)
    _, jv = jax.jvp(f, (c,), (v,))
    eps = 1e-6
    fd = (f(c + eps * v) - f(c - eps * v)) / (2 * eps)
    assert np.allclose(np.asarray(jv), np.asarray(fd), atol=1e-6)


def test_facet_scalar_flux():
    """∫_Γ q φ ds over the whole boundary: constant q integrates to q*|Γ|."""
    mesh = rectangle_mesh((0, 0), (2, 1), 6, 3)
    fk = FacetKernels(mesh, np.arange(len(mesh.boundary_facet_area)), mesh.n_nodes)
    r = np.asarray(fk.scalar_flux_residual(3.0))
    assert np.isclose(r.sum(), 3.0 * 6.0)  # perimeter = 6
    # interior nodes untouched
    interior = np.setdiff1d(np.arange(mesh.n_nodes), mesh.boundary_nodes)
    assert np.allclose(r[interior], 0.0)


def test_facet_traction():
    mesh = box_mesh((0, 0, 0), (1, 1, 1), 2, 2, 2)
    fk = FacetKernels(mesh, np.arange(len(mesh.boundary_facet_area)), mesh.n_nodes)
    t = np.array([1.0, 2.0, -1.0])
    r = np.asarray(fk.traction_residual(jnp.asarray(t)))
    assert np.allclose(r.sum(axis=0), t * 6.0, atol=1e-12)  # surface area = 6


def test_elasticity_diag_blocks_match_reference():
    """Gather-path per-node diagonal blocks == scipy elasticity matrix
    diagonal blocks (and the scalar diagonal is their trace part)."""
    import jax.numpy as jnp
    from glimslib_tpu.core.mesh import box_mesh
    from glimslib_tpu.ops.assembly import P1Kernels
    from reference_fem import ReferenceFEM

    mesh = box_mesh((0, 0, 0), (1, 1, 2), 3, 3, 4)
    mids = mesh.cell_midpoints
    mu = 1.0 + mids[:, 0]
    lam = 2.0 + mids[:, 2]
    k = P1Kernels(mesh)
    B = np.asarray(k.elasticity_diag_blocks(jnp.asarray(mu), jnp.asarray(lam)))
    K = ReferenceFEM(mesh).elasticity_matrix(mu, lam).tocsr()
    d = mesh.dim
    for i in range(0, mesh.n_nodes, 7):
        want = K[d * i:d * i + d, d * i:d * i + d].toarray()
        assert np.allclose(B[i], want, rtol=1e-10), i
    diag = np.asarray(k.elasticity_diag(jnp.asarray(mu), jnp.asarray(lam)))
    assert np.allclose(np.einsum("naa->na", B) * 0 + B[:, range(d), range(d)],
                       diag, rtol=1e-10)
