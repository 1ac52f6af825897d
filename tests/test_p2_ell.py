"""Assembled P2 rd Jacobian (ops/p2_ell.py) vs the matrix-free jvp.

The quadrature-exact factored entries (constant reference tensors M0/T/C
contracted with per-cell geometry) must reproduce J v = d/de R(c + e v)
of P2Kernels.rd_residual to float round-off, and the quad-model step must
route through the assembled operator (VERDICT r3 #6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glimslib_tpu.core.mesh import Mesh, box_mesh
from glimslib_tpu.ops import bell as bell_mod
from glimslib_tpu.ops import p2_ell
from glimslib_tpu.ops.p2 import P2Kernels


@pytest.fixture(scope="module")
def setup():
    m = box_mesh((0, 0, 0), (1, 1, 1), 4, 4, 4)
    mesh = Mesh.from_arrays(m.points, m.cells).reordered_morton()
    p2k = P2Kernels(mesh, dtype=jnp.float64)
    plan = p2_ell.make_p2_plan(p2k, s=16)
    return mesh, p2k, plan


def test_jacobian_matches_jvp(setup):
    mesh, p2k, plan = setup
    rng = np.random.default_rng(3)
    c = jnp.asarray(rng.random(p2k.n_dofs))
    v = jnp.asarray(rng.standard_normal(p2k.n_dofs))
    cp = jnp.asarray(rng.random(p2k.n_dofs))
    D = jnp.asarray(0.05 + 0.02 * np.asarray(mesh.cell_midpoints)[:, 0])
    rho = jnp.asarray(0.1 + 0.05 * np.asarray(mesh.cell_midpoints)[:, 1])
    dt = 0.7

    resid = lambda cc: p2k.rd_residual(cc, cp, D, rho, dt, source=0.2,
                                       conc_max=1.0)
    want = jax.jvp(resid, (c,), (v,))[1]

    halo = plan.tables()[plan.prefix + "Halo"]
    W = p2_ell.build_p2_rd_const(plan, p2k, D, rho, dt, jnp.float64)
    W = W + p2_ell.build_p2_rd_wc(plan, p2k, c, rho, dt, 1.0, jnp.float64)
    got = bell_mod.apply_bell_scalar(plan, halo, W, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-9, atol=1e-11)


def test_lumped_chord_is_row_sum(setup):
    mesh, p2k, plan = setup
    rng = np.random.default_rng(5)
    c = jnp.asarray(rng.random(p2k.n_dofs))
    rho, dt = 0.3, 0.5
    halo = plan.tables()[plan.prefix + "Halo"]
    Wc = p2_ell.build_p2_rd_wc(plan, p2k, c, rho, dt, 1.0, jnp.float64)
    rowsum = bell_mod.apply_bell_scalar(
        plan, halo, Wc, jnp.ones(p2k.n_dofs)
    )
    dl = p2_ell.build_p2_rd_wc_lumped(plan, p2k, c, rho, dt, 1.0,
                                      jnp.float64)
    np.testing.assert_allclose(np.asarray(dl), np.asarray(rowsum),
                               rtol=1e-9, atol=1e-12)


def test_quad_model_routes_assembled(tmp_path):
    """The unstructured quad model's step must use the assembled P2 rd
    Jacobian + supernode preconditioner and converge to the same states
    as the matrix-free path."""
    from glimslib_tpu.models.tumor_growth_quad import TumorGrowth

    m = box_mesh((0, 0, 0), (6, 6, 6), 5, 5, 5)
    mesh = Mesh.from_arrays(m.points, m.cells).reordered_morton()

    class B:
        def inside(self, x, on_boundary):
            return on_boundary

    def build(use_p2bell):
        import os

        os.environ["GLIMS_P2BELL"] = "1" if use_p2bell else "0"
        sim = TumorGrowth(mesh)
        sim.setup_global_parameters(
            boundaries={"boundary_all": B()},
            dirichlet_bcs={
                "clamped": {"bc_value": np.zeros(3),
                            "named_boundary": "boundary_all",
                            "subspace_id": 0}
            },
        )
        sim.setup_model_parameters(
            iv_expression={
                0: np.zeros(3),
                1: lambda x: np.exp(-((x - 3.0) ** 2).sum(axis=1)),
            },
            diffusion=0.1, coupling=0.1, proliferation=0.1, E=100.0,
            poisson=0.4, sim_time=2, sim_time_step=1,
        )
        theta = sim.make_theta(sim.params.as_dict())
        iv = sim.params.create_initial_value_function()
        aux = sim.runtime_aux()
        f = jax.jit(sim.build_simulate_fn(2, 1.0))
        args = (theta, jnp.asarray(iv[0], sim.dtype),
                jnp.asarray(iv[1], sim.dtype))
        out = f(*args, aux) if aux else f(*args)
        return sim, out

    import os

    old = os.environ.get("GLIMS_P2BELL")
    try:
        sim_a, out_a = build(True)
        assert sim_a._use_p2_bell()
        rd_jac, el_op = sim_a._ell_builders()
        assert rd_jac is not None, "P2 rd Jacobian not assembled"
        assert sim_a._rd_jacobian_chord is not None
        sim_b, out_b = build(False)
        assert not sim_b._use_p2_bell()
    finally:
        if old is None:
            os.environ.pop("GLIMS_P2BELL", None)
        else:
            os.environ["GLIMS_P2BELL"] = old
    assert bool(np.asarray(out_a[2]).all())
    assert bool(np.asarray(out_b[2]).all())
    # same converged states (different Jacobian routes, same residuals)
    np.testing.assert_allclose(
        np.asarray(out_a[1]), np.asarray(out_b[1]), atol=5e-8
    )
    np.testing.assert_allclose(
        np.asarray(out_a[0]), np.asarray(out_b[0]), atol=5e-8
    )


def test_streamed_p2_residual_matches_quadrature(setup):
    """The streamed P2 rd residual (W_const c + factored cubic − M c_prev
    − load, models/tumor_growth_quad.py) must equal the quadrature
    evaluation to round-off: identical degree-6 sums, re-associated."""
    mesh, p2k, plan = setup
    rng = np.random.default_rng(11)
    c = jnp.asarray(rng.random(p2k.n_dofs))
    cp = jnp.asarray(rng.random(p2k.n_dofs))
    D = jnp.asarray(0.05 + 0.02 * np.asarray(mesh.cell_midpoints)[:, 0])
    rho = jnp.asarray(0.1 + 0.05 * np.asarray(mesh.cell_midpoints)[:, 1])
    dt, src = 0.7, 0.15

    want = p2k.rd_residual(c, cp, D, rho, dt, source=src, conc_max=1.0)

    halo = plan.tables()[plan.prefix + "Halo"]
    from glimslib_tpu.ops.bell import apply_bell_scalar

    W = p2_ell.build_p2_rd_const(plan, p2k, D, rho, dt, jnp.float64)
    M = plan.assemble(p2_ell.p2_mass_entries(p2k, jnp.float64))
    zero = jnp.zeros(p2k.n_dofs)
    load = -p2k.rd_residual(zero, zero, D, rho, dt, source=src)
    got = (
        apply_bell_scalar(plan, halo, W, c)
        - apply_bell_scalar(plan, halo, M, cp)
        + p2_ell.p2_cubic_residual(plan, p2k, c, rho, dt, 1.0, jnp.float64)
        - load
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-10, atol=1e-12)


def test_chunked_assembly_matches_plain(setup, monkeypatch):
    """assemble_scalar_chunked == plan.assemble bit-for-bit on the same
    entries (tiny threshold + tiny chunks force every lax.map path).  The
    chunked route (parity to reduction round-off) is what makes the P2
    flagship plan (248M dense slots) compile at all on the 16 GB chip — the one-shot gathers' lane-padded
    intermediates plan as tens of GB (ops/bell.py assemble_scalar_chunked
    docstring)."""
    mesh, p2k, plan = setup
    rng = np.random.default_rng(7)
    D = jnp.asarray(0.1 + 0.02 * np.asarray(mesh.cell_midpoints)[:, 0])
    rho = jnp.asarray(0.1 + 0.05 * np.asarray(mesh.cell_midpoints)[:, 1])
    ent = p2_ell._const_entries(p2k, D, rho, 0.7, jnp.float64)

    want = np.asarray(plan.assemble(ent))
    got = np.asarray(bell_mod.assemble_scalar_chunked(
        plan, ent, rows_per_chunk=1000
    ))
    np.testing.assert_allclose(got, want, rtol=1e-14, atol=1e-16)

    # the size-gated router picks the chunked path above the threshold
    monkeypatch.setenv("GLIMS_ASSEMBLE_CHUNK_SLOTS", "1")
    got2 = np.asarray(bell_mod.assemble_maybe_chunked(plan, ent))
    np.testing.assert_allclose(got2, want, rtol=1e-14, atol=1e-16)


def test_p2_cache_per_channel_matches_dense(setup):
    """build_p2_cache channels reduced with theta scalars == the dense
    build_p2_rd_const plane (factored-vs-dense parity at the P2 level;
    the flagship cache build runs per channel + chunked)."""
    from glimslib_tpu.ops import bell_factored

    mesh, p2k, plan = setup
    labels = (np.asarray(mesh.points)[:, 0] > 0.5).astype(np.int64) + 1
    cell_labels = labels[np.asarray(mesh.cells)[:, 0]]
    D_by = {1: 0.02, 2: 0.1}
    rho_by = {1: 0.03, 2: 0.2}
    D = jnp.asarray([D_by[int(c)] for c in cell_labels])
    rho = jnp.asarray([rho_by[int(c)] for c in cell_labels])
    dt = 0.7

    want = np.asarray(p2_ell.build_p2_rd_const(
        plan, p2k, D, rho, dt, jnp.float64
    ))
    cache = bell_factored.build_p2_cache(
        plan, p2k, cell_labels, jnp.float64, want_mass=False
    )
    theta = dict(cache)
    theta.update({"D": D, "rho": rho, "dt": dt})
    planes = bell_factored.p2_planes_from_theta(
        theta, jnp.float64, want_mass=False
    )
    np.testing.assert_allclose(np.asarray(planes[0]), want,
                               rtol=1e-13, atol=1e-13)


def test_chunked_halo_matches_flat(setup):
    """A halo_chunk=4 plan's assembled matvec == the flat-halo plan's
    (identical operator, chunk-padded slots carry zeros) — the layout
    that makes the flagship P2 matvec halo-gather cost ~G x cheaper."""
    mesh, p2k, plan = setup
    from glimslib_tpu.ops.bell import BellPlan, apply_bell_scalar

    plan4 = BellPlan(conn=np.asarray(p2k.cell_dofs), n=p2k.n_dofs, s=16,
                     prefix="_P2B", halo_chunk=4)
    assert plan4.Khe == plan4.khe_rows * 4
    rng = np.random.default_rng(11)
    D = jnp.asarray(0.1 + 0.02 * np.asarray(mesh.cell_midpoints)[:, 0])
    rho = jnp.asarray(0.1 + 0.05 * np.asarray(mesh.cell_midpoints)[:, 1])
    v = jnp.asarray(rng.standard_normal(p2k.n_dofs))

    W1 = p2_ell.build_p2_rd_const(plan, p2k, D, rho, 0.7, jnp.float64)
    W4 = p2_ell.build_p2_rd_const(plan4, p2k, D, rho, 0.7, jnp.float64)
    y1 = np.asarray(apply_bell_scalar(
        plan, jnp.asarray(plan.ext_ids), W1, v))
    y4 = np.asarray(apply_bell_scalar(
        plan4, jnp.asarray(plan4.ext_ids), W4, v))
    np.testing.assert_allclose(y4, y1, rtol=1e-12, atol=1e-13)
