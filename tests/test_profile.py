"""GLIMS_PROFILE operating points (VERDICT r4 #3).

The reference solves at PETSc defaults — SNES with default Krylov
tolerances, i.e. KSP rtol 1e-5 (reference simulation_tumor_growth.py:
126-140) — while the rebuild's default ('accurate') profile runs the
elasticity CG at rtol 1e-7 (f32) / 1e-12 (f64).  GLIMS_PROFILE=reference
reproduces the reference's accuracy/speed point; both points are
published in docs/numerics.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glimslib_tpu.core.mesh import Mesh, box_mesh
from glimslib_tpu.models.tumor_growth import TumorGrowth


class _B:
    def inside(self, x, on_boundary):
        return on_boundary


def _sim(n=5):
    m = box_mesh((0, 0, 0), (6, 6, 6), n, n, n)
    mesh = Mesh.from_arrays(m.points, m.cells).reordered_morton()
    sim = TumorGrowth(mesh)
    sim.setup_global_parameters(
        boundaries={"boundary_all": _B()},
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
    return sim


def _run(sim, n_steps=2):
    theta = sim.make_theta(sim.params.as_dict())
    iv = sim.params.create_initial_value_function()
    aux = sim.runtime_aux()
    f = jax.jit(sim.build_simulate_fn(n_steps, 1.0))
    args = (theta, jnp.asarray(iv[0], sim.dtype),
            jnp.asarray(iv[1], sim.dtype))
    return f(*args, aux) if aux else f(*args)


def test_reference_profile_sets_petsc_point(monkeypatch):
    monkeypatch.setenv("GLIMS_PROFILE", "reference")
    sim = _sim()
    assert sim.step_config.cg_rtol == 1e-5  # PETSc KSP default rtol
    assert sim.step_config.rd_cg_rtol == 1e-3  # DES forcing, inner CG only
    assert not sim.step_config.refine_f64
    if sim.dtype == jnp.float64:
        assert sim.step_config.newton_rtol == 1e-8


def test_default_profile_unchanged(monkeypatch):
    monkeypatch.delenv("GLIMS_PROFILE", raising=False)
    sim = _sim()
    if sim.dtype == jnp.float64:
        assert sim.step_config.cg_rtol == 1e-12
    else:
        assert sim.step_config.cg_rtol == 1e-7


def test_invalid_profile_raises(monkeypatch):
    monkeypatch.setenv("GLIMS_PROFILE", "fast")
    with pytest.raises(ValueError, match="GLIMS_PROFILE"):
        _sim()


def test_reference_profile_trajectory_close(monkeypatch):
    """Both profiles converge; the reference point agrees with the
    accurate point to ~the loosened linear tolerance (1e-5 relative on
    the linear elasticity block; Newton converges the exact rd residual
    in both)."""
    monkeypatch.delenv("GLIMS_PROFILE", raising=False)
    out_acc = _run(_sim())
    monkeypatch.setenv("GLIMS_PROFILE", "reference")
    out_ref = _run(_sim())
    assert bool(np.asarray(out_acc[2]).all())
    assert bool(np.asarray(out_ref[2]).all())
    for i, tol in ((0, 1e-4), (1, 1e-5)):
        a = np.asarray(out_acc[i])
        b = np.asarray(out_ref[i])
        scale = max(np.abs(a).max(), 1e-30)
        assert np.abs(a - b).max() / scale < tol, (i, np.abs(a - b).max())
