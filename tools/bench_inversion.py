"""Reference-schedule inversion at flagship scale (VERDICT r4 #6).

The reference's inverse runs use a 50-timestep horizon per functional
evaluation with 5 tied per-tissue parameters and bounded L-BFGS-B
(test_case_simulation_tumor_growth_brain_2D_atlas_reduced_domain_adjoint_mpi_separated_functional.py:66-67;
L-BFGS-B defaults image_based_optimization.py:711-733), and instrument
``total_time_optimization_seconds`` (l.614-644).  This tool measures the
rebuild's equivalent end to end on the flagship 197k-tet unstructured
mesh: synthetic ground truth from a forward run at the true parameters,
then a bounded 5-param L-BFGS-B inversion from a perturbed start.

Reports one JSON line: wall-clock (total + per value_and_grad), number of
functional evaluations, final objective, and recovered-parameter relative
errors.

Usage (TPU):  python tools/bench_inversion.py
Env: GLIMS_INV_N (mesh n, default 32), GLIMS_INV_STEPS (default 50),
     GLIMS_INV_MAXITER (L-BFGS-B iterations, default 12),
     GLIMS_PLATFORM=cpu for a small CPU smoke run.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main():
    import jax

    if os.environ.get("GLIMS_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["GLIMS_PLATFORM"])
        if os.environ["GLIMS_PLATFORM"] == "cpu":
            jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from __graft_entry__ import _brain_sim
    from glimslib_tpu.core.mesh import Mesh
    from glimslib_tpu.optimize.adjoint import (
        InverseProblem, param_map_for_type, thresh,
    )
    from glimslib_tpu.solvers.coupled import StepConfig

    n = int(os.environ.get("GLIMS_INV_N", "32"))
    n_steps = int(os.environ.get("GLIMS_INV_STEPS", "50"))
    maxiter = int(os.environ.get("GLIMS_INV_MAXITER", "12"))
    dtype = jnp.float32 if jax.default_backend() != "cpu" else (
        jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    )

    sim = _brain_sim(n=n, dims=3, dtype=dtype,
                     mesh_transform=lambda m: Mesh.from_arrays(
                         m.points, m.cells).reordered_morton())
    if dtype == jnp.float32:
        # same operating point as the flagship adjoint bench extra
        # (bench.py run_adjoint; rd forcing rationale documented there)
        sim.step_config = StepConfig(
            newton_rtol=1e-4, newton_atol=1e-5, cg_rtol=1e-7,
            cg_maxiter=800, rd_cg_rtol=1e-3,
            precond_degree=sim.step_config.precond_degree,
        )

    # ground truth = the setup parameters (D_WM=0.1, rho_WM=0.1,
    # D_GM=0.02, rho_GM=0.02, coupling=0.15 — __graft_entry__._brain_sim)
    true_v = np.array([0.1, 0.02, 0.1, 0.02, 0.15])
    names, update = param_map_for_type(5)

    theta = sim.make_theta(sim.params.as_dict())
    iv = sim.params.create_initial_value_function()
    u0 = jnp.asarray(iv[0], dtype=dtype)
    c0 = jnp.asarray(iv[1], dtype=dtype)
    simulate = jax.jit(sim.build_simulate_fn(n_steps, 1.0))
    aux = sim.runtime_aux()
    t0 = time.perf_counter()
    out = simulate(theta, u0, c0, aux) if aux else simulate(theta, u0, c0)
    jax.block_until_ready(out)
    t_forward_cold = time.perf_counter() - t0
    u_traj, c_traj, ok, _ = out
    assert bool(np.asarray(ok).all()), "ground-truth forward diverged"
    targets = {
        "conc_T2": np.asarray(thresh(c_traj[-1], 0.12)),
        "conc_T1": np.asarray(thresh(c_traj[-1], 0.80)),
        "disp": np.asarray(u_traj[-1]),
    }

    ip = InverseProblem(sim, names, targets, update_fn=update,
                        n_steps=n_steps, dt=1.0)
    x0 = np.array([0.05, 0.01, 0.05, 0.01, 0.08])
    # compile + one timed value_and_grad
    t0 = time.perf_counter()
    J0, g0 = ip.value_and_grad(x0)
    t_vg_cold = time.perf_counter() - t0
    assert np.isfinite(g0).all()
    t0 = time.perf_counter()
    ip.value_and_grad(x0)
    t_vg = time.perf_counter() - t0

    t0 = time.perf_counter()
    x_opt, progress, result = ip.minimize(
        x0, bounds=[(0.005, 0.5)] * 5,
        opt_params={"maxiter": maxiter},
    )
    t_opt = time.perf_counter() - t0
    rel_err = np.abs((np.asarray(x_opt) - true_v) / true_v)
    rec = {
        "mesh_cells": int(sim.mesh.n_cells),
        "n_steps": n_steps,
        "n_params": 5,
        "maxiter": maxiter,
        "n_evals": len(progress.eval_records),
        "forward_cold_s": round(t_forward_cold, 2),
        "value_and_grad_cold_s": round(t_vg_cold, 2),
        "value_and_grad_s": round(t_vg, 2),
        "total_time_optimization_seconds": round(t_opt, 2),
        "J0": float(J0),
        "J_final": float(result.fun),
        "x_opt": [round(float(x), 6) for x in x_opt],
        "param_rel_err": [round(float(e), 4) for e in rel_err],
    }
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
