"""Time the unstructured flagship step on the current backend with and
without the two-level preconditioner (GLIMS_TWOLEVEL)."""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

if os.environ.get("GLIMS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GLIMS_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

import jax.numpy as jnp

from __graft_entry__ import _brain_sim
from glimslib_tpu.core.mesh import Mesh
from glimslib_tpu.solvers.coupled import StepConfig

N_STEPS = 5


def run(n, flag):
    os.environ["GLIMS_TWOLEVEL"] = flag
    dtype = jnp.float32 if jax.default_backend() != "cpu" else (
        jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32)
    sim = _brain_sim(n=n, dims=3, dtype=dtype,
                     mesh_transform=lambda m: Mesh.from_arrays(
                         m.points, m.cells).reordered_morton())
    if dtype == jnp.float32:
        sim.step_config = StepConfig(
            newton_rtol=1e-4, newton_atol=1e-5, cg_rtol=1e-7, cg_maxiter=800,
            precond_degree=sim.step_config.precond_degree)
    theta0 = sim.make_theta(sim.params.as_dict())
    iv = sim.params.create_initial_value_function()
    u0 = jnp.asarray(iv[0], dtype=dtype)
    c0 = jnp.asarray(iv[1], dtype=dtype)
    t_set0 = time.perf_counter()
    simulate = jax.jit(sim.build_simulate_fn(N_STEPS, 1.0))
    aux = sim.runtime_aux()
    jax.block_until_ready(aux)
    t_setup = time.perf_counter() - t_set0
    args = (theta0, u0, c0, aux) if aux else (theta0, u0, c0)
    t0 = time.perf_counter()
    traj = simulate(*args)
    jax.block_until_ready(traj)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    traj = simulate(*args)
    jax.block_until_ready(traj)
    dt = (time.perf_counter() - t0) / N_STEPS
    ok = np.asarray(traj[2]).all()
    print(f"n={n} twolevel={flag}: {dt*1e3:.1f} ms/step "
          f"({N_STEPS/ (dt*N_STEPS):.2f} steps/s) ok={ok} "
          f"setup(incl aux) {t_setup:.1f}s compile+run {t_compile:.1f}s",
          flush=True)
    return np.asarray(traj[0][-1]), np.asarray(traj[1][-1])


def main():
    n = int(os.environ.get("GLIMS_PROF_N", "32"))
    u0_, c0_ = run(n, "0")
    u1_, c1_ = run(n, "1")
    print("final diffs: u", np.abs(u0_ - u1_).max(),
          "c", np.abs(c0_ - c1_).max(), flush=True)


if __name__ == "__main__":
    main()
