"""Quad (P2 concentration) vs P1 step time on the same unstructured mesh.

VERDICT r3 #6 Done criterion: with the assembled P2 rd Jacobian
(ops/p2_ell.py) the quad model's step should sit within ~3x of the P1
step on the same mesh (the quad model is the reference workflow's
production model, image_based_optimization.py:26).

Usage: [GLIMS_PLATFORM=cpu] python tools/bench_p2.py [n]
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N_STEPS = 5


def main():
    import jax

    if os.environ.get("GLIMS_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["GLIMS_PLATFORM"])
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from glimslib_tpu.core.mesh import Mesh, box_mesh
    from glimslib_tpu.models.tumor_growth import TumorGrowth as P1Model
    from glimslib_tpu.models.tumor_growth_quad import TumorGrowth as P2Model
    from glimslib_tpu.solvers.coupled import StepConfig

    m = box_mesh((0, 0, 0), (10, 10, 10), N, N, N)
    mesh = Mesh.from_arrays(m.points, m.cells).reordered_morton()
    dtype = jnp.float32 if jax.default_backend() != "cpu" else (
        jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    )

    class B:
        def inside(self, x, on_boundary):
            return on_boundary

    def run(model_cls, label):
        sim = model_cls(mesh, dtype=dtype)
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
                1: lambda x: np.exp(-((x - 5.0) ** 2).sum(axis=1) / 0.5),
            },
            diffusion=0.1, coupling=0.15, proliferation=0.1, E=3e3,
            poisson=0.45, sim_time=N_STEPS, sim_time_step=1,
        )
        if dtype == jnp.float32:
            sim.step_config = StepConfig(
                newton_rtol=1e-4, newton_atol=1e-5, cg_rtol=1e-7,
                cg_maxiter=800, rd_cg_rtol=1e-3,
                precond_degree=sim.step_config.precond_degree,
            )
        theta = sim.make_theta(sim.params.as_dict())
        iv = sim.params.create_initial_value_function()
        u0 = jnp.asarray(iv[0], dtype)
        c0 = jnp.asarray(iv[1], dtype)
        aux = sim.runtime_aux()
        f = jax.jit(sim.build_simulate_fn(N_STEPS, 1.0))
        args = (theta, u0, c0, aux) if aux else (theta, u0, c0)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = f(*args)
            jax.block_until_ready(out)
        dt_run = (time.perf_counter() - t0) / reps
        ok = bool(np.asarray(out[2]).all())
        sps = N_STEPS / dt_run
        print(f"{label}: {sps:.2f} steps/s ok={ok} "
              f"(n_dofs_c={'%d' % (sim.p2.n_dofs if hasattr(sim, 'p2') else mesh.n_nodes)})",
              flush=True)
        return sps

    print(f"mesh: {mesh.n_nodes} nodes, {mesh.n_cells} tets "
          f"(N={N}, backend={jax.default_backend()})")
    p1 = run(P1Model, "P1 ")
    os.environ["GLIMS_P2BELL"] = "1"
    p2 = run(P2Model, "P2 assembled")
    os.environ["GLIMS_P2BELL"] = "0"
    p2mf = run(P2Model, "P2 matrix-free")
    print(f"ratio P1/P2-assembled: {p1 / p2:.2f}x; "
          f"matrix-free was {p1 / p2mf:.2f}x")
    # the honest normalization: P2 carries (n_nodes + n_edges) ~ 7.3x the
    # concentration dofs of P1 on the same mesh, so equal-WORK throughput
    # differs from equal-MESH throughput by that factor
    n_p1 = mesh.n_nodes
    n_p2 = None
    try:
        from glimslib_tpu.ops.p2 import P2Kernels

        n_p2 = P2Kernels(mesh).n_dofs
    except Exception:
        pass
    if n_p2:
        per_dof = (p1 * n_p1) / (p2 * n_p2)
        print(f"per-concentration-dof ratio P1/P2-assembled: {per_dof:.2f}x "
              f"({n_p2} P2 dofs vs {n_p1} P1 dofs)")


if __name__ == "__main__":
    main()
