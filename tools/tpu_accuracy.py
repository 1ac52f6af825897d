"""Quantify f32 TPU accuracy vs the f64 CPU reference on north-star configs.

SURVEY §7 hard part #1: the 1e-6 rel-L2 parity target is demonstrated in
f64 on CPU; the TPU runs f32.  This tool measures what the f32 path
actually delivers on the north-star configurations, with and without the
f64-carry accuracy mode (GLIMS_F64_CARRY, mixed-precision residual
refinement).

Usage:  python tools/tpu_accuracy.py          # f32 on the default backend
        GLIMS_PLATFORM=cpu python tools/tpu_accuracy.py   # f32-on-CPU control

Prints one JSON line per config:
  {"config", "rel_c", "rel_u", "dtype", "backend"}
"""

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import jax

if os.environ.get("GLIMS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GLIMS_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# x64 on: needed by the GLIMS_REFINE_F64 mixed-precision mode (the f32 runs
# below pin their dtypes explicitly, so this does not change the f32 path)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp


class Boundary:
    def inside(self, x, on_boundary):
        return on_boundary


def build_2d(n=50, steps=5, dtype=None):
    """Reference 2D uniform config (test_case_..._2D_uniform.py:33-79)."""
    from glimslib_tpu.core.mesh import rectangle_mesh
    from glimslib_tpu.models.tumor_growth import TumorGrowth

    mesh = rectangle_mesh((-5, -5), (5, 5), n, n)
    sim = TumorGrowth(mesh, dtype=dtype)
    sim.setup_global_parameters(
        boundaries={"boundary_all": Boundary()},
        dirichlet_bcs={"clamped": {"bc_value": np.zeros(2),
                                   "named_boundary": "boundary_all",
                                   "subspace_id": 0}},
    )
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(2),
                       1: lambda x: np.exp(-(x**2).sum(axis=1))},
        diffusion=0.1, coupling=1.0, proliferation=0.1, E=0.001, poisson=0.45,
        sim_time=steps, sim_time_step=1,
    )
    return sim, steps


def build_3d(n=16, steps=5, dtype=None):
    """3D brain-style 4-tissue config (bench.py problem at small n)."""
    from glimslib_tpu.core.mesh import box_mesh
    from glimslib_tpu.models.tumor_growth_brain import TumorGrowthBrain

    mesh = box_mesh((0, 0, 0), (8, 8, 8), n, n, n)
    r = np.linalg.norm((mesh.points - 4.0) / 4.0, axis=1)
    labels = np.zeros(mesh.n_nodes)
    labels[r < 0.95] = 1
    labels[r < 0.8] = 2
    labels[r < 0.6] = 3
    labels[r < 0.2] = 4
    sim = TumorGrowthBrain(mesh, dtype=dtype)
    sim.setup_global_parameters(
        label_function=labels,
        domain_names={0: "outside", 1: "CSF", 2: "GM", 3: "WM",
                      4: "Ventricles"},
        boundaries={"boundary_all": Boundary()},
        dirichlet_bcs={"clamped": {"bc_value": np.zeros(3),
                                   "named_boundary": "boundary_all",
                                   "subspace_id": 0}},
    )
    center = np.array([4.5, 4.0, 4.0])
    sim.setup_model_parameters(
        iv_expression={0: np.zeros(3),
                       1: lambda x: np.exp(-((x - center) ** 2).sum(axis=1))},
        E_GM=3e3, E_WM=3e3, E_CSF=1e3, E_VENT=1e3,
        nu_GM=0.45, nu_WM=0.45, nu_CSF=0.45, nu_VENT=0.3,
        D_GM=0.02, D_WM=0.1, rho_GM=0.02, rho_WM=0.1, coupling=0.15,
        sim_time=steps, sim_time_step=1,
    )
    return sim, steps


def reference_f64(name, build, **kw):
    """f64 ground truth via the independent scipy FEM (CPU, exact solves)."""
    sim, steps = build(**kw)
    from reference_fem import ReferenceFEM

    mesh = sim.mesh
    ref = ReferenceFEM(mesh)
    theta = sim.make_theta(sim.params.as_dict())
    D = np.asarray(theta["D"], dtype=np.float64)
    rho = np.asarray(theta["rho"], dtype=np.float64)
    mu = np.asarray(theta["mu"], dtype=np.float64)
    lam = np.asarray(theta["lam"], dtype=np.float64)
    coupling = float(np.asarray(theta["coupling"]))
    iv = sim.params.create_initial_value_function()
    c = np.asarray(iv[1], dtype=np.float64)
    u = np.zeros(mesh.n_nodes * mesh.dim)
    bn = mesh.boundary_nodes
    for _ in range(steps):
        u, c = ref.solve_step(
            u, c, D, rho, mu, lam, coupling, 1.0,
            dirichlet_disp_nodes=bn,
            dirichlet_disp_values=np.zeros((len(bn), mesh.dim)),
        )
    return u, c


def run_f32(build, **kw):
    from glimslib_tpu import config as glims_config
    from glimslib_tpu.solvers.coupled import StepConfig

    sim, steps = build(dtype=jnp.float32, **kw)
    if glims_config.resolve_profile() == "reference":
        # the reference-tolerance operating point (PETSc KSP rtol 1e-5,
        # VERDICT r4 #3) — its accuracy is a published claim next to the
        # default profile's; keep the model ctor's StepConfig as-is
        pass
    else:
        sim.step_config = StepConfig(
            newton_rtol=1e-5, newton_atol=1e-6, cg_rtol=3e-7, cg_maxiter=2000,
            precond_degree=int(os.environ.get("GLIMS_PRECOND_DEGREE", "0")),
            # default flags ("auto") resolve to ON: f32 model + x64 enabled
            refine_f64=glims_config.resolve_refine_f64(jnp.float32),
        )
    theta = sim.make_theta(sim.params.as_dict())
    theta = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32)
        if jnp.asarray(a).dtype.kind == "f" else a, theta,
    )
    iv = sim.params.create_initial_value_function()
    u0 = jnp.asarray(iv[0], jnp.float32)
    c0 = jnp.asarray(iv[1], jnp.float32)
    simulate = jax.jit(sim.build_simulate_fn(steps, 1.0))
    u_traj, c_traj, ok, _ = simulate(theta, u0, c0)
    assert bool(np.asarray(ok).all()), "f32 run did not converge"
    return np.asarray(u_traj[-1]), np.asarray(c_traj[-1])


def main():
    backend = jax.default_backend()
    for name, build, kw in [
        ("2d_uniform_50", build_2d, {}),
        ("3d_brain_16", build_3d, {}),
    ]:
        u_ref, c_ref = reference_f64(name, build, **kw)
        u32, c32 = run_f32(build, **kw)
        rel_c = float(
            np.linalg.norm(c32.astype(np.float64) - c_ref)
            / np.linalg.norm(c_ref)
        )
        rel_u = float(
            np.linalg.norm(u32.astype(np.float64).ravel() - u_ref.ravel())
            / max(np.linalg.norm(u_ref), 1e-300)
        )
        from glimslib_tpu import config as glims_config

        print(json.dumps({
            "config": name, "rel_c": f"{rel_c:.3e}", "rel_u": f"{rel_u:.3e}",
            "dtype": "float32", "backend": backend,
            "profile": glims_config.resolve_profile(),
            "refine_f64": (
                glims_config.resolve_profile() != "reference"
                and glims_config.resolve_refine_f64(jnp.float32)
            ),
        }), flush=True)


if __name__ == "__main__":
    main()
