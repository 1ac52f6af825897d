"""Benchmark: 3D brain-atlas forward solve, steps/sec on the local device.

The reference's headline configuration (BASELINE.md): the 3D brain forward
simulation (brain_atlas_mesh_3d.vtu, 4 tissue subdomains, sim_time 5, dt 1)
run with ``mpirun -np 4`` FEniCS on CPU.  The reference publishes no
numbers, so the baseline is measured in-situ: the independent sparse-matrix
FEM implementation (tests/reference_fem.py — classic assemble + direct
solve, the same execution model as the FEniCS stack) timed on the host CPU
for the identical problem, cached in BASELINE_CACHE.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

N = int(os.environ.get("GLIMS_BENCH_N", "32"))  # lattice resolution
N_STEPS = 5
CACHE = os.path.join(ROOT, "BASELINE_CACHE.json")

_T0 = time.monotonic()


def _phase(msg):
    """Stderr phase timestamps: axon service latency (remote compile /
    dispatch queue) varies by >10x between runs, so the driver tail must
    show WHERE a slow run spent its budget."""
    print(f"[bench +{time.monotonic() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def build_problem(dtype=None):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _brain_sim
    from glimslib_tpu.solvers.coupled import StepConfig

    sim = _brain_sim(n=N, dims=3, dtype=dtype)
    if dtype == jnp.float32:
        sim.step_config = StepConfig(
            newton_rtol=1e-4, newton_atol=1e-5, cg_rtol=1e-7, cg_maxiter=800
        )
    return sim


def run_tpu(n=None):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    dtype = jnp.float32 if jax.default_backend() != "cpu" else (
        jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    )
    if n is not None:
        from __graft_entry__ import _brain_sim
        from glimslib_tpu.solvers.coupled import StepConfig

        sim = _brain_sim(n=n, dims=3, dtype=dtype)
        if dtype == jnp.float32:
            sim.step_config = StepConfig(
                newton_rtol=1e-4, newton_atol=1e-5, cg_rtol=1e-7,
                cg_maxiter=800,
            )
    else:
        sim = build_problem(dtype=dtype)
    t_b = time.perf_counter()
    theta = sim.make_theta(sim.params.as_dict())
    iv = sim.params.create_initial_value_function()
    u0 = jnp.asarray(iv[0], dtype=dtype)
    c0 = jnp.asarray(iv[1], dtype=dtype)
    simulate = jax.jit(sim.build_simulate_fn(N_STEPS, 1.0))
    _phase(f"lattice n={n or N}: theta+trace {time.perf_counter()-t_b:.0f}s")
    # warmup/compile
    t_b = time.perf_counter()
    out = simulate(theta, u0, c0)
    jax.block_until_ready(out)
    _phase(f"lattice n={n or N}: compile+warm {time.perf_counter()-t_b:.0f}s")
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = simulate(theta, u0, c0)
        jax.block_until_ready(out)
    dt_run = (time.perf_counter() - t0) / reps
    ok = np.asarray(out[2])
    assert ok.all(), "bench solve did not converge"
    return sim, N_STEPS / dt_run  # steps per second


def run_unstructured(n=None, quad=False, profile=None):
    """Same physics on the mesh with lattice structure stripped and RCM
    ordering applied — exercises the matrix-free gather path (the
    reference's flagship 3D case is an unstructured CGAL mesh,
    test_case_simulation_tumor_growth_3D_atlas_mpi.py:32-136).

    ``quad=True`` runs the QUAD (P2-concentration) model — the family the
    reference's production workflow drives (image_based_optimization.py:26)
    — over the same mesh (VERDICT r4 #2).  ``profile='reference'`` times
    the reference-tolerance operating point (elasticity cg_rtol 1e-5 =
    PETSc KSP default, VERDICT r4 #3)."""
    import jax
    import jax.numpy as jnp

    from glimslib_tpu.core.mesh import Mesh
    from glimslib_tpu.solvers.coupled import StepConfig

    dtype = jnp.float32 if jax.default_backend() != "cpu" else (
        jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    )
    if n is None:
        n = int(os.environ.get("GLIMS_BENCH_N_UNSTRUCT", str(max(N // 2, 8))))
    from __graft_entry__ import _brain_sim

    sim = _brain_sim(n=n, dims=3, dtype=dtype, quad=quad,
                     mesh_transform=lambda m: Mesh.from_arrays(
                         m.points, m.cells).reordered_morton())
    if dtype == jnp.float32:
        # rd_cg_rtol: inexact-Newton forcing for the c-block inner solves
        # (solvers/coupled.py StepConfig) — Newton still converges the
        # exact residual to newton_rtol, measured end-state diff ~1e-6
        sim.step_config = StepConfig(
            newton_rtol=1e-4, newton_atol=1e-5,
            cg_rtol=1e-5 if profile == "reference" else 1e-7,
            cg_maxiter=800, rd_cg_rtol=1e-3,
            precond_degree=sim.step_config.precond_degree,
        )
    assert sim.mesh.lattice_strides is None, (
        "unstructured bench mesh must not carry lattice structure"
    )
    t_b = time.perf_counter()
    theta = sim.make_theta(sim.params.as_dict())
    iv = sim.params.create_initial_value_function()
    u0 = jnp.asarray(iv[0], dtype=dtype)
    c0 = jnp.asarray(iv[1], dtype=dtype)
    simulate = jax.jit(sim.build_simulate_fn(N_STEPS, 1.0))
    # frozen two-level coarse + mode arrays ride as a jit ARGUMENT
    # (solvers/twolevel.py; a closure constant would cost ~240 s compile)
    aux = sim.runtime_aux()
    _phase(f"unstruct n={n} quad={quad}: theta+aux "
           f"{time.perf_counter()-t_b:.0f}s")
    t_b = time.perf_counter()
    args = (theta, u0, c0, aux) if aux else (theta, u0, c0)
    out = simulate(*args)
    jax.block_until_ready(out)
    _phase(f"unstruct n={n} quad={quad}: compile+warm "
           f"{time.perf_counter()-t_b:.0f}s")
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = simulate(*args)
        jax.block_until_ready(out)
    dt_run = (time.perf_counter() - t0) / reps
    ok = np.asarray(out[2])
    assert ok.all(), "unstructured bench solve did not converge"
    return sim, sim.mesh.n_cells, N_STEPS / dt_run


def measure_baseline_unstructured(sim):
    """ILU-CG scipy FEM step on the same unstructured mesh — the
    reference-stack stand-in at flagship scale, where direct factorization
    is impractical (VERDICT r2 #1: the win must be measured, not
    asserted).  Expensive: computed only when cached or when
    GLIMS_BENCH_MEASURE_UNSTRUCT_BASELINE=1; cached per mesh size."""
    key = f"brain3d_unstruct_nodes{sim.mesh.n_nodes}_ilucg"
    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
    if key in cache:
        return cache[key]
    if os.environ.get("GLIMS_BENCH_MEASURE_UNSTRUCT_BASELINE", "0") != "1":
        return None
    from reference_fem import ReferenceFEM

    mesh = sim.mesh
    ref = ReferenceFEM(mesh)
    theta = sim.make_theta(sim.params.as_dict())
    iv = sim.params.create_initial_value_function()
    c = np.asarray(iv[1], dtype=np.float64)
    u = np.zeros(mesh.n_nodes * mesh.dim)
    bn = mesh.boundary_nodes
    t0 = time.perf_counter()
    ref.solve_step(
        u, c,
        np.asarray(theta["D"], np.float64), np.asarray(theta["rho"], np.float64),
        np.asarray(theta["mu"], np.float64), np.asarray(theta["lam"], np.float64),
        float(sim.params.as_dict()["coupling"]), 1.0,
        dirichlet_disp_nodes=bn,
        dirichlet_disp_values=np.zeros((len(bn), mesh.dim)),
        linear_solver="cg",
    )
    baseline_sps = 1.0 / (time.perf_counter() - t0)
    cache[key] = baseline_sps
    with open(CACHE, "w") as f:
        json.dump(cache, f, indent=1)
    return baseline_sps


def run_adjoint(n=None, unstructured=False):
    """Adjoint-gradient throughput: one value_and_grad of the 2-parameter
    inverse objective (the optimization workflow's inner loop,
    image_based_optimization.py:700-733).  ``unstructured=True`` runs it on
    the stripped/Morton-reordered mesh with the full assembled-operator
    stack engaged (the reference's flagship geometry is an unstructured
    CGAL mesh) — the IFT adjoint then runs over the bell/two-level
    operators."""
    import jax
    import jax.numpy as jnp

    from glimslib_tpu.optimize.adjoint import (
        InverseProblem, param_map_for_type, thresh,
    )

    dtype = jnp.float32 if jax.default_backend() != "cpu" else (
        jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    )
    if n is None:
        n = int(os.environ.get("GLIMS_BENCH_N_ADJ", "16"))
    from __graft_entry__ import _brain_sim

    mesh_transform = None
    if unstructured:
        from glimslib_tpu.core.mesh import Mesh

        mesh_transform = lambda m: Mesh.from_arrays(
            m.points, m.cells).reordered_morton()
    sim = _brain_sim(n=n, dims=3, dtype=dtype, mesh_transform=mesh_transform)
    if dtype == jnp.float32:
        from glimslib_tpu.solvers.coupled import StepConfig

        # rd_cg_rtol=1e-3 with newton_rtol=1e-4 is DELIBERATE (advisor r4
        # #4): rd_cg_rtol is the Dembo-Eisenstat-Steihaug FORCING TERM of
        # the inexact-Newton inner solves, not a solution tolerance —
        # Newton measures (and converges) the exact nonlinear residual to
        # newton_rtol regardless, each inner solve only needs to beat the
        # current contraction target (eta=1e-3 reaches 1e-4 relative in
        # ~2 iterations).  The repo rule "cg_rtol well below newton_rtol"
        # applies to cg_rtol (the LINEAR elasticity block, where rtol
        # directly bounds solution error) — kept at 1e-7 here.  Gradient
        # correctness under this forcing is asserted by the exact-residual
        # convergence check + finite-grad assert below and the
        # adjoint-parity tests (tests/test_adjoint.py).
        sim.step_config = StepConfig(
            newton_rtol=1e-4, newton_atol=1e-5, cg_rtol=1e-7, cg_maxiter=800,
            rd_cg_rtol=1e-3 if unstructured else 0.0,
            precond_degree=sim.step_config.precond_degree,
        )
    theta = sim.make_theta(sim.params.as_dict())
    iv = sim.params.create_initial_value_function()
    u0 = jnp.asarray(iv[0], dtype=dtype)
    c0 = jnp.asarray(iv[1], dtype=dtype)
    simulate = jax.jit(sim.build_simulate_fn(N_STEPS, 1.0))
    aux = sim.runtime_aux()
    args = (theta, u0, c0, aux) if aux else (theta, u0, c0)
    u_traj, c_traj, ok, _ = simulate(*args)
    targets = {
        "conc_T2": np.asarray(thresh(c_traj[-1], 0.12)),
        "disp": np.asarray(u_traj[-1]),
    }
    names, update = param_map_for_type(2)
    ip = InverseProblem(sim, names, targets, update_fn=update,
                        n_steps=N_STEPS, dt=1.0)
    v0 = np.array([0.05, 0.05])
    J, g = ip.value_and_grad(v0)  # compile
    assert np.all(np.isfinite(np.asarray(g))), "adjoint gradient not finite"
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        ip.value_and_grad(v0)
    dt_vg = (time.perf_counter() - t0) / reps
    return 1.0 / dt_vg


def measure_baseline(sim):
    """Scipy sparse assemble+spsolve implicit-Euler step on the same mesh
    (CPU) — the reference-stack stand-in."""
    key = f"brain3d_n{N}_nodes{sim.mesh.n_nodes}"
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
        if key in cache:
            return cache[key], key
    from reference_fem import ReferenceFEM

    mesh = sim.mesh
    ref = ReferenceFEM(mesh)
    theta_p = sim.params.as_dict()
    sd = sim.subdomains
    D = np.asarray(sim.make_theta(theta_p)["D"], dtype=np.float64)
    rho = np.asarray(sim.make_theta(theta_p)["rho"], dtype=np.float64)
    mu = np.asarray(sim.make_theta(theta_p)["mu"], dtype=np.float64)
    lam = np.asarray(sim.make_theta(theta_p)["lam"], dtype=np.float64)
    iv = sim.params.create_initial_value_function()
    c = np.asarray(iv[1], dtype=np.float64)
    u = np.zeros(mesh.n_nodes * mesh.dim)
    bn = mesh.boundary_nodes
    t0 = time.perf_counter()
    u, c = ref.solve_step(
        u, c, D, rho, mu, lam, float(theta_p["coupling"]), 1.0,
        dirichlet_disp_nodes=bn,
        dirichlet_disp_values=np.zeros((len(bn), mesh.dim)),
    )
    dt_step = time.perf_counter() - t0
    baseline_sps = 1.0 / dt_step
    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
    cache[key] = baseline_sps
    with open(CACHE, "w") as f:
        json.dump(cache, f, indent=1)
    return baseline_sps, key


def run_refined():
    """Accuracy-mode throughput: f32 solves + auto refine_f64 (f64 defect
    residuals).  Quantifies what the default-on accuracy mode costs vs the
    plain-f32 primary metric (VERDICT r2 #5).  Runs LAST: enabling x64
    changes default dtype promotion for every trace after it."""
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from glimslib_tpu.solvers.coupled import StepConfig

    sim = build_problem(dtype=jnp.float32)
    sim.step_config = StepConfig(
        newton_rtol=1e-4, newton_atol=1e-5, cg_rtol=1e-7, cg_maxiter=800,
        refine_f64=True,
    )
    theta = sim.make_theta(sim.params.as_dict())
    iv = sim.params.create_initial_value_function()
    u0 = jnp.asarray(iv[0], jnp.float32)
    c0 = jnp.asarray(iv[1], jnp.float32)
    simulate = jax.jit(sim.build_simulate_fn(N_STEPS, 1.0))
    out = simulate(theta, u0, c0)
    jax.block_until_ready(out)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = simulate(theta, u0, c0)
        jax.block_until_ready(out)
    dt_run = (time.perf_counter() - t0) / reps
    assert np.asarray(out[2]).all(), "refined bench solve did not converge"
    return N_STEPS / dt_run


def main():
    # wall-clock budget (VERDICT r3 weak #1: the r3 bench overran the
    # driver timeout and lost every extra).  Each extra is emitted as an
    # updated CUMULATIVE record the moment it is measured, so whatever
    # complete JSON line is last always carries the primary metric plus all
    # extras finished so far — and before starting each extra the remaining
    # budget is checked against a per-extra floor.
    t_start = time.monotonic()
    budget = float(os.environ.get("GLIMS_BENCH_BUDGET_S", "2100"))

    _phase("main start")
    sim, steps_per_sec = run_tpu()
    _phase("primary measured")
    if os.environ.get("GLIMS_BENCH_SKIP_BASELINE", "0") == "1":
        # large-N runs: the scipy direct-solve baseline is impractical
        # (resolve from cache if present, else report vs the N=32 cache)
        key = f"brain3d_n{N}_nodes{sim.mesh.n_nodes}"
        cache = {}
        if os.path.exists(CACHE):
            with open(CACHE) as f:
                cache = json.load(f)
        # never substitute a cache entry measured at a different mesh size:
        # a mismatched denominator is a mislabeled speedup (advisor r2)
        baseline_sps = cache.get(key, float("nan"))
    else:
        baseline_sps, key = measure_baseline(sim)
    ratio = steps_per_sec / baseline_sps
    record = {
        "metric": "3d_brain_forward_steps_per_sec",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(ratio, 4) if np.isfinite(ratio) else None,
    }
    print(json.dumps(record), flush=True)
    if os.environ.get("GLIMS_BENCH_EXTRAS", "1") == "0":
        return
    extras = {}
    record["extra"] = extras

    def emit():
        print(json.dumps(record), flush=True)

    def remaining():
        return budget - (time.monotonic() - t_start)

    def extra(name, floor_s, fn):
        """Run one extra under the budget; cumulative emit either way.
        Per-extra wall seconds are recorded because axon service latency
        (remote compile/dispatch queue) varies by an order of magnitude
        run to run — the wall_s split says whether a skipped tail was our
        cost model or a bad service hour."""
        if remaining() < floor_s:
            extras[name + "_skipped"] = f"budget ({remaining():.0f}s left)"
        else:
            t_e = time.monotonic()
            try:
                fn()
            except Exception as e:  # never sink already-measured metrics
                extras[name + "_error"] = repr(e)[:200]
            extras[name + "_wall_s"] = round(time.monotonic() - t_e, 1)
        emit()

    # flagship FIRST (VERDICT r3 next #2): the reference's flagship
    # geometry is an unstructured CGAL mesh at ~197k tets
    # (test_case_simulation_tumor_growth_3D_atlas_mpi.py:32-136); the
    # honest headline must be driver-captured, not self-reported
    def _flagship():
        n_large = int(os.environ.get("GLIMS_BENCH_N_UNSTRUCT_LARGE", "32"))
        sim_l, n_cells_l, sps_l = run_unstructured(n_large)
        extras["unstructured_large_steps_per_sec"] = round(sps_l, 4)
        extras["unstructured_large_cells"] = int(n_cells_l)
        base_l = measure_baseline_unstructured(sim_l)
        if base_l:
            extras["unstructured_large_vs_baseline"] = round(sps_l / base_l, 4)

    extra("unstructured_large", 240, _flagship)

    # quad (P2-concentration) flagship (VERDICT r4 #2): the model family
    # the reference's production workflow drives
    # (image_based_optimization.py:26) on the same 197k-tet mesh — P2
    # carries 7.3x the concentration dofs of P1.  Runs BEFORE the r4-
    # captured extras: under a slow axon hour the budget must spend
    # itself on numbers no prior round has.
    def _quad_flagship():
        n_large = int(os.environ.get("GLIMS_BENCH_N_UNSTRUCT_LARGE", "32"))
        sim_q, n_cells_q, sps_q = run_unstructured(n_large, quad=True)
        extras["quad_flagship_steps_per_sec"] = round(sps_q, 4)
        extras["quad_flagship_c_dofs"] = int(sim_q.p2.n_dofs)

    extra("quad_flagship", 420, _quad_flagship)

    # reference-tolerance operating point (VERDICT r4 #3): elasticity CG
    # at the PETSc KSP default rtol 1e-5 (simulation_tumor_growth.py:
    # 126-140 solves with default Krylov tolerances); accuracy at this
    # point is published separately (tools/tpu_accuracy.py, docs/numerics)
    def _flagship_reference_profile():
        n_large = int(os.environ.get("GLIMS_BENCH_N_UNSTRUCT_LARGE", "32"))
        _, _, sps_r = run_unstructured(n_large, profile="reference")
        extras["flagship_reference_profile_steps_per_sec"] = round(sps_r, 4)

    extra("flagship_reference_profile", 240, _flagship_reference_profile)

    # flagship-scale adjoint (VERDICT r3 next #5): value_and_grad through
    # the bell/two-level operator stack at the reference-flagship mesh
    def _flagship_adjoint():
        n_large = int(os.environ.get("GLIMS_BENCH_N_UNSTRUCT_LARGE", "32"))
        vg = run_adjoint(n=n_large, unstructured=True)
        extras["adjoint_flagship_value_and_grad_per_sec"] = round(vg, 4)

    extra("adjoint_flagship", 420, _flagship_adjoint)

    # N=64 lattice (274,625 nodes): past the VMEM-resident fused-CG
    # ceiling — the elasticity solves run the STREAMED-vector whole-solve
    # kernel (ops/pallas_cg.py cg_vector_streamed, VERDICT r4 #5).  Also
    # a first-capture: ahead of the r4-captured small extras.
    def _lattice64():
        n64 = int(os.environ.get("GLIMS_BENCH_N_LATTICE_LARGE", "64"))
        sim64, sps64 = run_tpu(n=n64)
        extras[f"lattice{n64}_steps_per_sec"] = round(sps64, 4)
        scfg = getattr(sim64, "_el_stream_cfg", None)
        extras[f"lattice{n64}_streamed_cg"] = bool(scfg)

    extra("lattice64", 300, _lattice64)

    def _unstruct_small():
        _, n_cells, sps_u = run_unstructured()
        extras["unstructured_steps_per_sec"] = round(sps_u, 4)
        extras["unstructured_cells"] = int(n_cells)

    extra("unstructured", 180, _unstruct_small)

    def _adjoint_small():
        extras["adjoint_value_and_grad_per_sec"] = round(run_adjoint(), 4)

    extra("adjoint", 150, _adjoint_small)

    # refined runs LAST: enabling x64 changes dtype promotion for every
    # trace after it
    def _refined():
        extras["refined_steps_per_sec"] = round(run_refined(), 4)

    extra("refined", 150, _refined)


if __name__ == "__main__":
    main()
