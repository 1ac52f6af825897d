"""Round-3 profiling: where does the unstructured step time go?

Measures, on the current default backend (axon TPU unless GLIMS_PLATFORM
overrides):
  1. per-step simulate time at n in GLIMS_PROF_NS (default 16,24,32),
  2. in-loop ELL matvec times (vector elasticity + scalar rd) and the
     block-Jacobi precond application,
  3. CG iteration counts for the elasticity solve and the rd Newton
     per step (re-solved from the recorded trajectory states),
  4. lattice N=32 Pallas vs XLA roll matvec times for comparison.

Usage: python tools/profile_r3.py [unstruct|lattice|all]
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

N_STEPS = 5


def _setup_jax():
    import jax

    if os.environ.get("GLIMS_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["GLIMS_PLATFORM"])
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def _time_inloop(jax, jnp, op, x0, iters=50, args=()):
    """In-loop timing that mutates the carry (CLAUDE.md perf model).

    Large operator tables MUST be threaded through ``args`` (op receives
    them after x): as closure constants they are folded into the compiled
    executable (a 760 MB cache entry at 197k tets) and blow the axon
    remote-compile payload/time."""

    @jax.jit
    def loop(x, *a):
        def body(i, x):
            y = op(x, *a)
            return y / (1.0 + 1e-30 * jnp.max(jnp.abs(y)))

        return jax.lax.fori_loop(0, iters, body, x)

    y = loop(x0, *args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = loop(x0, *args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def profile_unstructured(n):
    jax = _setup_jax()
    import jax.numpy as jnp

    from __graft_entry__ import _brain_sim
    from glimslib_tpu.core.mesh import Mesh
    from glimslib_tpu.solvers.cg import pcg
    from glimslib_tpu.solvers.coupled import StepConfig

    dtype = jnp.float32 if jax.default_backend() != "cpu" else (
        jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32)
    sim = _brain_sim(n=n, dims=3, dtype=dtype,
                     mesh_transform=lambda m: Mesh.from_arrays(
                         m.points, m.cells).reordered_morton())
    if dtype == jnp.float32:
        sim.step_config = StepConfig(
            newton_rtol=1e-4, newton_atol=1e-5, cg_rtol=1e-7, cg_maxiter=800)
    out = {"n": n, "n_cells": int(sim.mesh.n_cells),
           "n_nodes": int(sim.mesh.n_nodes)}
    theta0 = sim.make_theta(sim.params.as_dict())
    iv = sim.params.create_initial_value_function()
    u0 = jnp.asarray(iv[0], dtype=dtype)
    c0 = jnp.asarray(iv[1], dtype=dtype)
    aux = sim.runtime_aux()
    jax.block_until_ready(aux)

    # full step timing
    simulate = jax.jit(sim.build_simulate_fn(N_STEPS, 1.0))
    args = (theta0, u0, c0, aux) if aux else (theta0, u0, c0)
    t0 = time.perf_counter()
    traj = simulate(*args)
    jax.block_until_ready(traj)
    out["compile_plus_run_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    traj = simulate(*args)
    jax.block_until_ready(traj)
    out["step_ms"] = (time.perf_counter() - t0) / N_STEPS * 1e3
    out["newton_iters"] = np.asarray(traj[3]).tolist()

    # augmented theta (assembled operator planes + preconditioner state)
    aug = jax.jit(sim._augment_theta_with_operators)({**theta0, **aux})
    jax.block_until_ready(aug)
    use_bell = sim._use_bell()
    rd_jac_b, el_op_b = sim._ell_builders()
    kern = sim.kernels
    # every big operator table is threaded as a jit ARGUMENT below (args=)
    # — as closure constants they fold into the executable (760 MB cache
    # entries) and blow axon remote-compile time/payload
    if use_bell:
        from glimslib_tpu.ops import bell as bell_mod

        bplan = sim._get_bell_plan()
        out["bell_blocks"] = int(bplan.nb)
        out["bell_s"] = int(bplan.s)
        out["bell_Kh"] = int(bplan.Kh)
        tb = sim._bell_tables_from(aug)
        Wrd = jax.jit(
            lambda a, c: bell_mod.build_bell_rd_const(
                bplan, (kern.grads_T, kern.vol), a["D"], a["rho"], a["dt"],
                kern._m0, sim.dtype, tables=sim._bell_tables_from(a))
            + bell_mod.build_bell_rd_wc(
                bplan, (kern.grads_T, kern.vol), kern.cells_flat, c,
                a["rho"], a["dt"], kern._t0, 1.0, sim.dtype,
                tables=sim._bell_tables_from(a)))(aug, c0)
        jax.block_until_ready(Wrd)
        use_T = "_BellWelT" in aug
        out["bell_T"] = use_T
        if use_T:
            out["el_matvec_ms"] = _time_inloop(
                jax, jnp,
                lambda u, halo, W: bell_mod.apply_bell_vector_T(
                    bplan, halo, W, u),
                u0 + 0.01, args=(aug["_BellHalo"], aug["_BellWelT"])) * 1e3
            WrdT = jnp.transpose(Wrd, (1, 2, 0))
            out["rd_matvec_ms"] = _time_inloop(
                jax, jnp,
                lambda v, halo, W: bell_mod.apply_bell_scalar_T(
                    bplan, halo, W, v),
                c0 + 0.01, args=(aug["_BellHalo"], WrdT)) * 1e3
            out["el_precond_sn_ms"] = _time_inloop(
                jax, jnp,
                lambda r, B: bell_mod.apply_supernode_jacobi_T(bplan, B, r),
                u0 + 0.01, args=(aug["_BinvSNT"],)) * 1e3
        else:
            out["el_matvec_ms"] = _time_inloop(
                jax, jnp,
                lambda u, halo, W: bell_mod.apply_bell_vector(
                    bplan, halo, W, u),
                u0 + 0.01, args=(aug["_BellHalo"], aug["_BellWel"])) * 1e3
            out["rd_matvec_ms"] = _time_inloop(
                jax, jnp,
                lambda v, halo, W: bell_mod.apply_bell_scalar(
                    bplan, halo, W, v),
                c0 + 0.01, args=(aug["_BellHalo"], Wrd)) * 1e3
            out["el_precond_sn_ms"] = _time_inloop(
                jax, jnp,
                lambda r, B: bell_mod.apply_supernode_jacobi(bplan, B, r),
                u0 + 0.01, args=(aug["_BinvSN"],)) * 1e3
        el_precond_key = "el_precond_sn_ms"
    else:
        out["ell_K"] = int(sim._ell_plan.K)
        adj = jnp.asarray(sim._ell_plan.adj)
        from glimslib_tpu.ops import ell as ell_mod

        out["el_matvec_ms"] = _time_inloop(
            jax, jnp,
            lambda u, B: ell_mod.apply_ell_vector(adj, B, u),
            u0 + 0.01, args=(aug["_EllWel"],)) * 1e3
        out["el_precond_bj_ms"] = _time_inloop(
            jax, jnp,
            lambda r, B: kern.apply_block_jacobi(B, r),
            u0 + 0.01, args=(aug["_BinvG"],)) * 1e3
        el_precond_key = "el_precond_bj_ms"
    agg = sim._twolevel_aggplan()
    if agg is not None and "_TLCfac" in aug:
        from glimslib_tpu.solvers.twolevel import make_twolevel_precond

        def tl_apply(r, Cfac, Mt, Binv):
            if use_bell and use_T:
                base = lambda x: bell_mod.apply_supernode_jacobi_T(
                    bplan, Binv, x)
            elif use_bell:
                base = lambda x: bell_mod.apply_supernode_jacobi(
                    bplan, Binv, x)
            else:
                base = lambda x: kern.apply_block_jacobi(Binv, x)
            return make_twolevel_precond(agg, Cfac, Mt, base)(r)

        out["el_precond_2lvl_ms"] = _time_inloop(
            jax, jnp, tl_apply, u0 + 0.01,
            args=(aug["_TLCfac"], aug["_TLMt"],
                  (aug["_BinvSNT"] if use_T else aug["_BinvSN"])
                  if use_bell else aug["_BinvG"])) * 1e3
        out["twolevel"] = True
        el_precond_key = "el_precond_2lvl_ms"
    else:
        out["twolevel"] = False
    print(json.dumps(out), file=sys.stderr, flush=True)

    # the per-Newton work OUTSIDE the CG loop: rd Jacobian re-assembly
    # (build_bell_rd_wc's placement gathers) and the matrix-free residual
    # evaluations
    t1 = jnp.asarray(1.0, sim.dtype)
    if use_bell:
        arrays = (kern.grads_T, kern.vol)

        def rd_assemble(c, a):
            W = bell_mod.build_bell_rd_wc(
                bplan, arrays, kern.cells_flat, c, a["rho"], a["dt"],
                kern._t0, 1.0, sim.dtype, tables=sim._bell_tables_from(a))
            return c + 1e-30 * jnp.sum(W)

        out["rd_jac_assemble_ms"] = _time_inloop(
            jax, jnp, rd_assemble, c0 + 0.01, iters=20, args=(aug,)) * 1e3

    out["rd_residual_ms"] = _time_inloop(
        jax, jnp, lambda c, a: sim.rd_residual(c, c0, a, t1),
        c0 + 0.01, iters=20, args=(aug,)) * 1e3
    out["el_residual_ms"] = _time_inloop(
        jax, jnp, lambda u, a: sim.el_residual(u, c0, a, t1),
        u0 + 0.01, iters=20, args=(aug,)) * 1e3
    print(json.dumps(out), file=sys.stderr, flush=True)

    # CG iteration counts per step, re-solved from the trajectory
    mask_u, mask_c, gu, gc = sim._bc_masks_and_values()
    cfg = sim.step_config

    def _el_M(theta):
        """Preconditioner rebuilt from theta INSIDE the jit (theta is an
        argument, so the big arrays stay arguments)."""
        if use_bell and "_BinvSNT" in theta:
            base = lambda x: bell_mod.apply_supernode_jacobi_T(
                bplan, theta["_BinvSNT"], x)
        elif use_bell:
            base = lambda x: bell_mod.apply_supernode_jacobi(
                bplan, theta["_BinvSN"], x)
        else:
            base = lambda x: kern.apply_block_jacobi(theta["_BinvG"], x)
        if agg is not None and "_TLCfac" in theta:
            from glimslib_tpu.solvers.twolevel import make_twolevel_precond

            return make_twolevel_precond(
                agg, theta["_TLCfac"], theta["_TLMt"], base)
        return base

    @jax.jit
    def el_solve_iters(theta, u_prev, c, t):
        guv = gu(t)
        resid_u = lambda u: jnp.where(
            mask_u, u - guv, sim.el_residual(u, c, theta, t))
        raw = el_op_b(theta)
        el_M = _el_M(theta)
        Au = lambda v: jnp.where(mask_u, v, raw(jnp.where(mask_u, 0.0, v)))
        Mu = lambda r: jnp.where(
            mask_u, r, el_M(jnp.where(mask_u, 0.0, r)))
        u0_ = jnp.where(mask_u, guv, u_prev)
        ru = resid_u(u0_)
        du, info = pcg(Au, jnp.where(mask_u, 0.0, -ru), M=Mu,
                       rtol=cfg.cg_rtol, atol=cfg.cg_atol,
                       maxiter=cfg.cg_maxiter)
        return info["iters"], info["resnorm"]

    @jax.jit
    def rd_solve_iters(theta, c_lin, c_prev, t):
        gcv = gc(t)
        raw = rd_jac_b(theta, c_lin)
        Ac = lambda v: jnp.where(mask_c, v, raw(jnp.where(mask_c, 0.0, v)))
        if use_bell and "_McSNT" in theta:
            from glimslib_tpu.ops import bell as bell_mod

            Mc = lambda r: jnp.where(
                mask_c, r, bell_mod.apply_supernode_jacobi_T(
                    bplan, theta["_McSNT"], jnp.where(mask_c, 0.0, r)))
        elif use_bell and "_McSN" in theta:
            from glimslib_tpu.ops import bell as bell_mod

            Mc = lambda r: jnp.where(
                mask_c, r, bell_mod.apply_supernode_jacobi(
                    bplan, theta["_McSN"], jnp.where(mask_c, 0.0, r)))
        else:
            diag_c = jnp.where(mask_c, 1.0, sim.rd_diag(theta))
            Mc = lambda r: r / diag_c
        r = jnp.where(mask_c, c_lin - gcv,
                      sim.rd_residual(c_lin, c_prev, theta, t))
        dc, info = pcg(Ac, jnp.where(mask_c, 0.0, -r), M=Mc,
                       rtol=cfg.cg_rtol, atol=cfg.cg_atol,
                       maxiter=cfg.cg_maxiter)
        return info["iters"], info["resnorm"]

    u_traj = traj[0]
    c_traj = traj[1]
    el_iters, rd_iters = [], []
    for k in range(N_STEPS):
        u_prev = u0 if k == 0 else u_traj[k - 1]
        c_prev = c0 if k == 0 else c_traj[k - 1]
        t = jnp.asarray(k + 1.0, dtype)
        it_u, _ = el_solve_iters(aug, u_prev, c_traj[k], t)
        it_c, _ = rd_solve_iters(aug, c_traj[k], c_prev, t)
        el_iters.append(int(it_u))
        rd_iters.append(int(it_c))
    out["el_cg_iters_per_step"] = el_iters
    out["rd_cg_iters_per_final_newton"] = rd_iters

    # wall time of the whole jitted solves (includes residual + assembly +
    # CG) — closes the accounting gap vs matvec*iters estimates
    t = jnp.asarray(1.0, dtype)
    for name, fn, a in (
        ("el_solve_wall_ms",
         lambda: el_solve_iters(aug, u0, c_traj[0], t), None),
        ("rd_solve_wall_ms",
         lambda: rd_solve_iters(aug, c_traj[0], c0, t), None),
    ):
        r = fn(); jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(3):
            r = fn()
            jax.block_until_ready(r)
        out[name] = (time.perf_counter() - t0) / 3 * 1e3

    # accounting: matvec+precond cost * iters vs step time
    per_it = out["el_matvec_ms"] + out[el_precond_key]
    out["el_solve_est_ms"] = per_it * float(np.mean(el_iters))
    return out


def profile_lattice(n=32):
    jax = _setup_jax()
    import jax.numpy as jnp

    from __graft_entry__ import _brain_sim
    from glimslib_tpu.ops import stencil_pallas as sp
    from glimslib_tpu.solvers.coupled import StepConfig

    dtype = jnp.float32 if jax.default_backend() != "cpu" else (
        jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32)
    sim = _brain_sim(n=n, dims=3, dtype=dtype)
    if dtype == jnp.float32:
        sim.step_config = StepConfig(
            newton_rtol=1e-4, newton_atol=1e-5, cg_rtol=1e-7, cg_maxiter=800)
    out = {"n": n, "n_nodes": int(sim.mesh.n_nodes)}
    theta0 = sim.make_theta(sim.params.as_dict())
    iv = sim.params.create_initial_value_function()
    u0 = jnp.asarray(iv[0], dtype=dtype)
    c0 = jnp.asarray(iv[1], dtype=dtype)

    simulate = jax.jit(sim.build_simulate_fn(N_STEPS, 1.0))
    traj = simulate(theta0, u0, c0)
    jax.block_until_ready(traj)
    t0 = time.perf_counter()
    traj = simulate(theta0, u0, c0)
    jax.block_until_ready(traj)
    out["step_ms"] = (time.perf_counter() - t0) / N_STEPS * 1e3

    rd_jac_b, el_op_b, el_pre_b, _rd_cg, _el_cg = sim._stencil_builders()
    ops = sim._stencil_ops
    aug = jax.jit(sim._augment_theta_with_operators)(theta0)
    jax.block_until_ready(aug)
    W = aug["_Wel"]
    Binv = aug["_Binv"]
    use_p = (sp.pallas_enabled() and dtype == jnp.float32)
    if use_p and sp.vector_fits(len(ops.offsets), sim.mesh.n_nodes,
                                sim.mesh.dim):
        out["el_matvec_pallas_ms"] = _time_inloop(
            jax, jnp,
            lambda u: sp.apply_vector_pallas(ops.offsets, W, u),
            u0 + 0.01) * 1e3
    out["el_matvec_xla_ms"] = _time_inloop(
        jax, jnp, lambda u: ops.apply_vector(W, u), u0 + 0.01) * 1e3
    if use_p and sp.scalar_fits(len(ops.offsets), sim.mesh.n_nodes):
        Wrd = aug["_Wrd_const"]
        out["rd_matvec_pallas_ms"] = _time_inloop(
            jax, jnp,
            lambda v: sp.apply_scalar_pallas(ops.offsets, Wrd, v),
            c0 + 0.01) * 1e3
        out["rd_matvec_xla_ms"] = _time_inloop(
            jax, jnp, lambda v: ops.apply_scalar(Wrd, v), c0 + 0.01) * 1e3
    out["el_precond_ms"] = _time_inloop(
        jax, jnp, lambda r: ops.apply_block_jacobi(Binv, r), u0 + 0.01) * 1e3

    # CG iteration counts for the elasticity block
    from glimslib_tpu.solvers.cg import pcg

    mask_u, mask_c, gu, gc = sim._bc_masks_and_values()
    cfg = sim.step_config
    el_op = el_op_b(aug)
    el_pre = el_pre_b(aug)

    @jax.jit
    def el_solve_iters(theta, u_prev, c, t):
        guv = gu(t)
        Au = lambda v: jnp.where(mask_u, v, el_op(jnp.where(mask_u, 0.0, v)))
        Mu = lambda r: jnp.where(mask_u, r, el_pre(jnp.where(mask_u, 0.0, r)))
        u0_ = jnp.where(mask_u, guv, u_prev)
        ru = jnp.where(mask_u, u0_ - guv, sim.el_residual(u0_, c, theta, t))
        du, info = pcg(Au, jnp.where(mask_u, 0.0, -ru), M=Mu,
                       rtol=cfg.cg_rtol, atol=cfg.cg_atol,
                       maxiter=cfg.cg_maxiter)
        return info["iters"]

    u_traj, c_traj = traj[0], traj[1]
    el_iters = []
    for k in range(N_STEPS):
        u_prev = u0 if k == 0 else u_traj[k - 1]
        t = jnp.asarray(k + 1.0, dtype)
        el_iters.append(int(el_solve_iters(aug, u_prev, c_traj[k], t)))
    out["el_cg_iters_per_step"] = el_iters
    out["newton_iters"] = np.asarray(traj[3]).tolist()
    return out


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    results = {}
    if what in ("unstruct", "all"):
        ns = [int(x) for x in
              os.environ.get("GLIMS_PROF_NS", "16,24,32").split(",")]
        results["unstructured"] = [profile_unstructured(n) for n in ns]
        print(json.dumps(results, indent=1), flush=True)
    if what in ("lattice", "all"):
        results["lattice"] = profile_lattice(32)
    print(json.dumps(results, indent=1))
