"""Measure two-level vs block-Jacobi elasticity CG iterations on the
flagship unstructured brain problem (tools/ companion to round-3 #1)."""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

if os.environ.get("GLIMS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GLIMS_PLATFORM"])
if os.environ.get("GLIMS_X64", "0") == "1":
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

import jax.numpy as jnp

from __graft_entry__ import _brain_sim
from glimslib_tpu.core.mesh import Mesh
from glimslib_tpu.ops.ell import apply_ell_vector
from glimslib_tpu.solvers.cg import pcg
from glimslib_tpu.solvers.twolevel import (
    AggPlan, build_coarse, coarse_inverse, make_twolevel_precond)


def main():
    n = int(os.environ.get("GLIMS_PROF_N", "32"))
    dtype = (jnp.float64 if jax.config.read("jax_enable_x64")
             else jnp.float32)
    sim = _brain_sim(
        n=n, dims=3, dtype=dtype,
        mesh_transform=lambda m: Mesh.from_arrays(m.points, m.cells)
        .reordered_morton(),
    )
    mesh = sim.mesh
    print(f"nodes {mesh.n_nodes} cells {mesh.n_cells} dtype {dtype.__name__}",
          flush=True)
    theta0 = sim.make_theta(sim.params.as_dict())
    aug = jax.jit(sim._augment_theta_with_operators)(theta0)
    jax.block_until_ready(aug)
    plan = sim._ell_plan
    adj = jnp.asarray(plan.adj)
    B = aug["_EllWel"]
    Binv = aug["_BinvG"]
    mask_u, mask_c, gu, gc = sim._bc_masks_and_values()
    kern = sim.kernels

    # rhs: first-step elasticity residual at the initial concentration
    iv = sim.params.create_initial_value_function()
    u0 = jnp.asarray(iv[0], dtype=dtype)
    c0 = jnp.asarray(iv[1], dtype=dtype)
    t = jnp.asarray(1.0, dtype)
    ru = jnp.where(mask_u, u0 - gu(t), sim.el_residual(u0, c0, aug, t))
    b = jnp.where(mask_u, 0.0, -ru)

    raw = lambda v: apply_ell_vector(adj, B, v)
    Au = lambda v: jnp.where(mask_u, v, raw(jnp.where(mask_u, 0.0, v)))
    bj = lambda r: kern.apply_block_jacobi(Binv, r)
    Mu1 = lambda r: jnp.where(mask_u, r, bj(jnp.where(mask_u, 0.0, r)))
    rtol, maxiter = 1e-7, 2000

    @jax.jit
    def solve_bj(b):
        return pcg(Au, b, M=Mu1, rtol=rtol, atol=0.0, maxiter=maxiter)

    x1, info1 = solve_bj(b)
    jax.block_until_ready(x1)
    t0 = time.perf_counter()
    x1, info1 = solve_bj(b)
    jax.block_until_ready(x1)
    t1 = time.perf_counter() - t0
    print(f"block-jacobi: iters={int(info1['iters'])} {t1*1e3:.0f} ms",
          flush=True)

    for m in (int(a) for a in
              os.environ.get("GLIMS_AGG_SIZES", "128,64,32").split(",")):
        ap = AggPlan(mesh, agg_size=m)
        t0 = time.perf_counter()
        Ac = build_coarse(ap, adj, B, mask_u)
        Cinv = coarse_inverse(Ac)
        jax.block_until_ready(Cinv)
        t_setup = time.perf_counter() - t0
        f = 1.0 - np.asarray(mask_u).astype(np.float64)
        Mt = ap.mode_matrix(f).astype(Cinv.dtype)
        M2raw = make_twolevel_precond(ap, Cinv, Mt, bj)
        Mu2 = lambda r: jnp.where(mask_u, r, M2raw(jnp.where(mask_u, 0.0, r)))

        @jax.jit
        def solve_tl(b):
            return pcg(Au, b, M=Mu2, rtol=rtol, atol=0.0, maxiter=maxiter)

        x2, info2 = solve_tl(b)
        jax.block_until_ready(x2)
        t0 = time.perf_counter()
        x2, info2 = solve_tl(b)
        jax.block_until_ready(x2)
        t2 = time.perf_counter() - t0
        diff = float(jnp.max(jnp.abs(x1 - x2)) / (jnp.max(jnp.abs(x1)) + 1e-30))
        print(f"twolevel m={m:4d} (coarse {ap.nagg * ap.q:6d}): "
              f"iters={int(info2['iters'])} {t2*1e3:.0f} ms "
              f"setup {t_setup*1e3:.0f} ms  rel diff {diff:.2e}", flush=True)


if __name__ == "__main__":
    main()
