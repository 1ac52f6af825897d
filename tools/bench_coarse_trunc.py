"""Measure spectral truncation of the two-level coarse factor: CG
iterations and solve time vs kept column count k on the flagship
unstructured elasticity block.

The coarse apply streams the dense factor B twice per CG iteration
(2*dim_c*k values); truncating to the k smallest-eigenvalue directions
perturbs the preconditioner by <= 1/lambda_cut (solvers/twolevel.py
coarse_inverse).  This tool finds the iters-vs-traffic sweet spot.

Usage: GLIMS_PROF_N=24 GLIMS_COARSE_KS=0,4096,2048,1024,512,256 \
       python tools/bench_coarse_trunc.py
"""

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
from glimslib_tpu.ops.ell import apply_ell_vector, build_ell_elasticity
from glimslib_tpu.ops import ell as ell_mod
from glimslib_tpu.solvers.cg import pcg
from glimslib_tpu.solvers.twolevel import (
    AggPlan, build_coarse, make_twolevel_precond)


def main():
    n = int(os.environ.get("GLIMS_PROF_N", "24"))
    m = int(os.environ.get("GLIMS_TWOLEVEL_AGG", "64"))
    dtype = (jnp.float64 if jax.config.read("jax_enable_x64")
             else jnp.float32)
    sim = _brain_sim(
        n=n, dims=3, dtype=dtype,
        mesh_transform=lambda m_: Mesh.from_arrays(m_.points, m_.cells)
        .reordered_morton(),
    )
    mesh = sim.mesh
    print(f"nodes {mesh.n_nodes} cells {mesh.n_cells} dtype {dtype.__name__}",
          flush=True)
    theta0 = sim.make_theta(sim.params.as_dict())
    mask_u, mask_c, gu, gc = sim._bc_masks_and_values()
    kern = sim.kernels
    plan = ell_mod.EllPlan(mesh)
    adj = jnp.asarray(plan.adj)
    B = build_ell_elasticity(
        plan, (kern.grads_T, kern.vol), theta0["mu"], theta0["lam"], dtype)
    Bd = kern.elasticity_diag_blocks(theta0["mu"], theta0["lam"])
    Binv = kern.block_jacobi_inverse_blocks(Bd, mask=mask_u)
    aug = jax.jit(sim._augment_theta_with_operators)(theta0)
    jax.block_until_ready(list(aug.values())[0])

    iv = sim.params.create_initial_value_function()
    u0 = jnp.asarray(iv[0], dtype=dtype)
    c0 = jnp.asarray(iv[1], dtype=dtype)
    t = jnp.asarray(1.0, dtype)
    ru = jnp.where(mask_u, u0 - gu(t), sim.el_residual(u0, c0, aug, t))
    b = jnp.where(mask_u, 0.0, -ru)

    raw = lambda v: apply_ell_vector(adj, B, v)
    Au = lambda v: jnp.where(mask_u, v, raw(jnp.where(mask_u, 0.0, v)))
    bj = lambda r: kern.apply_block_jacobi(Binv, r)
    rtol, maxiter = 1e-7, 2000

    ap = AggPlan(mesh, agg_size=m)
    t0 = time.perf_counter()
    Ac = build_coarse(ap, adj, B, mask_u)
    A = np.asarray(jax.lax.stop_gradient(Ac), dtype=np.float64)
    lam, V = np.linalg.eigh(0.5 * (A + A.T))
    t_eig = time.perf_counter() - t0
    lmax = float(lam.max())
    inv_sqrt = np.where(lam > 1e-7 * lmax, 1.0 / np.sqrt(
        np.maximum(lam, 1e-300)), 0.0)
    order = np.argsort(-inv_sqrt, kind="stable")
    dim_c = A.shape[0]
    print(f"dim_c={dim_c} eig setup {t_eig:.1f}s  "
          f"lam: min_kept={lam[inv_sqrt > 0].min():.3e} max={lmax:.3e}",
          flush=True)

    f = 1.0 - np.asarray(mask_u).astype(np.float64)
    MtT = jnp.transpose(ap.mode_matrix(f), (1, 2, 0)).astype(dtype)
    use_bf16 = dtype == jnp.float32

    ks = [int(a) for a in os.environ.get(
        "GLIMS_COARSE_KS", "0,4096,2048,1024,512,256").split(",")]
    for k in ks:
        kk = dim_c if k == 0 else min(k, dim_c)
        Bfac = jnp.asarray(
            np.ascontiguousarray((V * inv_sqrt[None, :])[:, order[:kk]]),
            dtype=dtype)
        if use_bf16:
            Bfac = Bfac.astype(jnp.bfloat16)
        M2raw = make_twolevel_precond(ap, Bfac, MtT, bj)
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
        iters = int(info2["iters"])
        mb = 2 * dim_c * kk * (2 if use_bf16 else 4) / 1e6
        print(f"k={kk:6d}: iters={iters:4d} solve {t2*1e3:7.1f} ms "
              f"({t2/max(iters,1)*1e6:6.0f} us/iter, factor {mb:6.1f} "
              f"MB/iter)", flush=True)


if __name__ == "__main__":
    main()
