"""Does eigenvector deflation on top of the two-level affine coarse space
cut elasticity CG iterations on the flagship unstructured brain problem?

The elasticity operator is theta-constant across the time loop (CLAUDE.md
remaining-candidates #1), so a one-time setup investment in its slowest
preconditioned modes amortizes over every step: we augment the additive
two-level preconditioner with a Galerkin eigen-block

    M3(r) = blockJacobi(r) + P~ A_c^{-1} P~^T r + W (W^T A W)^{-1} W^T r

where W holds the k smallest eigenvectors of the M2-preconditioned
operator (computed by scipy LOBPCG at setup).  SPD + PSD sums keep CG
valid.  Prints iterations for two-level alone vs deflated at several k.

Usage: GLIMS_PLATFORM=cpu GLIMS_X64=1 python tools/bench_deflation.py
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
if os.environ.get("GLIMS_X64", "0") == "1":
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

import jax.numpy as jnp
from scipy.sparse.linalg import LinearOperator, lobpcg

from __graft_entry__ import _brain_sim
from glimslib_tpu.core.mesh import Mesh
from glimslib_tpu.ops.ell import apply_ell_vector
from glimslib_tpu.solvers.cg import pcg
from glimslib_tpu.solvers.twolevel import (
    AggPlan, build_coarse, coarse_inverse, make_twolevel_precond)


def main():
    n = int(os.environ.get("GLIMS_PROF_N", "24"))
    agg = int(os.environ.get("GLIMS_TWOLEVEL_AGG", "64"))
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
    mask_u, mask_c, gu, gc = sim._bc_masks_and_values()
    kern = sim.kernels
    from glimslib_tpu.ops import ell as ell_mod

    plan = ell_mod.EllPlan(mesh)
    adj = jnp.asarray(plan.adj)
    B = ell_mod.build_ell_elasticity(
        plan, (kern.grads_T, kern.vol), theta0["mu"], theta0["lam"], dtype)
    Bd = kern.elasticity_diag_blocks(theta0["mu"], theta0["lam"])
    Binv = kern.block_jacobi_inverse_blocks(Bd, mask=mask_u)
    aug = theta0

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

    ap = AggPlan(mesh, agg_size=agg)
    Ac = build_coarse(ap, adj, B, mask_u)
    Cinv = coarse_inverse(Ac)
    f = 1.0 - np.asarray(mask_u).astype(np.float64)
    Mt = ap.mode_matrix(f).astype(Cinv.dtype)
    M2raw = make_twolevel_precond(ap, Cinv, Mt, bj)
    Mu2 = lambda r: jnp.where(mask_u, r, M2raw(jnp.where(mask_u, 0.0, r)))

    @jax.jit
    def solve_tl(b):
        return pcg(Au, b, M=Mu2, rtol=rtol, atol=0.0, maxiter=maxiter)

    x2, info2 = solve_tl(b)
    jax.block_until_ready(x2)
    print(f"twolevel m={agg}: iters={int(info2['iters'])}", flush=True)

    # ---- smallest preconditioned eigenpairs via LOBPCG ------------------
    nn, d = mesh.n_nodes, mesh.dim
    ndof = nn * d
    shape = (nn, d)
    npdt = np.float64 if dtype == jnp.float64 else np.float32
    A_j = jax.jit(Au)
    M_j = jax.jit(Mu2)

    def A_mv(v):
        return np.asarray(
            A_j(jnp.asarray(v.reshape(shape), dtype))
        ).reshape(-1)

    def M_mv(v):
        return np.asarray(
            M_j(jnp.asarray(v.reshape(shape), dtype))
        ).reshape(-1)

    Aop = LinearOperator((ndof, ndof), matvec=A_mv, dtype=npdt)
    Mop = LinearOperator((ndof, ndof), matvec=M_mv, dtype=npdt)

    kmax = int(os.environ.get("GLIMS_DEFL_KMAX", "64"))
    rng = np.random.default_rng(0)
    X = rng.standard_normal((ndof, kmax)).astype(npdt)
    # zero Dirichlet rows so the iteration stays in the free subspace
    free = (1.0 - np.asarray(mask_u).astype(npdt)).reshape(-1)
    X *= free[:, None]
    t0 = time.perf_counter()
    vals, vecs = lobpcg(Aop, X, M=Mop, largest=False,
                        maxiter=int(os.environ.get("GLIMS_DEFL_IT", "40")),
                        tol=1e-3)
    t_eig = time.perf_counter() - t0
    order = np.argsort(vals)
    vals, vecs = vals[order], vecs[:, order]
    print(f"lobpcg {t_eig:.1f}s  smallest lam: {vals[:8]}", flush=True)

    for k in (8, 16, 32, kmax):
        W = jnp.asarray(vecs[:, :k] * free[:, None], dtype)  # (ndof, k)
        AW = jax.vmap(
            lambda w: Au(w.reshape(shape)).reshape(-1), in_axes=1, out_axes=1
        )(W)
        G = W.T @ AW  # (k, k) Galerkin
        Ginv = jnp.linalg.inv(G + 1e-12 * jnp.eye(k, dtype=dtype))

        def M3raw(r, W=W, Ginv=Ginv):
            rf = r.reshape(-1)
            y = Ginv @ (W.T @ rf)
            return M2raw(r) + (W @ y).reshape(shape)

        Mu3 = lambda r, M3raw=M3raw: jnp.where(
            mask_u, r, M3raw(jnp.where(mask_u, 0.0, r)))

        @jax.jit
        def solve_defl(b, Mu3=Mu3):
            return pcg(Au, b, M=Mu3, rtol=rtol, atol=0.0, maxiter=maxiter)

        x3, info3 = solve_defl(b)
        jax.block_until_ready(x3)
        diff = float(jnp.max(jnp.abs(x2 - x3))
                     / (jnp.max(jnp.abs(x2)) + 1e-30))
        print(f"deflated k={k:3d}: iters={int(info3['iters'])} "
              f"rel diff {diff:.2e}", flush=True)


if __name__ == "__main__":
    main()
