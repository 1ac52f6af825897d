"""Smoothed-aggregation coarse space vs the affine two-level: iteration
counts on the unstructured elasticity block (CPU f64 — iteration counts
are platform-independent; the per-iteration cost model then decides).

The affine two-level (solvers/twolevel.py) is ADDITIVE with an UNSMOOTHED
piecewise prolongator P~.  Classic SA smooths it: P_s = (I - w D^-1 A) P~
with w = 4/(3 lmax(D^-1 A)) — the standard remedy when unsmoothed
aggregation stalls.  Runtime cost on TPU would be +2 bell matvecs per CG
iteration (~+1.3 ms at 197k tets vs the current ~1.05 ms/iter), so SA
must cut iterations by >2.2x to win.  This script measures the cut at
n=16/24 with dense experiment-grade transfers.

Usage: GLIMS_PROF_NS=16 python tools/bench_sa.py
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_platforms", os.environ.get("GLIMS_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

import jax.numpy as jnp

from __graft_entry__ import _brain_sim
from glimslib_tpu.core.mesh import Mesh
from glimslib_tpu.ops import bell as bell_mod
from glimslib_tpu.solvers.cg import pcg
from glimslib_tpu.solvers.twolevel import coarse_inverse, make_twolevel_precond


def main():
    for n in (int(x) for x in os.environ.get("GLIMS_PROF_NS", "16").split(",")):
        run_one(n)


def run_one(n):
    os.environ.setdefault("GLIMS_TWOLEVEL_MIN_NODES", "100")
    sim = _brain_sim(n=n, dims=3,
                     mesh_transform=lambda m: Mesh.from_arrays(
                         m.points, m.cells).reordered_morton())
    theta0 = sim.make_theta(sim.params.as_dict())
    aux = sim.runtime_aux()
    aug = jax.jit(sim._augment_theta_with_operators)({**theta0, **aux})
    bplan = sim._get_bell_plan()
    agg = sim._twolevel_aggplan()
    mask_u, _, gu, _ = sim._bc_masks_and_values()
    d = sim.mesh.dim
    nn = sim.mesh.n_nodes

    halo = aug["_BellHalo"]
    W = aug["_BellWel"]
    Binv = aug["_BinvSN"]
    raw = lambda v: bell_mod.apply_bell_vector(bplan, halo, W, v)
    Au = lambda v: jnp.where(mask_u, v, raw(jnp.where(mask_u, 0.0, v)))
    bj = lambda r: bell_mod.apply_supernode_jacobi(bplan, Binv, r)
    Mu_bj = lambda r: jnp.where(mask_u, r, bj(jnp.where(mask_u, 0.0, r)))

    iv = sim.params.create_initial_value_function()
    u0 = jnp.asarray(iv[0])
    c0 = jnp.asarray(iv[1])
    t = jnp.asarray(1.0)
    ru = jnp.where(mask_u, u0 - gu(t), sim.el_residual(u0, c0, aug, t))
    b = jnp.where(mask_u, 0.0, -ru)
    rtol, maxiter = 1e-7, 3000

    # current: additive BJ + affine two-level (truncated factor)
    M2 = make_twolevel_precond(agg, aug["_TLCfac"], aug["_TLMt"], bj)
    Mu2 = lambda r: jnp.where(mask_u, r, M2(jnp.where(mask_u, 0.0, r)))
    x2, info2 = jax.jit(lambda b: pcg(Au, b, M=Mu2, rtol=rtol, atol=0.0,
                                      maxiter=maxiter))(b)
    print(f"n={n} nodes={nn}: current two-level iters="
          f"{int(info2['iters'])}", flush=True)

    # dense experiment transfers: P~ columns, then SA smoothing
    f = 1.0 - np.asarray(mask_u).astype(np.float64)
    Mt = np.asarray(agg.mode_matrix(f))  # (n_pad, d, q)
    q, nagg = agg.q, agg.nagg
    dim_c = nagg * q
    # P~ as dense (nn*d, dim_c)
    P = np.zeros((nn * d, dim_c))
    for g in range(nagg):
        rows = slice(g * agg.m, min((g + 1) * agg.m, nn))
        blk_m = Mt[rows.start:rows.stop]  # (m_g, d, q)
        P[rows.start * d:rows.stop * d, g * q:(g + 1) * q] = \
            blk_m.reshape(-1, q)
    P = jnp.asarray(P)

    # D^-1 (pointwise diag of A) and w from a power estimate of D^-1 A
    diag = jnp.where(mask_u, 1.0, sim.el_diag(aug))
    Dinv = lambda v: v / diag
    v = jnp.ones((nn, d)) / np.sqrt(nn * d)
    lam = 1.0
    for _ in range(20):
        w_ = Dinv(Au(v))
        lam = jnp.sqrt(jnp.sum(w_ * w_)) / jnp.sqrt(jnp.sum(v * v))
        v = w_ / jnp.sqrt(jnp.sum(w_ * w_))
    omega = 4.0 / (3.0 * float(lam))
    print(f"  lmax(Dinv A) ~ {float(lam):.3f}, omega={omega:.3f}",
          flush=True)

    # P_s = (I - w Dinv A) P  (column-chunked operator applies)
    def smooth_cols(Pm):
        cols = []
        for j0 in range(0, dim_c, 64):
            blk = Pm[:, j0:j0 + 64]  # (nn*d, <=64)
            out = []
            for j in range(blk.shape[1]):
                col = blk[:, j].reshape(nn, d)
                out.append((col - omega * Dinv(Au(col))).reshape(-1))
            cols.append(jnp.stack(out, axis=1))
        return jnp.concatenate(cols, axis=1)

    t0 = time.perf_counter()
    Ps = smooth_cols(P)
    # A_c = Ps^T A Ps
    APs_cols = []
    for j0 in range(0, dim_c, 64):
        blk = Ps[:, j0:j0 + 64]
        out = []
        for j in range(blk.shape[1]):
            col = blk[:, j].reshape(nn, d)
            out.append(Au(col).reshape(-1))
        APs_cols.append(jnp.stack(out, axis=1))
    APs = jnp.concatenate(APs_cols, axis=1)
    Ac = np.asarray(Ps).T @ np.asarray(APs)
    Cfac = coarse_inverse(jnp.asarray(Ac))
    print(f"  SA setup {time.perf_counter() - t0:.1f} s "
          f"(dim_c={dim_c})", flush=True)

    PsT = Ps.T

    def M_sa(r):
        rc = PsT @ r.reshape(-1)
        z = Cfac.T @ rc
        w_ = Cfac @ z
        coarse = (Ps @ w_).reshape(nn, d)
        return bj(r) + coarse

    Mu_sa = lambda r: jnp.where(mask_u, r, M_sa(jnp.where(mask_u, 0.0, r)))
    x3, info3 = jax.jit(lambda b: pcg(Au, b, M=Mu_sa, rtol=rtol, atol=0.0,
                                      maxiter=maxiter))(b)
    diff = float(jnp.max(jnp.abs(x3 - x2)) / (jnp.max(jnp.abs(x2)) + 1e-30))
    print(f"  SA two-level iters={int(info3['iters'])} "
          f"(rel sol diff {diff:.2e}) — runtime on TPU would cost +2 "
          f"matvecs/iter, break-even needs >2.2x fewer iters", flush=True)


if __name__ == "__main__":
    main()
