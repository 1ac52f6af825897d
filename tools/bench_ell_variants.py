"""Microbenchmark ELL matvec variants on the TPU (round-3 item #1).

Hypotheses for the measured ~11 ms elasticity ELL matvec at 36k nodes:
  a) contraction layout: (n, K, d, d) puts d=3 in the trailing (lane)
     axis — 125/128 lanes idle during the multiply-reduce;
  b) gather count: K = max degree pads every row; avg degree is lower;
  c) gather throughput itself.

Variants:
  v0  current apply_ell_vector
  v1  node-last contraction: gather rows -> transpose (n,K,d)->(K,d,n),
      B stored (K, d, d, n), product/reduce with n in lanes
  v2  v1 + degree-sliced gather (rows sorted by degree, per-chunk K)
  v3  per-k gathers (K separate n-row gathers), node-last contraction
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

from glimslib_tpu.core.mesh import Mesh
from glimslib_tpu.ops.ell import EllPlan, apply_ell_vector, build_ell_elasticity
from glimslib_tpu.ops.assembly import P1Kernels
from __graft_entry__ import _brain_sim


def _time_inloop(op, x0, iters=30):
    @jax.jit
    def loop(x):
        def body(i, x):
            y = op(x)
            return y / (1.0 + 1e-30 * jnp.max(jnp.abs(y)))

        return jax.lax.fori_loop(0, iters, body, x)

    y = loop(x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = loop(x0)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def main():
    n = int(os.environ.get("GLIMS_PROF_N", "32"))
    dtype = jnp.float32
    sim = _brain_sim(
        n=n, dims=3, dtype=dtype,
        mesh_transform=lambda m: Mesh.from_arrays(m.points, m.cells)
        .reordered_morton(),
    )
    mesh = sim.mesh
    print(f"nodes {mesh.n_nodes} cells {mesh.n_cells}", flush=True)
    plan = EllPlan(mesh)
    adj = jnp.asarray(plan.adj)
    K = plan.K
    deg = (plan.adj < mesh.n_nodes).sum(axis=1)
    print(f"K={K} avg_deg={deg.mean():.1f} nnz_rows={deg.sum()} "
          f"padded_rows={mesh.n_nodes * K}", flush=True)

    kern = P1Kernels(mesh, dtype=dtype)
    arrays = (kern.grads_T, kern.vol)
    B = build_ell_elasticity(plan, arrays, 1.0, 9.0, dtype)  # (n, K, d, d)
    d = 3
    nn = mesh.n_nodes
    x = jnp.asarray(np.random.default_rng(0).normal(size=(nn, d)),
                    dtype=dtype)

    t0 = _time_inloop(lambda v: apply_ell_vector(adj, B, v), x)
    print(f"v0 current (n,K,d,d): {t0 * 1e3:.2f} ms", flush=True)

    # v1: node-last
    BT = jnp.asarray(np.ascontiguousarray(
        np.moveaxis(np.asarray(B), 0, -1)))  # (K, d, d, n)
    adj_flat = adj.ravel()

    def v1(v):
        xp = jnp.pad(v, ((0, 1), (0, 0)))
        xg = jnp.take(xp, adj_flat, axis=0).reshape(nn, K, d)
        xgT = jnp.transpose(xg, (1, 2, 0))  # (K, b, n)
        prod = BT * xgT[:, None, :, :]  # (K, a, b, n)
        y = jnp.sum(prod, axis=(0, 2))  # (a, n)
        return y.T

    t1 = _time_inloop(v1, x)
    err = float(jnp.max(jnp.abs(v1(x) - apply_ell_vector(adj, B, x))))
    print(f"v1 node-last:        {t1 * 1e3:.2f} ms  (err {err:.2e})",
          flush=True)

    # v3: per-k gathers, node-last
    adj_cols = [adj[:, k] for k in range(K)]

    def v3(v):
        xp = jnp.pad(v, ((0, 1), (0, 0)))
        acc = None
        for k in range(K):
            xk = jnp.take(xp, adj_cols[k], axis=0)  # (n, d)
            con = jnp.sum(BT[k] * xk.T[None, :, :], axis=1)  # (a, n)
            acc = con if acc is None else acc + con
        return acc.T

    t3 = _time_inloop(v3, x)
    err = float(jnp.max(jnp.abs(v3(x) - apply_ell_vector(adj, B, x))))
    print(f"v3 per-k gathers:    {t3 * 1e3:.2f} ms  (err {err:.2e})",
          flush=True)

    # v2: degree-sliced — sort rows by degree, chunked K
    order = np.argsort(deg, kind="stable")
    nchunk = 8
    bounds = [int(round(i * nn / nchunk)) for i in range(nchunk + 1)]
    slices = []
    for i in range(nchunk):
        rows = order[bounds[i]:bounds[i + 1]]
        Ki = int(deg[rows].max())
        slices.append((jnp.asarray(rows), Ki))
    tot = sum(len(r) * Ki for r, Ki in slices)
    print(f"v2 sliced gather rows: {tot} ({tot / (nn * K):.2f} of padded)",
          flush=True)
    # per-slice adjacency and BT
    sl_data = []
    for rows, Ki in slices:
        rows_np = np.asarray(rows)
        adj_i = plan.adj[rows_np][:, :Ki]
        B_i = np.asarray(B)[rows_np][:, :Ki]  # (ni, Ki, d, d)
        BT_i = jnp.asarray(np.ascontiguousarray(
            np.moveaxis(B_i, 0, -1)))  # (Ki, d, d, ni)
        sl_data.append((jnp.asarray(adj_i.ravel()), BT_i, Ki, len(rows_np)))
    order_j = jnp.asarray(order)

    def v2(v):
        xp = jnp.pad(v, ((0, 1), (0, 0)))
        outs = []
        for adj_i, BT_i, Ki, ni in sl_data:
            xg = jnp.take(xp, adj_i, axis=0).reshape(ni, Ki, d)
            xgT = jnp.transpose(xg, (1, 2, 0))
            prod = BT_i * xgT[:, None, :, :]
            outs.append(jnp.sum(prod, axis=(0, 2)).T)  # (ni, d)
        y_sorted = jnp.concatenate(outs, axis=0)
        return jnp.zeros_like(v).at[order_j].set(y_sorted)

    t2 = _time_inloop(v2, x)
    err = float(jnp.max(jnp.abs(v2(x) - apply_ell_vector(adj, B, x))))
    print(f"v2 degree-sliced:    {t2 * 1e3:.2f} ms  (err {err:.2e})",
          flush=True)


if __name__ == "__main__":
    main()
