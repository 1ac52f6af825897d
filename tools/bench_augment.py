"""Time _augment_theta_with_operators (the per-simulate operator
assembly) on the unstructured flagship, and its major pieces.

At bench N_STEPS=5 the augment cost amortizes over only 5 steps — if it
is hundreds of ms it dominates the unexplained step-time gap (round-3
profiling).  Usage: GLIMS_PROF_N=32 python tools/bench_augment.py
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

if os.environ.get("GLIMS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GLIMS_PLATFORM"])
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".jax_cache"))

import jax.numpy as jnp

from __graft_entry__ import _brain_sim
from glimslib_tpu.core.mesh import Mesh
from glimslib_tpu.ops import bell as bell_mod


def timeit(fn, *args, reps=4):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n = int(os.environ.get("GLIMS_PROF_N", "32"))
    dtype = jnp.float32
    sim = _brain_sim(n=n, dims=3, dtype=dtype,
                     mesh_transform=lambda m: Mesh.from_arrays(
                         m.points, m.cells).reordered_morton())
    out = {"n": n, "n_cells": int(sim.mesh.n_cells)}
    theta0 = sim.make_theta(sim.params.as_dict())
    aux = sim.runtime_aux()
    merged = {**theta0, **aux}
    aug_fn = jax.jit(sim._augment_theta_with_operators)
    out["augment_ms"] = timeit(aug_fn, merged)

    bplan = sim._get_bell_plan()
    kern = sim.kernels
    arrays = (kern.grads_T, kern.vol)
    tb = sim._bell_tables_from(merged)
    mask_u, mask_c, _, _ = sim._bc_masks_and_values()

    @jax.jit
    def f_el(th):
        return bell_mod.build_bell_elasticity(
            bplan, arrays, th["mu"], th["lam"], dtype, tables=tb)

    out["build_elasticity_ms"] = timeit(f_el, merged)
    Wel = f_el(merged)

    @jax.jit
    def f_binv(W):
        return bell_mod.supernode_jacobi_inverse(
            bplan, bell_mod.extract_self_blocks_vector(bplan, W),
            mask=mask_u)

    out["binv_inverse_ms"] = timeit(f_binv, Wel)

    @jax.jit
    def f_T(W):
        return bell_mod.transpose_tables_T(bplan, W=W)["_BellWelT"]

    out["transpose_T_ms"] = timeit(f_T, Wel)

    @jax.jit
    def f_rd(th):
        return bell_mod.build_bell_rd_const(
            bplan, arrays, th["D"], th["rho"], th["dt"], kern._m0,
            dtype, tables=tb)

    out["build_rd_const_ms"] = timeit(f_rd, merged)

    @jax.jit
    def f_cuc(th):
        return bell_mod.build_bell_coupling_uc(
            bplan, arrays, th["mu"], th["lam"], th["coupling"], dtype,
            tables=tb)

    out["build_coupling_ms"] = timeit(f_cuc, merged)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
