"""Slope-based breakdown of the streamed unstructured rd residual.

The r4 profile puts one rd residual eval at ~9.8 ms (in-loop, ~0.5 ms
sync bias) x ~4 evals/step at 197k tets — ~19% of the step.  This tool
times its pieces with two-point slope timing (CLAUDE.md axon timing
gotcha): the two scalar bell matvecs, the quadratic logistic term
(cell gather + pull), and the full residual.

Usage: [GLIMS_PROF_N=32] python tools/bench_rd_residual.py
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


def slope_time(fn, x0, args, iters=(16, 64)):
    """Per-iteration time via two iteration counts (cancels the ~26 ms
    per-call sync bias, tools/bench_bmv_kernels.py method)."""
    import functools

    def loop_for(n):
        @functools.partial(jax.jit, static_argnums=())
        def loop(x, *a):
            def body(i, x):
                y = fn(x, *a)
                return y / (1.0 + 1e-30 * jnp.max(jnp.abs(y)))

            return jax.lax.fori_loop(0, n, body, x)

        return loop

    times = []
    for n in iters:
        loop = loop_for(n)
        y = loop(x0, *args)
        float(jnp.max(jnp.abs(y)))  # host sync
        t0 = time.perf_counter()
        y = loop(x0, *args)
        float(jnp.max(jnp.abs(y)))
        times.append(time.perf_counter() - t0)
    return (times[1] - times[0]) / (iters[1] - iters[0])


def main():
    n = int(os.environ.get("GLIMS_PROF_N", "32"))
    dtype = (jnp.float64 if jax.config.read("jax_enable_x64")
             else jnp.float32)
    sim = _brain_sim(n=n, dims=3, dtype=dtype,
                     mesh_transform=lambda m: Mesh.from_arrays(
                         m.points, m.cells).reordered_morton())
    theta0 = sim.make_theta(sim.params.as_dict())
    iv = sim.params.create_initial_value_function()
    c0 = jnp.asarray(iv[1], dtype)
    aux = sim.runtime_aux()
    jax.block_until_ready(list(aux.values()))
    aug = jax.jit(sim._augment_theta_with_operators)({**theta0, **aux})
    jax.block_until_ready(jax.tree_util.tree_leaves(aug))
    kern = sim.kernels
    from glimslib_tpu.ops import bell as bell_mod

    bplan = sim._get_bell_plan()
    t1 = jnp.asarray(1.0, dtype)
    print(f"n={n} nodes={sim.mesh.n_nodes} cells={sim.mesh.n_cells}",
          flush=True)

    ms = slope_time(
        lambda c, a: sim.rd_residual(c, c0, a, t1), c0 + 0.01, (aug,)
    ) * 1e3
    print(f"rd_residual (streamed, full): {ms:.3f} ms", flush=True)

    ms = slope_time(
        lambda c, a: kern.rd_quad_residual(c, a["rho"], a["dt"],
                                           conc_max=1.0),
        c0 + 0.01, (aug,),
    ) * 1e3
    print(f"  quad term (gather+pull):    {ms:.3f} ms", flush=True)

    if "_BellWrdCT" in aug:
        ms = slope_time(
            lambda c, a: bell_mod.apply_bell_scalar_T(
                bplan, a["_BellHalo"], a["_BellWrdCT"], c),
            c0 + 0.01, (aug,),
        ) * 1e3
        print(f"  one scalar matvec (T):      {ms:.3f} ms", flush=True)

    ms = slope_time(
        lambda u, a: sim.el_residual(u, c0, a, t1),
        jnp.zeros((sim.mesh.n_nodes, 3), dtype) + 0.01, (aug,),
    ) * 1e3
    print(f"el_residual (streamed, full): {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
