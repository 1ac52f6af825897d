"""Slope-based cost breakdown of the two-level elasticity preconditioner
apply at flagship scale: supernode BJ base, restrict_T, the dense bf16
factor matvecs, prolong_T, and the composed apply — against the HBM
roofline (factor stream ~113 MB bf16 + BJ 41 MB + Mt ~5 MB x2).

Usage: [GLIMS_PROF_N=32] python tools/bench_twolevel_apply.py
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
from glimslib_tpu.ops import bell as bell_mod
from glimslib_tpu.solvers.twolevel import make_twolevel_precond


def slope_time(fn, x0, args, iters=(16, 64)):
    import functools

    def loop_for(n):
        @functools.partial(jax.jit)
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
        float(jnp.max(jnp.abs(y)))
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
    aux = sim.runtime_aux()
    jax.block_until_ready(list(aux.values()))
    aug = jax.jit(sim._augment_theta_with_operators)({**theta0, **aux})
    jax.block_until_ready(jax.tree_util.tree_leaves(aug))
    bplan = sim._get_bell_plan()
    agg = sim._twolevel_aggplan()
    r0 = jnp.ones((sim.mesh.n_nodes, 3), dtype) * 0.01
    Cfac, Mt = aug["_TLCfac"], aug["_TLMt"]
    BinvT = aug.get("_BinvSNT", aug.get("_BinvSN"))
    use_T = "_BinvSNT" in aug
    print(f"n={n} dim_c={Cfac.shape[0]} k={Cfac.shape[1]} "
          f"factor dtype={Cfac.dtype}", flush=True)

    base = (
        (lambda x, B: bell_mod.apply_supernode_jacobi_T(bplan, B, x))
        if use_T else
        (lambda x, B: bell_mod.apply_supernode_jacobi(bplan, B, x))
    )
    ms = slope_time(base, r0, (BinvT,)) * 1e3
    print(f"supernode BJ base:        {ms:.3f} ms", flush=True)

    def restr(x, Mt):
        w = agg.restrict_T(Mt, x)
        return x + 1e-30 * jnp.sum(w)

    ms = slope_time(restr, r0, (Mt,)) * 1e3
    print(f"restrict_T:               {ms:.3f} ms", flush=True)

    rc0 = agg.restrict_T(Mt, r0).astype(Cfac.dtype)

    def dense(rc, B):
        z = jnp.dot(B.T, rc, preferred_element_type=jnp.float32)
        return jnp.dot(B, z.astype(B.dtype),
                       preferred_element_type=jnp.float32).astype(rc.dtype)

    ms = slope_time(dense, rc0, (Cfac,)) * 1e3
    print(f"dense factor (B Bt r):    {ms:.3f} ms", flush=True)

    def prol(x, Mt):
        out = agg.prolong_T(Mt.astype(jnp.float32),
                            jnp.sum(x) + jnp.zeros(agg.nagg * agg.q,
                                                   jnp.float32))
        return x + 1e-30 * out[0, 0]

    M2 = make_twolevel_precond(agg, Cfac, Mt, lambda x: base(x, BinvT))
    ms = slope_time(lambda x, C, Mt_, B: make_twolevel_precond(
        agg, C, Mt_, lambda v: base(v, B))(x), r0, (Cfac, Mt, BinvT)) * 1e3
    print(f"composed two-level apply: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
