"""Micro-bench: supernode halo-ELL matvec + preconditioner variants.

In-loop timings (carry-mutating fori_loop per CLAUDE.md perf model) of
the per-CG-iteration unstructured hot ops at flagship scale, comparing
implementation variants:

  - apply_bell_vector: broadcast mul+reduce (current) vs batched
    lax.dot_general at HIGHEST precision (MXU 3-pass, f32-equivalent);
  - apply_supernode_jacobi: mul+reduce vs batched dot_general (DEFAULT
    precision is fine for a preconditioner);
  - two-level coarse factor: f32 vs bf16 storage.

Usage: GLIMS_PROF_N=32 python tools/bench_bell_micro.py
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
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

import jax.numpy as jnp

from __graft_entry__ import _brain_sim
from glimslib_tpu.core.mesh import Mesh
from glimslib_tpu.ops import bell as bell_mod


def _time_inloop(op, x0, iters=50, args=()):
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


def main():
    n = int(os.environ.get("GLIMS_PROF_N", "32"))
    dtype = jnp.float32
    sim = _brain_sim(n=n, dims=3, dtype=dtype,
                     mesh_transform=lambda m: Mesh.from_arrays(
                         m.points, m.cells).reordered_morton())
    bplan = sim._get_bell_plan()
    theta0 = sim.make_theta(sim.params.as_dict())
    aux = sim.runtime_aux()
    aug = jax.jit(sim._augment_theta_with_operators)({**theta0, **aux})
    jax.block_until_ready(aug)
    iv = sim.params.create_initial_value_function()
    u0 = jnp.asarray(iv[0], dtype) + 0.01
    nb, s, Kh, d = bplan.nb, bplan.s, bplan.Kh, sim.mesh.dim
    m = s * d
    out = {"n": n, "nb": nb, "s": s, "Kh": Kh}

    halo = aux["_BellHalo"]
    use_T = "_BellWelT" in aug
    out["bell_T"] = use_T
    if use_T:
        WT = aug["_BellWelT"]
        BinvT = aug["_BinvSNT"]
        out["el_matvec_T_ms"] = _time_inloop(
            lambda u, h, Wv: bell_mod.apply_bell_vector_T(bplan, h, Wv, u),
            u0, args=(halo, WT)) * 1e3
        out["el_precond_snT_ms"] = _time_inloop(
            lambda r, B: bell_mod.apply_supernode_jacobi_T(bplan, B, r),
            u0, args=(BinvT,)) * 1e3
        out["rd_matvec_T_ms"] = _time_inloop(
            lambda v, h, Wv: bell_mod.apply_bell_scalar_T(bplan, h, Wv, v),
            jnp.asarray(iv[1], dtype) + 0.01,
            args=(halo, aug["_BellWrdCT"])) * 1e3
        # halo build alone (own-reshape + external gather + concat is the
        # other roofline term)
        out["halo_gather_ms"] = _time_inloop(
            lambda u, h: bell_mod._halo_vector(bplan, h, u).reshape(
                -1, u.shape[1]
            )[: u.shape[0]] * 1.0,
            u0, args=(halo,)) * 1e3
        W = bell_mod.from_kernel_layout(WT).reshape(
            nb, bplan.s, sim.mesh.dim, bplan.Kh, sim.mesh.dim)
        Binv = bell_mod.from_kernel_layout(BinvT)
    else:
        W = aug["_BellWel"]
        Binv = aug["_BinvSN"]

    out["el_matvec_mulreduce_ms"] = _time_inloop(
        lambda u, h, Wv: bell_mod.apply_bell_vector(bplan, h, Wv, u),
        u0, args=(halo, W)) * 1e3

    def matvec_dot(u, h, Wv, prec):
        npts = u.shape[0]
        xh = bell_mod._halo_vector(bplan, h, u)
        y = jax.lax.dot_general(
            Wv.reshape(nb, s * d, Kh * d), xh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=prec, preferred_element_type=jnp.float32)
        return y.reshape(nb * s, d)[:npts]

    out["el_matvec_dot_highest_ms"] = _time_inloop(
        lambda u, h, Wv: matvec_dot(u, h, Wv, jax.lax.Precision.HIGHEST),
        u0, args=(halo, W)) * 1e3

    out["el_precond_mulreduce_ms"] = _time_inloop(
        lambda r, B: bell_mod.apply_supernode_jacobi(bplan, B, r),
        u0, args=(Binv,)) * 1e3

    def precond_dot(r, B, prec):
        shape = r.shape
        rp = jnp.pad(r.reshape(-1), (0, nb * m - r.reshape(-1).shape[0]))
        z = jax.lax.dot_general(
            B, rp.reshape(nb, m),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=prec, preferred_element_type=jnp.float32)
        return z.reshape(-1)[: r.reshape(-1).shape[0]].reshape(shape)

    for name, prec in (("default", jax.lax.Precision.DEFAULT),
                       ("highest", jax.lax.Precision.HIGHEST)):
        out[f"el_precond_dot_{name}_ms"] = _time_inloop(
            lambda r, B, p=prec: precond_dot(r, B, p),
            u0, args=(Binv,)) * 1e3

    # two-level coarse factor: f32 vs bf16 streaming
    if "_TLCfac" in aux:
        from glimslib_tpu.solvers.twolevel import make_twolevel_precond

        agg = sim._twolevel_aggplan()
        Mt = aux["_TLMt"]
        base = lambda x: bell_mod.apply_supernode_jacobi(bplan, Binv, x)
        Cf = aux["_TLCfac"]
        out["tl_dtype"] = str(Cf.dtype)
        out["tl_apply_ms"] = _time_inloop(
            lambda r, C, M: make_twolevel_precond(agg, C, M, base)(r),
            u0, args=(Cf, Mt)) * 1e3
        Cf32 = Cf.astype(jnp.float32)
        out["tl_apply_f32_ms"] = _time_inloop(
            lambda r, C, M: make_twolevel_precond(agg, C, M, base)(r),
            u0, args=(Cf32, Mt)) * 1e3

    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
