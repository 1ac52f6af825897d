"""Standalone kernel ground truth: batched matvec layouts at flagship shapes.

Times, in-loop (carry-mutating), the three batched-matvec formulations on
synthetic tables at the 197k-tet bell shapes:

  - grouped (nb, M, K) Pallas kernel (batched_matvec)
  - lane-chunked (M, K, nb) kernel (batched_matvec_T, 3-D)
  - chunk-contiguous (nb/128, M, K, 128) kernel (batched_matvec_T, 4-D)

plus the halo-gather op alone, to locate the matvec's roofline terms.

Usage: python tools/bench_bmv_kernels.py
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

from glimslib_tpu.ops import bell_pallas as bp


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
    rng = np.random.default_rng(0)
    out = {}
    for name, (B, M, K) in (
        ("el_matvec", (1152, 96, 474)),   # (nb, s*d, Kh*d)
        ("sn_jacobi", (1152, 96, 96)),    # (nb, s*d, s*d)
        ("rd_matvec", (1152, 32, 158)),   # (nb, s, Kh)
    ):
        A = jnp.asarray(rng.standard_normal((B, M, K)), jnp.float32)
        mb = B * M * K * 4 / 1e6
        out[f"{name}_MB"] = round(mb, 1)
        x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
        # grouped kernel: loop mutates x, A as arg
        g = bp._pick_batch_group(B, M, K)
        if g:
            t = _time_inloop(
                lambda xx, AA: bp.batched_matvec(AA, xx)[:, :K]
                if M >= K else jnp.pad(bp.batched_matvec(AA, xx),
                                       ((0, 0), (0, K - M))),
                x, args=(A,))
            out[f"{name}_grouped_ms"] = round(t * 1e3, 4)
            out[f"{name}_grouped_GBps"] = round(mb / 1e3 / t, 1)
        # 3-D lane-chunk layout
        if bp.bmv_T_available(B, M, K):
            AT = jnp.transpose(A, (1, 2, 0))
            t = _time_inloop(
                lambda xT, AA: (
                    lambda y: y[:K, :] if M >= K
                    else jnp.pad(y, ((0, K - M), (0, 0)))
                )(bp._bmv_T_call(B, M, K, False)(AA, xT)),
                jnp.asarray(x.T), args=(AT,))
            out[f"{name}_T3_ms"] = round(t * 1e3, 4)
            out[f"{name}_T3_GBps"] = round(mb / 1e3 / t, 1)
        # 4-D chunk-contiguous layout
        if bp.bmv_C_available(B, M, K):
            A4 = jnp.transpose(
                A.reshape(B // 128, 128, M, K), (0, 2, 3, 1))
            out[f"{name}_C_mt"] = bp._mt_for_C(M, K)

            def c_op(xT, AA):
                xc = xT.reshape(K, B // 128, 128).swapaxes(0, 1)
                y = bp._bmv_C_call(B, M, K, False)(AA, xc)
                return y[:K, :] if M >= K else jnp.pad(
                    y, ((0, K - M), (0, 0)))

            t = _time_inloop(c_op, jnp.asarray(x.T), args=(A4,))
            out[f"{name}_C_ms"] = round(t * 1e3, 4)
            out[f"{name}_C_GBps"] = round(mb / 1e3 / t, 1)

    # halo-like gather alone: 145k width-3 rows out of (n+1, 3)
    n = 35937
    ids = jnp.asarray(
        rng.integers(0, n, size=(1152 * 126,)), jnp.int32)
    xp = jnp.asarray(rng.standard_normal((n + 1, 3)), jnp.float32)

    def gop(xx, ii):
        g = jnp.take(xx, ii, axis=0)  # (145k, 3)
        return xx.at[:1].set(jnp.sum(g) * 1e-30 + xx[:1])

    out["gather_145k_w3_ms"] = round(_time_inloop(gop, xp, args=(ids,)) * 1e3, 4)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
