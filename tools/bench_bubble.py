"""Isolate the per-iteration serialization cost on this backend.

Times fori_loop bodies at flagship shapes:
  - chain:    y = op(x) * (1+1e-30)  (pure elementwise chain, no scalar)
  - renorm:   y = op(x) / (1 + 1e-30*max|y|)  (scalar reduce + broadcast)
  - noop_renorm: x / (1 + 1e-30*max|x|)        (the reduce alone)

If renorm - chain ~ noop_renorm >> 0, per-iteration scalar reduces (CG
dots) dominate the solve, not the matvec kernels.

Usage: python tools/bench_bubble.py
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


def timeit(loop, *args, iters=50):
    y = loop(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = loop(*args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    B, M, K = 1128, 96, 474
    A = jnp.asarray(rng.standard_normal((B, M, K)), jnp.float32)
    n = 35937
    x0 = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n + 1, size=B * K // 3), jnp.int32)
    out = {}

    def matvec(x, A_):
        xp = jnp.pad(x, ((0, 1), (0, 0)))
        xh = jnp.take(xp, idx, axis=0).reshape(B, K)
        y = jnp.sum(A_ * xh[:, None, :], axis=2)  # (B, M)
        return y.reshape(-1)[: n * 3].reshape(n, 3)

    @jax.jit
    def loop_chain(x, A_):
        def body(i, x):
            return matvec(x, A_) * (1.0 + 1e-30)

        return jax.lax.fori_loop(0, 50, body, x)

    @jax.jit
    def loop_renorm(x, A_):
        def body(i, x):
            y = matvec(x, A_)
            return y / (1.0 + 1e-30 * jnp.max(jnp.abs(y)))

        return jax.lax.fori_loop(0, 50, body, x)

    @jax.jit
    def loop_noop_renorm(x):
        def body(i, x):
            return x / (1.0 + 1e-30 * jnp.max(jnp.abs(x)))

        return jax.lax.fori_loop(0, 50, body, x)

    @jax.jit
    def loop_two_dots(x):
        def body(i, x):
            a = jnp.sum(x * x)
            y = x / (1.0 + 1e-30 * a)
            b = jnp.sum(y * y)
            return y / (1.0 + 1e-30 * b)

        return jax.lax.fori_loop(0, 50, body, x)

    out["matvec_chain_ms"] = timeit(loop_chain, x0, A) * 1e3
    out["matvec_renorm_ms"] = timeit(loop_renorm, x0, A) * 1e3
    out["noop_renorm_ms"] = timeit(loop_noop_renorm, x0) * 1e3
    out["two_dots_ms"] = timeit(loop_two_dots, x0) * 1e3
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
