"""Layout probe: per-iteration cost of elementwise+reduce bodies vs the
array layout of the CG vectors.

(n, 3) pads the 3-wide minor dim to 128 lanes (18 MB tiles for a 0.4 MB
vector); flat (n*3,) and transposed (3, n) pack fully.  If the flat forms
are ~10x faster, the unstructured solver's hot vectors must go flat.

Usage: python tools/bench_layout.py
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


def renorm_loop(shape_x):
    @jax.jit
    def loop(x):
        def body(i, x):
            return x / (1.0 + 1e-30 * jnp.max(jnp.abs(x)))

        return jax.lax.fori_loop(0, 50, body, x)

    return loop


def axpy_dots_loop():
    @jax.jit
    def loop(x, p):
        def body(i, st):
            x, p = st
            a = jnp.sum(x * p)
            x = x + (1e-30 * a) * p
            b = jnp.sum(x * x)
            p = p + (1e-30 * b) * x
            return (x, p)

        return jax.lax.fori_loop(0, 50, body, (x, p))

    return loop


def main():
    rng = np.random.default_rng(0)
    n = 35937
    out = {}
    for name, shape in (("n3", (n, 3)), ("3n", (3, n)), ("flat", (n * 3,)),
                        ("n1", (n,))):
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        out[f"renorm_{name}_ms"] = timeit(renorm_loop(shape), x) * 1e3
        p = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        out[f"cgops_{name}_ms"] = timeit(axpy_dots_loop(), x, p) * 1e3
        print(json.dumps({k: v for k, v in out.items() if name in k}),
              file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
