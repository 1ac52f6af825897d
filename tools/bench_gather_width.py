"""Measure TPU row-gather throughput vs row width (supernode-ELL sizing).

CLAUDE.md perf model says width<=8 rows gather ~3x faster per row than
scalar gathers, flat in width.  The supernode-blocked ELL idea needs the
rate at widths 24-96: if wide rows stay ~flat per row, blocking nodes
into supernodes divides the gather count by the block size.
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


def _time_inloop(op, x0, iters=50):
    @jax.jit
    def loop(x):
        def body(i, x):
            y = op(x)
            return y * (1.0 - 1e-30 * jnp.max(y))

        return jax.lax.fori_loop(0, iters, body, x)

    y = loop(x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = loop(x0)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    n_nodes = 36000
    total_vals = 540_000 * 3  # match the flagship ELL gather volume
    for w in (2, 3, 8, 16, 24, 32, 48, 96, 128):
        nrows_src = max(n_nodes * 3 // w, 1)
        nrows_gather = max(total_vals // w, 1)
        src = jnp.asarray(rng.normal(size=(nrows_src + 1, w)),
                          dtype=jnp.float32)
        idx = jnp.asarray(rng.integers(0, nrows_src, size=nrows_gather),
                          dtype=jnp.int32)

        def op(x, idx=idx):
            g = jnp.take(x, idx, axis=0)
            s = jnp.sum(g, axis=0, keepdims=True)
            return x.at[:1].set(s * (1e-30))

        t = _time_inloop(op, src)
        rate_rows = nrows_gather / t / 1e6
        rate_elems = nrows_gather * w / t / 1e6
        print(f"w={w:4d} rows={nrows_gather:8d} t={t*1e3:7.2f} ms  "
              f"{rate_rows:8.1f} Mrow/s  {rate_elems:8.1f} Melem/s",
              flush=True)


if __name__ == "__main__":
    main()
