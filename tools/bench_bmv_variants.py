"""Micro-bench of batched-matvec kernel variants for the bell operators.

Isolates the (nb, M, K) @ (nb, K) contraction at flagship shapes and
measures:
  - xla: broadcast mul+reduce (the fallback)
  - k_lane: Pallas, canonical (B, M, K) layout, reduce over lanes
  - k_sub: Pallas, transposed (B, K, M) layout, reduce over sublanes
  - k_dot: Pallas, per-batch jnp.dot on the MXU (HIGHEST precision)
  - gather: the halo row-gather alone (the floor's other term)

All loops mutate the carry so XLA cannot hoist the op (CLAUDE.md).

Usage: python tools/bench_bmv_variants.py
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _timed(f, *args, iters=50):
    """Time f(x, *rest) where x = args[0] is perturbed by the carry each
    iteration (forces sequencing; the perturbation is an elementwise pass
    over x only)."""
    x0, rest = args[0], args[1:]

    @jax.jit
    def loop(s, x, *a):
        def body(i, carry):
            s, = carry
            y = f(x * (1.0 + s), *a)
            return (1e-30 * jnp.sum(y),)

        return jax.lax.fori_loop(0, iters, body, (s,))

    s = loop(jnp.float32(0.0), x0, *rest)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s = loop(jnp.float32(0.0), x0, *rest)
    jax.block_until_ready(s)
    return (time.perf_counter() - t0) / iters


@functools.lru_cache(maxsize=None)
def k_lane(B, M, K, g):
    def kern(a_ref, x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jnp.sum(a_ref[...] * x[:, None, :], axis=2)

    return pl.pallas_call(
        kern, grid=(B // g,),
        out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
        in_specs=[pl.BlockSpec((g, M, K), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((g, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, M), lambda i: (i, 0),
                               memory_space=pltpu.VMEM))


@functools.lru_cache(maxsize=None)
def k_sub(B, M, K, g):
    # A transposed (B, K, M); x as (B, K, 1) to broadcast over lanes
    def kern(a_ref, x_ref, o_ref):
        o_ref[...] = jnp.sum(a_ref[...] * x_ref[...], axis=1)

    return pl.pallas_call(
        kern, grid=(B // g,),
        out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
        in_specs=[pl.BlockSpec((g, K, M), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((g, K, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, M), lambda i: (i, 0),
                               memory_space=pltpu.VMEM))


@functools.lru_cache(maxsize=None)
def k_dot(B, M, K, g):
    def kern(a_ref, x_ref, o_ref):
        a = a_ref[...]
        x = x_ref[...]
        for b in range(g):
            o_ref[b, :] = jnp.dot(
                a[b], x[b], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    return pl.pallas_call(
        kern, grid=(B // g,),
        out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
        in_specs=[pl.BlockSpec((g, M, K), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((g, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, M), lambda i: (i, 0),
                               memory_space=pltpu.VMEM))


def main():
    rng = np.random.default_rng(0)
    out = {}
    g = 8
    for name, B, M, K in (("el", 1128, 96, 474), ("sn", 1128, 96, 96),
                          ("rd", 1128, 32, 158)):
        A = jnp.asarray(rng.standard_normal((B, M, K)), jnp.float32)
        AT = jnp.asarray(np.transpose(np.asarray(A), (0, 2, 1)))
        x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
        want = np.asarray(jnp.sum(A * x[:, None, :], axis=2))
        r = {}
        r["xla_ms"] = _timed(
            lambda x_, A_: jnp.sum(A_ * x_[:, None, :], axis=2),
            x, A) * 1e3
        got = np.asarray(k_lane(B, M, K, g)(A, x))
        assert np.allclose(got, want, atol=1e-3), abs(got - want).max()
        r["k_lane_ms"] = _timed(
            lambda x_, A_: k_lane(B, M, K, g)(A_, x_), x, A) * 1e3
        got = np.asarray(k_sub(B, M, K, g)(AT, x[:, :, None]))
        assert np.allclose(got, want, atol=1e-3), abs(got - want).max()
        r["k_sub_ms"] = _timed(
            lambda x_, A_: k_sub(B, M, K, g)(A_, x_[:, :, None]), x, AT) * 1e3
        got = np.asarray(k_dot(B, M, K, g)(A, x))
        assert np.allclose(got, want, atol=1e-3), abs(got - want).max()
        r["k_dot_ms"] = _timed(
            lambda x_, A_: k_dot(B, M, K, g)(A_, x_), x, A) * 1e3
        out[name] = r
        print(json.dumps({name: r}), file=sys.stderr, flush=True)

    # halo gather floor: 178k width-3 rows into (nb, Kh*d)
    idx = jnp.asarray(rng.integers(0, 35938, size=1128 * 158), jnp.int32)
    xs = jnp.asarray(rng.standard_normal((35938, 3)), jnp.float32)
    out["gather_178k_w3_ms"] = _timed(
        lambda v, i: jnp.take(v, i, axis=0), xs, idx) * 1e3
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
