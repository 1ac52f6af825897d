"""Pallas TPU kernels for the offset-stencil matvecs.

The XLA stencil matvec (ops/stencil.py apply_scalar/apply_vector) issues
one ``jnp.roll`` + multiply-add per offset plane; each roll materializes a
full copy in HBM, so a 36k-node elasticity matvec costs ~140 us against a
~25 us speed-of-light (planes are ~19 MB).  These kernels keep the node
vector resident in VMEM and perform all shifted reads as in-register
``pltpu.roll`` lane/sublane rotations, so the only HBM traffic is one
streaming pass over the weight planes.

Flat-roll decomposition: node vectors are reshaped to (R, 128) tiles; a
flat roll by k = q*128 + r is a sublane roll by q, a lane roll by r, and a
row-carry select for the lanes that wrap (all shifts static per offset).

Correctness at the boundary relies on the stencil invariant (see
ops/stencil.py): W[o, i] = 0 whenever node i has no neighbour at offset o
— including wrap-around positions — so zero-padding node vectors to a
multiple of the (8, 128) f32 tile is exact.

Gated to the TPU backend (GLIMS_PALLAS=0 disables); the XLA roll path
remains the fallback and the reference implementation for CPU tests.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_TILE = 1024  # 8 sublanes x 128 lanes (f32 min tile)


def pallas_enabled() -> bool:
    if os.environ.get("GLIMS_PALLAS", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _interpret() -> bool:
    # CPU correctness testing of the kernel logic (tests only; slow)
    return os.environ.get("GLIMS_PALLAS_INTERPRET", "0") == "1"


def _pad_len(n: int) -> int:
    return -(-n // _TILE) * _TILE


# VMEM working-set budget for the kernels (v5e has ~16 MB/core; leave
# headroom for double-buffering and the compiler)
_VMEM_BUDGET = 12 * 1024 * 1024
_GROUP = 5  # offsets streamed per grid step in the vector kernel


def scalar_fits(n_off: int, n: int) -> bool:
    """Whole scalar plane set + vectors must fit VMEM (no grid)."""
    return (n_off + 2) * _pad_len(n) * 4 <= _VMEM_BUDGET


def _pick_group(n: int, d: int) -> int:
    """Largest offsets-per-grid-step group whose working set (double-
    buffered plane block + in/out vectors) fits the VMEM budget; 0 if even
    a single-offset block does not fit."""
    npad = _pad_len(n)
    for g in range(_GROUP, 0, -1):
        if (2 * g * d * d + 2 * d) * npad * 4 <= _VMEM_BUDGET:
            return g
    return 0


def vector_fits(n_off: int, n: int, d: int) -> bool:
    """True when the streamed vector kernel can run at some group size."""
    return _pick_group(n, d) > 0


def scalar_available(n_off: int, n: int) -> bool:
    """True when apply_scalar_pallas can run: either the whole-resident
    kernel fits, or the grouped-streaming fallback (d=1) does — the latter
    extends the fast path past the ~120k-node ceiling (VERDICT r2 #4)."""
    return scalar_fits(n_off, n) or _pick_group(n, 1) > 0


def _flat_roll(x2, k):
    """Roll the flattened view of x2 (R, 128) by -k (fetch x[i+k]); k static."""
    from jax.experimental.pallas import tpu as pltpu

    if k == 0:
        return x2
    R = x2.shape[0]
    q, r = divmod(k % (R * 128), 128)
    # shift amounts trace as i32 (tpu.dynamic_rotate rejects the i64 a
    # bare Python int becomes under jax x64)
    i32 = lambda v: jnp.asarray(v, jnp.int32)  # noqa: E731
    base = pltpu.roll(x2, i32(-q % R), 0) if q else x2
    if r == 0:
        return base
    a = pltpu.roll(base, i32(-r % 128), 1)
    b = pltpu.roll(a, i32(-1 % R), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x2.shape, 1)
    return jnp.where(lane < 128 - r, a, b)


@functools.lru_cache(maxsize=None)
def _scalar_kernel(offsets, R, n_off, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(w_ref, x_ref, o_ref):
        x = x_ref[:]
        acc = jnp.zeros_like(x)
        for o, off in enumerate(offsets):
            acc = acc + w_ref[o] * _flat_roll(x, off)
        o_ref[:] = acc

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def apply_scalar_pallas(offsets, W, v):
    """(A v)[i] = sum_o W[o, i] v[i + off_o] — planes and vector VMEM-resident.

    ``W`` (n_off, n) f32, ``v`` (n,) f32.  Above the whole-resident VMEM
    ceiling the planes are streamed through the grouped grid kernel
    (the d=1 case of the vector path) instead of falling back to XLA."""
    n = v.shape[0]
    if not scalar_fits(len(offsets), n):
        return apply_vector_pallas(offsets, W[:, None, None, :],
                                   v[:, None])[:, 0]
    npad = _pad_len(n)
    R = npad // 128
    Wp = jnp.pad(W, ((0, 0), (0, npad - n))).reshape(len(offsets), R, 128)
    vp = jnp.pad(v, (0, npad - n)).reshape(R, 128)
    out = _scalar_kernel(tuple(offsets), R, len(offsets),
                         _interpret())(Wp, vp)
    return out.reshape(-1)[:n]


@functools.lru_cache(maxsize=None)
def _vector_kernel_streamed(offsets, R, d, group=5, interpret=False):
    """Vector matvec with planes streamed in groups of ``group`` offsets via
    the grid (the (n_off, d, d, n) planes exceed VMEM at production
    sizes; grouping amortizes per-grid-step overhead)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_off = len(offsets)
    n_grp = -(-n_off // group)

    def kern(w_ref, x_ref, o_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        for gi in range(n_grp):

            @pl.when(g == gi)
            def _(gi=gi):
                offs = offsets[gi * group:(gi + 1) * group]
                shifted = {}
                for k, off in enumerate(offs):
                    for b in range(d):
                        shifted[(k, b)] = _flat_roll(x_ref[b], off)
                for a in range(d):
                    acc = o_ref[a]
                    for k in range(len(offs)):
                        for b in range(d):
                            acc = acc + w_ref[k, a, b] * shifted[(k, b)]
                    o_ref[a] = acc

    return pl.pallas_call(
        kern,
        grid=(n_grp,),
        out_shape=jax.ShapeDtypeStruct((d, R, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec((group, d, d, R, 128), lambda g: (g, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, R, 128), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, R, 128), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def apply_vector_pallas(offsets, W, u):
    """(A u)[i, a] = sum_o sum_b W[o, a, b, i] u[i + off_o, b].

    ``W`` (n_off, d, d, n) f32, ``u`` (n, d) f32."""
    n, d = u.shape
    npad = _pad_len(n)
    R = npad // 128
    group = _pick_group(n, d)
    if group == 0:
        raise ValueError(
            f"vector planes for n={n} exceed the VMEM budget; check "
            "vector_fits() before calling"
        )
    n_grp = -(-len(offsets) // group)
    pad_off = n_grp * group - len(offsets)
    Wp = jnp.pad(
        W, ((0, pad_off), (0, 0), (0, 0), (0, npad - n))
    ).reshape(n_grp * group, d, d, R, 128)
    up = jnp.pad(u.T, ((0, 0), (0, npad - n))).reshape(d, R, 128)
    out = _vector_kernel_streamed(
        tuple(offsets), R, d, group, _interpret())(Wp, up)
    return out.reshape(d, -1)[:, :n].T
