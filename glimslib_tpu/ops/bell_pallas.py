"""Pallas TPU kernel: batched dense matvec for the supernode halo-ELL ops.

The unstructured per-CG-iteration hot ops are all batched dense
contractions against streamed operator tables:

  - halo-ELL matvec:        y[b] = W[b] @ xh[b]   (W (nb, s*d, Kh*d))
  - supernode block-Jacobi: z[b] = Binv[b] @ r[b] (Binv (nb, s*d, s*d))
  - scalar halo-ELL matvec: y[b] = W[b] @ xh[b]   (W (nb, s, Kh))

Measured on the v5e at 197k tets, the XLA broadcast-multiply-reduce
formulation round-trips the (nb, M, K) product through HBM instead of
fusing it into the reduction: the 204 MB elasticity matvec costs 1.19 ms
against a ~0.7 ms roofline (table stream + halo row-gather), and the
41 MB supernode Jacobi costs 0.65 ms against ~0.1 ms.  This kernel
streams the table through VMEM grid blocks (Mosaic auto-double-buffers
grid-indexed inputs) and keeps the product in registers, so the only HBM
traffic is one pass over the table.

The halo GATHER stays outside in XLA (Mosaic ``dynamic_gather`` is
single-vreg only — see CLAUDE.md): callers gather xh (nb, K) first, then
call :func:`batched_matvec`.

Gated like the stencil kernels: TPU backend + f32 + GLIMS_PALLAS != 0;
the XLA mul+reduce path remains the fallback and reference
implementation (interpret-mode equivalence in tests/test_bell.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from glimslib_tpu.ops.stencil_pallas import _interpret, pallas_enabled

# VMEM working-set budget: block double-buffering must fit alongside
# compiler scratch (v5e ~16 MB/core)
_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_batch_group(B: int, M: int, K: int) -> int:
    """Block-axis group size: Mosaic requires the second-to-last block dim
    divisible by 8 (BellPlan pads nb to a multiple of 8), so g ∈ {16, 8};
    0 means the kernel cannot run (caller falls back to XLA)."""
    Kp = -(-K // 128) * 128
    Mp = -(-M // 8) * 8
    per = (Mp * Kp + Kp + Mp) * 4 * 2
    for g in (16, 8):
        if B % g == 0 and g * per <= _VMEM_BUDGET:
            return g
    return 0


@functools.lru_cache(maxsize=None)
def _bmv_call(B: int, M: int, K: int, g: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(a_ref, x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jnp.sum(a_ref[...] * x[:, None, :], axis=2)

    return pl.pallas_call(
        kern,
        grid=(B // g,),
        out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
        in_specs=[
            pl.BlockSpec((g, M, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, M), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )


@jax.custom_vjp
def batched_matvec(A, x):
    """y[b] = A[b] @ x[b] with A (B, M, K) f32 streamed once through VMEM,
    x (B, K) f32.  Falls back to the XLA mul+reduce when the kernel is
    gated off or a block does not fit VMEM.

    custom_vjp: pallas_call has no AD rule, and the IFT adjoint
    (solvers/coupled.py step_bwd) VJPs the streamed bell residuals — the
    cotangents are the textbook per-block forms, evaluated as plain XLA
    streams (dA is one outer-product write, dx one mul+reduce pass)."""
    B, M, K = A.shape
    g = _pick_batch_group(B, M, K)
    use = (
        (pallas_enabled() or _interpret())
        and A.dtype == jnp.float32
        and x.dtype == jnp.float32
        and g > 0
    )
    if not use:
        return jnp.sum(A * x[:, None, :], axis=2)
    return _bmv_call(B, M, K, g, _interpret())(A, x)


def _bmv_fwd(A, x):
    return batched_matvec(A, x), (A, x)


def _bmv_bwd(saved, ybar):
    A, x = saved
    dA = ybar[:, :, None] * x[:, None, :]  # (B, M, K)
    dx = jnp.sum(A * ybar[:, :, None], axis=1)  # (B, K)
    return dA.astype(A.dtype), dx.astype(x.dtype)


batched_matvec.defvjp(_bmv_fwd, _bmv_bwd)


# -- block-axis-on-lanes variant (the fast path) -----------------------------
#
# Measured at flagship shapes, every per-block-reduce formulation (XLA
# mul+reduce, the kernel above, in-kernel MXU dots, transposed sublane
# reduces) sits at a ~0.65 ms floor even for 22-41 MB tables — cross-lane
# reduction and (M, K)-minor layouts dominate.  Storing the table as
# (M, K, B) with the BLOCK axis on lanes makes the contraction a pure
# broadcast-multiply-accumulate over time (the K loop), with every lane
# busy and zero cross-lane traffic: per grid step, acc[m, b] += sum_k
# A[m, k, b] * x[k, b].  Callers pre-transpose tables ONCE per simulate
# (models/base.py _augment_theta_with_operators) and pass x already
# transposed to (K, B).

_NBT = 128  # lane-tile chunk of the block axis


def _nbt_for(B: int) -> int:
    """Lane chunk of the block axis: full lane tiles (128) when B divides,
    else the whole axis — but only up to one lane tile (small CPU-test
    plans).  A non-lane-aligned chunk > 128 (e.g. nb=160 at the 24.6k-tet
    size) makes Mosaic allocate lane-padded windows that blow the 16 MB
    scoped-VMEM limit on the real chip; those sizes fall back to the
    grouped :func:`batched_matvec`.  0 if neither works."""
    if B % _NBT == 0:
        return _NBT
    return B if (B % 8 == 0 and B <= _NBT) else 0


def _mt_for(M: int, K: int, nbt: int) -> int:
    """Largest M-tile (multiple of 8, dividing M) whose double-buffered
    working set fits — fewer, larger grid steps amortize the per-step cost
    (measured ~5 us/step: a 108-step 41 MB apply cost 0.65 ms against a
    ~0.1 ms stream floor).  Budgeted on Mosaic's PADDED window sizes
    (sublane dim to 8, lane dim to 128)."""
    kp = -(-K // 8) * 8
    nbtp = -(-nbt // _NBT) * _NBT
    for mt in range(M - M % 8, 0, -8):
        if M % mt:
            continue
        per = (mt * kp * nbtp + kp * nbtp + mt * nbtp) * 4 * 2
        if per <= _VMEM_BUDGET:
            return mt
    return 0


def bmv_T_available(B: int, M: int, K: int) -> bool:
    nbt = _nbt_for(B)
    if nbt == 0 or M % 8 != 0:
        return False
    return _mt_for(M, K, nbt) > 0


# -- chunk-contiguous variant (flagship fast path) ----------------------------
#
# The (M, K, B) layout above DMAs each grid block as mt*K strided 512-byte
# segments (lane chunks of the B-contiguous minor axis) — measured ~320 GB/s
# effective on the 210 MB elasticity table at 197k tets, ~40% of HBM peak.
# Storing the table as (B/128, M, K, 128) makes every grid block ONE
# contiguous region (the (1, mt, K, 128) window spans full trailing axes),
# so the stream runs at full DMA bandwidth.  Same math, same (M, B) output;
# callers pick this layout whenever B is a lane-tile multiple (BellPlan pads
# the block count to 128 at flagship sizes).


def _mt_for_C(M: int, K: int) -> int:
    """Largest M-tile (multiple of 8, dividing M) whose double-buffered
    (mt, K, 128) chunk block fits the VMEM budget (K pads to sublanes)."""
    kp = -(-K // 8) * 8
    for mt in range(M - M % 8, 0, -8):
        if M % mt:
            continue
        per = (mt * kp * 128 + kp * 128 + mt * 128) * 4 * 2
        if per <= _VMEM_BUDGET:
            return mt
    return 0


def bmv_C_available(B: int, M: int, K: int) -> bool:
    return B % 128 == 0 and M % 8 == 0 and _mt_for_C(M, K) > 0


@functools.lru_cache(maxsize=None)
def _bmv_C_call(B: int, M: int, K: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbc = B // 128
    mt = _mt_for_C(M, K)

    def kern(a_ref, x_ref, o_ref):
        x = x_ref[0]  # (K, 128)
        o_ref[...] = jnp.sum(a_ref[0] * x[None, :, :], axis=1)

    # chunk axis OUTER so the x block (index depends only on i) stays
    # resident across the M-tiles of one chunk
    return pl.pallas_call(
        kern,
        grid=(nbc, M // mt),
        out_shape=jax.ShapeDtypeStruct((M, B), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, mt, K, 128), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mt, 128), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _bmv_T_call(B: int, M: int, K: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbt = _nbt_for(B)
    mt = _mt_for(M, K, nbt)

    def kern(a_ref, x_ref, o_ref):
        x = x_ref[...]  # (K, nbt)
        o_ref[...] = jnp.sum(a_ref[...] * x[None, :, :], axis=1)

    # block-chunk axis OUTER so the x block (index depends only on i) is
    # fetched once per chunk (Mosaic skips re-DMA of unchanged blocks)
    return pl.pallas_call(
        kern,
        grid=(B // nbt, M // mt),
        out_shape=jax.ShapeDtypeStruct((M, B), jnp.float32),
        in_specs=[
            pl.BlockSpec((mt, K, nbt), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, nbt), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mt, nbt), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )


@jax.custom_vjp
def batched_matvec_T(AT, xT):
    """y[m, b] = sum_k AT[m, k, b] * xT[k, b] with the table streamed once;
    xT (K, B) f32.  Returns (M, B).  The table layout selects the kernel:
    (M, K, B) -> lane-chunked kernel; (B/128, M, K, 128) -> chunk-contiguous
    kernel (full-bandwidth DMA; see the module notes above _mt_for_C).

    Callers must check :func:`bmv_T_available`/:func:`bmv_C_available`
    (BellPlan pads the block count to a lane-tile multiple at flagship
    sizes).

    custom_vjp: see :func:`batched_matvec` — the flagship IFT adjoint VJPs
    the streamed residuals through these kernels."""
    if AT.ndim == 4:
        nbc, M, K, L = AT.shape
        B = nbc * L
        xc = xT.reshape(K, nbc, L).swapaxes(0, 1)  # (nbc, K, 128)
        return _bmv_C_call(B, M, K, _interpret())(AT, xc)
    M, K, B = AT.shape
    return _bmv_T_call(B, M, K, _interpret())(AT, xT)


def _bmv_T_fwd(AT, xT):
    return batched_matvec_T(AT, xT), (AT, xT)


def _bmv_T_bwd(saved, ybar):
    AT, xT = saved
    if AT.ndim == 4:  # chunk-contiguous (nbc, M, K, 128)
        nbc, M, K, L = AT.shape
        yc = ybar.reshape(M, nbc, L).swapaxes(0, 1)  # (nbc, M, L)
        xc = xT.reshape(K, nbc, L).swapaxes(0, 1)  # (nbc, K, L)
        dAT = yc[:, :, None, :] * xc[:, None, :, :]  # (nbc, M, K, L)
        dx = jnp.sum(AT * yc[:, :, None, :], axis=1)  # (nbc, K, L)
        dxT = dx.swapaxes(0, 1).reshape(K, nbc * L)
        return dAT.astype(AT.dtype), dxT.astype(xT.dtype)
    dAT = ybar[:, None, :] * xT[None, :, :]  # (M, K, B)
    dxT = jnp.sum(AT * ybar[:, None, :], axis=0)  # (K, B)
    return dAT.astype(AT.dtype), dxT.astype(xT.dtype)


batched_matvec_T.defvjp(_bmv_T_fwd, _bmv_T_bwd)
