"""Whole-solve fused PCG kernels for the offset-stencil operators.

Round-2 profiling showed the lattice elasticity CG pays ~127 us/matvec
against a ~26 us HBM floor (planes ~20 MB) plus ~70 us/iteration of XLA
op-dispatch overhead for the preconditioner/dots/axpys — the while_loop
body is ~15 separate HLO ops that each round-trip HBM.  These kernels run
the ENTIRE preconditioned-CG solve inside one ``pallas_call``:

- CG vectors (x, r, p) live in VMEM scratch for the whole solve;
- the weight planes stream from HBM once per iteration through a
  double-buffered DMA pipeline (the only unavoidable traffic — the
  operator is bigger than VMEM);
- the Jacobi / block-Jacobi preconditioner, dot products and axpys are
  in-register VPU ops fused into the same loop.

Per-iteration cost approaches max(plane-bytes / HBM-BW, a few us), vs
~200 us for the XLA op-by-op loop.

Dirichlet masking is folded into the operator *before* the kernel (see
:func:`fold_mask_vector` etc.): the masked CG operator

    A''(v) = m * v + (1-m) * A((1-m) * v)

is itself an offset-stencil operator with planes
``W''[o,a,b,i] = (1-m[i,a]) W[o,a,b,i] (1-m[i+off_o,b])`` plus +1 on the
zero-offset diagonal of masked dofs — so the kernel needs no mask arrays
and applies no masking logic, and the XLA paths stay the reference
implementation (tests compare against them in interpret mode).

Replaces PETSc KSP for the lattice fast path (reference SNES-internal
Krylov solves, simulation_base.py:277-312); semantics identical to
solvers/cg.py:pcg (same update order, same stopping rule).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from glimslib_tpu.ops.stencil_pallas import (
    _TILE,
    _flat_roll,
    _interpret,
    _pad_len,
    pallas_enabled,
)

# VMEM budget for fits checks: 16 MB/core on v5e, leave compiler headroom
_VMEM_BUDGET = 14 * 1024 * 1024


def fused_cg_enabled() -> bool:
    if os.environ.get("GLIMS_PALLAS_CG", "1") == "0":
        return False
    return pallas_enabled() or _interpret()


# -- mask folding (jax-level, differentiable, runs per theta / per Newton) --


def fold_mask_scalar(offsets, W, mask):
    """Masked scalar stencil planes: W''[o,i] = f[i] W[o,i] f[i+off] with
    f = 1-mask, plus +1 on the zero-offset plane at masked nodes."""
    f = 1.0 - mask.astype(W.dtype)
    planes = []
    for o, off in enumerate(offsets):
        fs = f if off == 0 else jnp.roll(f, -off)
        planes.append(W[o] * f * fs)
    Wm = jnp.stack(planes)
    o0 = list(offsets).index(0)
    return Wm.at[o0].add(mask.astype(W.dtype))


def fold_mask_vector(offsets, W, mask):
    """Masked vector stencil planes (per-dof mask (n, d), W (n_off,d,d,n)):
    W''[o,a,b,i] = f[i,a] W[o,a,b,i] f[i+off,b], +1 on (o0,a,a) at masked
    dofs."""
    d = W.shape[1]
    f = 1.0 - mask.astype(W.dtype)  # (n, d)
    fT = f.T  # (d, n)
    planes = []
    for o, off in enumerate(offsets):
        fsT = fT if off == 0 else jnp.roll(fT, -off, axis=1)
        planes.append(W[o] * fT[:, None, :] * fsT[None, :, :])
    Wm = jnp.stack(planes)
    o0 = list(offsets).index(0)
    mT = mask.astype(W.dtype).T  # (d, n)
    eye = jnp.eye(d, dtype=W.dtype)
    return Wm.at[o0].add(eye[:, :, None] * mT[None, :, :])


def fold_mask_binv(Binv, mask):
    """Masked block-Jacobi inverse (Binv (d,d,n), mask (n,d)):
    B''[a,b,i] = f[i,a] Binv[a,b,i] f[i,b], +1 on (a,a) at masked dofs."""
    d = Binv.shape[0]
    f = (1.0 - mask.astype(Binv.dtype)).T  # (d, n)
    Bm = Binv * f[:, None, :] * f[None, :, :]
    mT = mask.astype(Binv.dtype).T
    eye = jnp.eye(d, dtype=Binv.dtype)
    return Bm + eye[:, :, None] * mT[None, :, :]


def fold_mask_invdiag(diag, mask):
    """Masked inverse diagonal: 1 on masked dofs, 1/diag elsewhere."""
    return jnp.where(mask, jnp.ones_like(diag), 1.0 / diag)


# -- tiling glue -------------------------------------------------------------


def tile_scalar_planes(W, n):
    """(n_off, n) -> (n_off, R, 128) zero-padded f32."""
    npad = _pad_len(n)
    return jnp.pad(W.astype(jnp.float32), ((0, 0), (0, npad - n))).reshape(
        W.shape[0], npad // 128, 128
    )


def tile_vector_planes(W, n):
    """(n_off, d, d, n) -> (n_off, d, d, R, 128) zero-padded f32."""
    npad = _pad_len(n)
    n_off, d = W.shape[0], W.shape[1]
    return jnp.pad(
        W.astype(jnp.float32), ((0, 0), (0, 0), (0, 0), (0, npad - n))
    ).reshape(n_off, d, d, npad // 128, 128)


def _sym_pairs(d):
    """Upper-triangle (a, b) order for the packed symmetric block inverse."""
    return [(a, b) for a in range(d) for b in range(a, d)]


def tile_binv(Binv, n):
    """(d, d, n) -> packed symmetric (d(d+1)/2, R, 128).

    The block-Jacobi inverse is symmetric (inverses of symmetric SPD node
    blocks; mask folding preserves symmetry), so only the upper triangle is
    stored.  The saved d(d-1)/2 planes are what make the fused vector CG
    fit VMEM at the N=48 lattice (117k nodes)."""
    npad = _pad_len(n)
    d = Binv.shape[0]
    rows = jnp.stack([Binv[a, b] for a, b in _sym_pairs(d)])
    return jnp.pad(rows.astype(jnp.float32), ((0, 0), (0, npad - n))
                   ).reshape(len(_sym_pairs(d)), npad // 128, 128)


def tile_field(x, n):
    """(n,) -> (R, 128) or (n, d) -> (d, R, 128)."""
    npad = _pad_len(n)
    if x.ndim == 1:
        return jnp.pad(x.astype(jnp.float32), (0, npad - n)).reshape(
            npad // 128, 128
        )
    return jnp.pad(x.T.astype(jnp.float32), ((0, 0), (0, npad - n))).reshape(
        x.shape[1], npad // 128, 128
    )


def untile_field(xt, n, d=None):
    if d is None:
        return xt.reshape(-1)[:n]
    return xt.reshape(d, -1)[:, :n].T


# -- fits checks -------------------------------------------------------------


def _pick_rc(R, chunk_elems_per_row, fixed_bytes):
    """Rows-per-DMA-chunk from {R, R/2, ..., R/32} (R is a multiple of 8)
    such that fixed VMEM + double-buffered chunks fit the budget; 0 if
    none fits."""
    for div in (1, 2, 4, 8, 16, 32):
        if R % div:
            continue
        rc = R // div
        if fixed_bytes + 2 * chunk_elems_per_row * rc * 128 * 4 <= _VMEM_BUDGET:
            return rc
    return 0


def scalar_cg_fits(n_off, n):
    R = _pad_len(n) // 128
    vec = R * 128 * 4
    fixed = 7 * vec  # x, r, p, acc refs + b + invd + live temps
    return _pick_rc(R, 1, fixed)


def vector_cg_fits(n_off, n, d):
    R = _pad_len(n) // 128
    vec = d * R * 128 * 4
    # vectors + packed symmetric Binv (d(d+1)/2 planes)
    fixed = 7 * vec + (d * (d + 1) // 2) * R * 128 * 4
    return _pick_rc(R, d * d, fixed)


# -- kernels -----------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _cg_scalar_kernel(offsets, R, Rc, maxiter, rtol, atol, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_off = len(offsets)
    n_rc = R // Rc
    chunks = [(o, rc) for o in range(n_off) for rc in range(n_rc)]

    def kern(w_hbm, invd_ref, b_ref, x_ref, it_ref, rn_ref,
             r_ref, p_ref, acc_ref, wbuf_ref, sem):
        def chunk_dma(idx, slot):
            o, rc = chunks[idx]
            # DMA indices must trace as i32: under jax x64 a bare Python int
            # becomes an i64 constant, which Mosaic's memref_slice rejects
            o = jnp.asarray(o, jnp.int32)
            slot = jnp.asarray(slot, jnp.int32)
            return pltpu.make_async_copy(
                w_hbm.at[o, pl.ds(jnp.asarray(rc * Rc, jnp.int32), Rc), :],
                wbuf_ref.at[slot],
                sem.at[slot],
            )

        def matvec():
            """acc_ref <- A(p_ref), planes streamed with double buffering."""
            chunk_dma(0, 0).start()
            v = p_ref[:]
            sh = None
            for idx, (o, rc) in enumerate(chunks):
                if idx + 1 < len(chunks):
                    chunk_dma(idx + 1, (idx + 1) % 2).start()
                if rc == 0:
                    sh = _flat_roll(v, offsets[o])
                chunk_dma(idx, idx % 2).wait()
                w = wbuf_ref[idx % 2]
                rows = pl.ds(rc * Rc, Rc)
                contrib = w * jax.lax.slice(
                    sh, (rc * Rc, 0), ((rc + 1) * Rc, 128)
                )
                if o == 0:
                    acc_ref[rows, :] = contrib
                else:
                    acc_ref[rows, :] = acc_ref[rows, :] + contrib

        invd = invd_ref[:]
        b = b_ref[:]
        bb = jnp.sum(b * b)
        tol2 = jnp.maximum(rtol * rtol * bb, atol * atol)
        x_ref[:] = jnp.zeros_like(b)
        r_ref[:] = b
        z0 = invd * b
        p_ref[:] = z0
        rz0 = jnp.sum(b * z0)

        def cond(carry):
            k, rz, rr = carry
            return jnp.logical_and(k < maxiter, rr > tol2)

        def body(carry):
            k, rz, rr = carry
            matvec()
            Ap = acc_ref[:]
            p = p_ref[:]
            pAp = jnp.sum(p * Ap)
            alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
            x_ref[:] = x_ref[:] + alpha * p
            r = r_ref[:] - alpha * Ap
            r_ref[:] = r
            z = invd * r
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.where(rz == 0, 1.0, rz)
            p_ref[:] = z + beta * p
            return (k + 1, rz_new, jnp.sum(r * r))

        k, rz, rr = jax.lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), rz0, bb)
        )
        it_ref[0, 0] = k
        rn_ref[0, 0] = jnp.sqrt(rr)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((R, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((2, Rc, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _cg_vector_kernel(offsets, R, d, Rc, maxiter, rtol, atol, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_off = len(offsets)
    n_rc = R // Rc
    chunks = [(o, rc) for o in range(n_off) for rc in range(n_rc)]

    def kern(w_hbm, binv_ref, b_ref, x_ref, it_ref, rn_ref,
             r_ref, p_ref, acc_ref, wbuf_ref, sem):
        def chunk_dma(idx, slot):
            o, rc = chunks[idx]
            # i32 casts: Python ints trace to i64 under jax x64 (see
            # _cg_scalar_kernel.chunk_dma)
            o = jnp.asarray(o, jnp.int32)
            slot = jnp.asarray(slot, jnp.int32)
            return pltpu.make_async_copy(
                w_hbm.at[o, :, :, pl.ds(jnp.asarray(rc * Rc, jnp.int32), Rc), :],
                wbuf_ref.at[slot],
                sem.at[slot],
            )

        def matvec():
            chunk_dma(0, 0).start()
            v = [p_ref[bb_] for bb_ in range(d)]
            sh = None
            for idx, (o, rc) in enumerate(chunks):
                if idx + 1 < len(chunks):
                    chunk_dma(idx + 1, (idx + 1) % 2).start()
                if rc == 0:
                    sh = [_flat_roll(v[bb_], offsets[o]) for bb_ in range(d)]
                chunk_dma(idx, idx % 2).wait()
                w = wbuf_ref[idx % 2]  # (d, d, Rc, 128)
                rows = pl.ds(rc * Rc, Rc)
                for a in range(d):
                    cur = None
                    for bb_ in range(d):
                        t = w[a, bb_] * jax.lax.slice(
                            sh[bb_], (rc * Rc, 0), ((rc + 1) * Rc, 128)
                        )
                        cur = t if cur is None else cur + t
                    if o == 0:
                        acc_ref[a, rows, :] = cur
                    else:
                        acc_ref[a, rows, :] = acc_ref[a, rows, :] + cur

        pair_idx = {p: i for i, p in enumerate(_sym_pairs(d))}

        def precond(r):
            """block-Jacobi: z[a] = sum_b Binv[a,b] * r[b]; Binv packed
            symmetric (upper-triangle plane order, see tile_binv)."""
            out = []
            for a in range(d):
                cur = None
                for bb_ in range(d):
                    i = pair_idx[(a, bb_) if a <= bb_ else (bb_, a)]
                    t = binv_ref[i] * r[bb_]
                    cur = t if cur is None else cur + t
                out.append(cur)
            return jnp.stack(out)

        b = b_ref[:]
        bb = jnp.sum(b * b)
        tol2 = jnp.maximum(rtol * rtol * bb, atol * atol)
        x_ref[:] = jnp.zeros_like(b)
        r_ref[:] = b
        z0 = precond(b)
        p_ref[:] = z0
        rz0 = jnp.sum(b * z0)

        def cond(carry):
            k, rz, rr = carry
            return jnp.logical_and(k < maxiter, rr > tol2)

        def body(carry):
            k, rz, rr = carry
            matvec()
            Ap = acc_ref[:]
            p = p_ref[:]
            pAp = jnp.sum(p * Ap)
            alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
            x_ref[:] = x_ref[:] + alpha * p
            r = r_ref[:] - alpha * Ap
            r_ref[:] = r
            z = precond(r)
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.where(rz == 0, 1.0, rz)
            p_ref[:] = z + beta * p
            return (k + 1, rz_new, jnp.sum(r * r))

        k, rz, rr = jax.lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), rz0, bb)
        )
        it_ref[0, 0] = k
        rn_ref[0, 0] = jnp.sqrt(rr)

    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((d, R, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, R, 128), jnp.float32),
            pltpu.VMEM((d, R, 128), jnp.float32),
            pltpu.VMEM((d, R, 128), jnp.float32),
            pltpu.VMEM((2, d, d, Rc, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )


# -- public solves -----------------------------------------------------------


def cg_scalar(offsets, Wt, invd_t, b, rtol, atol, maxiter, n):
    """Solve A'' x = b with Jacobi-PCG fully in-kernel.

    ``Wt``: mask-folded tiled planes (n_off, R, 128); ``invd_t``: masked
    inverse diagonal (R, 128) — both from the fold_mask_* / tile_* helpers.
    ``b`` natural (n,).  Returns (x (n,), info) like solvers.cg.pcg."""
    R = Wt.shape[1]
    Rc = scalar_cg_fits(len(offsets), n)
    bt = tile_field(b, n)
    xt, it, rn = _cg_scalar_kernel(
        tuple(offsets), R, Rc, int(maxiter), float(rtol), float(atol),
        _interpret(),
    )(Wt, invd_t, bt)
    return untile_field(xt, n), {"iters": it[0, 0], "resnorm": rn[0, 0]}


def cg_vector(offsets, Wt, Binv_t, b, rtol, atol, maxiter, n):
    """Solve A'' x = b with block-Jacobi PCG fully in-kernel.

    ``Wt``: mask-folded tiled planes (n_off, d, d, R, 128); ``Binv_t``:
    masked block inverse (d, d, R, 128); ``b`` natural (n, d)."""
    d = Wt.shape[1]
    R = Wt.shape[3]
    Rc = vector_cg_fits(len(offsets), n, d)
    bt = tile_field(b, n)
    xt, it, rn = _cg_vector_kernel(
        tuple(offsets), R, d, Rc, int(maxiter), float(rtol), float(atol),
        _interpret(),
    )(Wt, Binv_t, bt)
    return untile_field(xt, n, d), {"iters": it[0, 0], "resnorm": rn[0, 0]}
