"""The coupled implicit-Euler step: forward Newton solves + IFT adjoint.

This replaces, in one place, the reference's
``NonlinearVariationalSolver('snes')`` per-timestep solve
(simulation_tumor_growth.py:126-140, driven from simulation_base.py:277-312)
*and* the dolfin-adjoint taping of those solves (SURVEY.md §2.2).

Structure exploited: the monolithic Jacobian of the coupled system

    R_u(u, c; θ) = 0   (linear elasticity + growth-strain coupling)
    R_c(c, c_prev; θ) = 0   (implicit-Euler Fisher-KPP)

is block-triangular — R_c does not depend on u.  So one Newton solve of the
monolithic system is exactly: (1) Newton-CG on the scalar c-block (SPD
Jacobian M + dt·D·K − dt·ρ·(M − 2·W(c))), then (2) a single SPD CG solve of
the elasticity block with c known.  This is algebraically identical to the
reference's monolithic SNES Newton with exact linear solves, at a fraction
of the cost (two SPD solves instead of one nonsymmetric system).

Dirichlet conditions are enforced by masked projection: the operator acts as
identity on constrained dofs and the initial iterate carries the boundary
values, so CG never moves them.

The backward pass is the implicit-function-theorem adjoint, replacing
dolfin-adjoint's tape replay (image_based_optimization.py:700-733): given
cotangents (ū, c̄), solve

    A_uuᵀ λ_u = ū                    (elasticity block, SPD -> CG)
    J_ccᵀ λ_c = c̄ − (∂R_u/∂c)ᵀ λ_u   (c-block, symmetric -> CG)

then cotangents of parameters and of c_prev via VJPs of the residuals:
θ̄ = −(∂R/∂θ)ᵀλ,  c̄_prev = −(∂R_c/∂c_prev)ᵀ λ_c.  This is exact for the
*solved* nonlinear system (independent of the Newton iteration path) and
uses O(1) memory per step.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from glimslib_tpu.solvers.cg import estimate_lmax, make_chebyshev_precond, pcg


class StepConfig(NamedTuple):
    newton_rtol: float = 1e-9
    newton_atol: float = 1e-12
    newton_maxiter: int = 25
    cg_rtol: float = 1e-12
    cg_atol: float = 0.0
    cg_maxiter: int = 2000
    # Chebyshev polynomial preconditioning degree (solvers/cg.py
    # make_chebyshev_precond) composed with the Jacobi/block-Jacobi inner
    # preconditioner; 0/1 = inner preconditioner alone.  Cuts CG iteration
    # counts ~degree-fold at degree-1 extra matvecs per iteration — a net
    # win when per-iteration loop overhead dominates (small problems) or
    # when dots/collectives are the bottleneck (sharded runs).
    precond_degree: int = 0
    # Mixed-precision iterative refinement (SURVEY §7 hard part #1): keep
    # the CG/Newton inner solves in the working dtype (f32 on TPU) but
    # evaluate Newton residuals — and one extra elasticity correction — in
    # f64.  The f32 Jacobian only steers the iteration; the converged state
    # satisfies the f64 residual to working-storage precision, recovering
    # ~1e-7 accuracy at a few emulated-f64 residual evals per step.
    # Requires jax_enable_x64; no effect when the working dtype is f64.
    refine_f64: bool = False
    # Relative tolerance of the refinement CORRECTION solve (the f64-defect
    # elasticity CG under refine_f64).  Classic iterative refinement only
    # needs the defect reduced a couple of digits per pass: the defect rhs
    # is already ~cg_rtol of the original load, so re-solving it to
    # cg_rtol (the pre-round-3 behavior) spends a full CG's iterations to
    # push the residual ~1e-14 relative — far below the f32 working-dtype
    # floor that caps the final accuracy anyway.  1e-2 reaches the
    # refinement fixed point (~kappa * eps_f32^2) in the same single pass
    # at a fraction of the iterations.  0.0 falls back to cg_rtol.
    refine_cg_rtol: float = 1e-2
    # Inexact-Newton forcing for the concentration block's INNER CG
    # solves: 0.0 (default) uses cg_rtol; a larger value (e.g. 1e-3)
    # loosens only the c-block linear solves.  Sound because Newton
    # measures (and converges on) the exact nonlinear residual to
    # newton_rtol/atol regardless of inner-solve accuracy — a loose step
    # only changes the contraction rate (Dembo-Eisenstat-Steihaug), never
    # the converged state.  The elasticity block keeps cg_rtol: that
    # solve is LINEAR, so its tolerance directly bounds solution error.
    rd_cg_rtol: float = 0.0
    # Modified Newton (chord method) for the concentration block on
    # ASSEMBLED-operator paths: freeze the rd Jacobian at the step's
    # start instead of re-assembling it every Newton iteration.  Newton
    # still measures (and converges on) the exact residual, so the
    # solution is unchanged — only the contraction rate differs, and the
    # per-step Jacobian drift is O(dt*rho*(c - c_prev)), tiny for the
    # reference's time steps.  Saves one supernode halo-ELL assembly
    # (~55 ms at 197k tets, 30% of the step) per additional Newton
    # iteration.  Ignored on matrix-free (jvp) and fused-lattice paths
    # where the per-iteration Jacobian is cheap.
    rd_modified_newton: bool = True


def _masked(mask, bc_values, free_residual):
    """Residual with Dirichlet rows replaced by (x - g)."""

    def wrap(x, *args):
        r = free_residual(x, *args)
        return jnp.where(mask, x - bc_values, r)

    return wrap


def _masked_operator(resid, x, mask):
    """SPD operator: identity on masked dofs, P J P elsewhere."""

    def A(v):
        v_free = jnp.where(mask, 0.0, v)
        jv = jax.jvp(resid, (x,), (v_free,))[1]
        return jnp.where(mask, v, jv)

    return A


def make_step(
    rd_residual: Callable,  # (c, c_prev, theta, t) -> (n_c,)
    el_residual: Callable,  # (u, c, theta, t) -> (n_u, d)
    rd_diag: Callable,  # (theta) -> (n_c,)
    el_diag: Callable,  # (theta) -> (n_u, d)
    mask_c,
    mask_u,
    bc_values_c: Callable,  # (t) -> (n_c,)
    bc_values_u: Callable,  # (t) -> (n_u, d)
    config: StepConfig = StepConfig(),
    rd_jacobian: Callable = None,  # (theta, c) -> callable(v) = J_cc v
    el_operator: Callable = None,  # (theta) -> callable(u) = A_uu u
    el_precond: Callable = None,  # (theta) -> callable(r) ~ A_uu^{-1} r
    rd_precond: Callable = None,  # (theta) -> callable(r) ~ J_cc^{-1} r
    rd_residual_hi: Callable = None,  # f64-kernel residuals for refine_f64
    el_residual_hi: Callable = None,
    rd_cg: Callable = None,  # (theta, c, rhs) -> (dc, info): fused in-kernel
    el_cg: Callable = None,  # (theta, rhs) -> (du, info): PCG solves
    rd_jacobian_chord: Callable = None,  # cheaper frozen-Jacobian source
):
    """Build the differentiable coupled step:

        step(theta, u_prev, c_prev, t[, guess]) -> (u, c, converged, n_newton)

    ``guess`` (optional): (u_guess, c_guess) extrapolated warm starts for
    the two solves (the scan body passes 2x_k - x_{k-1}).  A warm start
    never changes the converged state — only iteration counts — because
    the stopping tolerances stay ANCHORED at the unextrapolated points
    (||r(u_prev)||, ||r(c_prev)||): a relative tolerance measured at a
    better start would tighten the absolute target and give the warm
    start's savings right back.  Costs one extra residual evaluation per
    block; gated to the assembled-operator paths (cheap streamed
    residuals) by the caller, and ignored when the fused whole-solve
    kernels own the stopping rule.  Gradients: the converged state does
    not depend on the guess, so its IFT cotangent is exactly zero.

    When ``rd_jacobian``/``el_operator`` are given (the assembled
    offset-stencil fast path, ops/stencil.py), CG applies those operators
    instead of jvp-ing the gather-based residuals — identical linear
    systems, streaming memory access.

    When ``rd_cg``/``el_cg`` are given (the fused whole-solve Pallas
    kernels, ops/pallas_cg.py — TPU f32 lattice path only), they REPLACE
    the ``pcg`` solves entirely: same linear systems, same stopping rule,
    but the CG loop runs in a single kernel with VMEM-resident vectors."""
    cfg = config
    # detect the el_cg rtol knob ONCE (advisor r3: a try/except TypeError at
    # the call site would also swallow genuine TypeErrors raised inside an
    # rtol-accepting implementation)
    if el_cg is not None:
        import inspect

        try:
            _el_cg_params = inspect.signature(el_cg).parameters
        except (TypeError, ValueError):  # builtins/partials without sigs
            _el_cg_params = {}
        el_cg_has_rtol = "rtol" in _el_cg_params
    else:
        el_cg_has_rtol = False

    def _op_masked(raw_op, mask):
        def A(v):
            return jnp.where(mask, v, raw_op(jnp.where(mask, 0.0, v)))

        return A

    def _solve_forward(theta, u_prev, c_prev, t, guess=None, anchor_c=None):
        gc = bc_values_c(t)
        gu = bc_values_u(t)
        # warm starts only where pcg owns the stopping rule (the fused
        # whole-solve kernels would measure rtol against the warm rhs)
        warm = guess is not None and el_cg is None and rd_cg is None
        # ``anchor_c``: the caller-supplied ||r_c(c_prev)|| (the scan body
        # computes it ALGEBRAICALLY from the previous step — R(c, c) =
        # r_final - M (c - c_prev_old), with ||r_final|| <= ftol_prev a
        # negligible perturbation of an order-of-magnitude tolerance — at
        # the cost of one streamed mass matvec instead of a full residual
        # evaluation, ~4.8 ms at 197k tets).  Only meaningful with warm
        # starts (the unwarm path needs the r0 VECTOR anyway).
        use_anchor_c = warm and anchor_c is not None

        # mixed-precision refinement: f64 residual evaluation around the
        # f32 inner solves (static switch; no-op when x64 is unavailable
        # or the working dtype is already f64)
        use_refine = (
            cfg.refine_f64
            and jax.config.read("jax_enable_x64")
            and c_prev.dtype != jnp.float64
        )
        if use_refine:
            f64 = jnp.float64
            theta_hi = jax.tree_util.tree_map(
                lambda a: a.astype(f64)
                if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
                theta,
            )
            rd_hi = rd_residual_hi or rd_residual
            el_hi = el_residual_hi or el_residual

            def resid_c_hi(c):
                r = rd_hi(c.astype(f64), c_prev.astype(f64), theta_hi, t)
                return jnp.where(mask_c, (c - gc).astype(f64), r)

            def resid_u_hi(u, c):
                r = el_hi(u.astype(f64), c.astype(f64), theta_hi, t)
                return jnp.where(mask_u, (u - gu).astype(f64), r)

        # ---- c-block: Newton-CG --------------------------------------
        # resid_c: working-dtype residual — also the Jacobian source (jvp
        # stays in f32).  resid_c_eval: what Newton measures/corrects
        # against — the f64 residual (downcast) under refinement.
        resid_c = _masked(mask_c, gc, lambda c: rd_residual(c, c_prev, theta, t))
        if use_refine:
            resid_c_eval = lambda c: resid_c_hi(c).astype(c_prev.dtype)
        else:
            resid_c_eval = resid_c
        if rd_precond is not None:
            Mc_raw = rd_precond(theta)
            Mc = lambda r: jnp.where(
                mask_c, r, Mc_raw(jnp.where(mask_c, 0.0, r))
            )
        else:
            diag_c = jnp.where(mask_c, 1.0, rd_diag(theta))
            Mc = lambda r: r / diag_c
        c0 = jnp.where(mask_c, gc, c_prev)
        if cfg.precond_degree > 1:
            # spectral bound for the Chebyshev polynomial: precomputed in
            # theta when available (_augment_theta_with_operators — the
            # bound is step-invariant up to the safety factor), else
            # estimated once per step at c0
            if isinstance(theta, dict) and "_lmax_c" in theta:
                lmax_c = theta["_lmax_c"]
            else:
                if rd_jacobian is not None:
                    A0 = _op_masked(rd_jacobian(theta, c0), mask_c)
                else:
                    A0 = _masked_operator(resid_c, c0, mask_c)
                lmax_c = estimate_lmax(A0, Mc, c0.shape, c0.dtype)
        else:
            lmax_c = None

        if use_anchor_c:
            f0 = jnp.asarray(anchor_c, c_prev.dtype)
        else:
            r0 = resid_c_eval(c0)
            f0 = jnp.sqrt(jnp.sum(r0 * r0))
        ftol = jnp.maximum(cfg.newton_rtol * f0, cfg.newton_atol)
        if warm:
            # start Newton at the extrapolated guess; ftol stays anchored
            # at f0 = ||r(c_prev)|| above (see make_step docstring)
            c0 = jnp.where(mask_c, gc, guess[1])
            r0 = resid_c_eval(c0)
            f0 = jnp.sqrt(jnp.sum(r0 * r0))

        # modified Newton: one Jacobian assembly per step, hoisted out of
        # the Newton loop (see StepConfig.rd_modified_newton).  Accuracy
        # mode (refine_f64) keeps the exact per-iteration Jacobian: the
        # chord method lands the final iterate just under ftol instead of
        # quadratically below it, which costs the refined run its margin.
        freeze_jac = (
            cfg.rd_modified_newton
            and not use_refine
            and rd_jacobian is not None
            and rd_cg is None
        )
        # the frozen operator may come from a cheaper approximate source
        # (e.g. the lumped-logistic chord operator, ops/bell.py
        # build_bell_rd_wc_lumped) — Newton's convergence test stays on the
        # exact residual and the IFT adjoint (step_bwd) keeps the exact
        # rd_jacobian, so converged states and gradients are unchanged
        chord_src = rd_jacobian_chord or rd_jacobian
        A_frozen = (
            _op_masked(chord_src(theta, c0), mask_c) if freeze_jac else None
        )

        def cond(state):
            c, r, fnorm, k, bad = state
            return jnp.logical_and(
                jnp.logical_and(k < cfg.newton_maxiter, fnorm > ftol),
                jnp.logical_not(bad),
            )

        def body(state):
            # the current residual is carried: one residual eval per iter
            c, r, fnorm, k, bad = state
            if freeze_jac:
                A = A_frozen
            elif rd_jacobian is not None:
                A = _op_masked(rd_jacobian(theta, c), mask_c)
            else:
                A = _masked_operator(resid_c, c, mask_c)
            if cfg.precond_degree > 1:
                Mc_solve = make_chebyshev_precond(
                    A, Mc, lmax_c, cfg.precond_degree
                )
            else:
                Mc_solve = Mc
            rhs = jnp.where(mask_c, 0.0, -r)
            if rd_cg is not None:
                dc, _ = rd_cg(theta, c, rhs)
            else:
                dc, _ = pcg(A, rhs, M=Mc_solve,
                            rtol=cfg.rd_cg_rtol or cfg.cg_rtol,
                            atol=cfg.cg_atol, maxiter=cfg.cg_maxiter)
            c_new = c + dc
            r_new = resid_c_eval(c_new)
            fn_new = jnp.sqrt(jnp.sum(r_new**2))
            is_bad = jnp.logical_or(~jnp.isfinite(fn_new), fn_new > 1e10 * (f0 + 1.0))
            return (
                jnp.where(is_bad, c, c_new),
                jnp.where(is_bad, r, r_new),
                jnp.where(is_bad, fnorm, fn_new),
                k + 1,
                is_bad,
            )

        c, _, fnorm, k, bad = jax.lax.while_loop(
            cond, body, (c0, r0, f0, 0, jnp.asarray(False))
        )
        conv_c = jnp.logical_and(fnorm <= jnp.maximum(ftol, cfg.newton_atol), ~bad)

        # ---- u-block: single CG (linear), warm-started from the previous
        # step's displacement (same solution, far fewer iterations) --------
        resid_u = _masked(mask_u, gu, lambda u: el_residual(u, c, theta, t))
        if el_precond is not None:
            Mu_raw = el_precond(theta)
            Mu = lambda r: jnp.where(mask_u, r, Mu_raw(jnp.where(mask_u, 0.0, r)))
        else:
            diag_u = jnp.where(mask_u, 1.0, el_diag(theta))
            Mu = lambda r: r / diag_u
        u0 = jnp.where(mask_u, gu, u_prev)
        if use_refine:
            ru = resid_u_hi(u0, c).astype(u_prev.dtype)
        else:
            ru = resid_u(u0)
        if warm:
            # CG tolerance anchored at ||r(u_prev)||; iterate from the
            # extrapolated guess (same converged u, fewer iterations)
            anchor_u = jnp.sqrt(jnp.sum(jnp.where(mask_u, 0.0, ru) ** 2))
            u0 = jnp.where(mask_u, gu, guess[0])
            if use_refine:
                ru = resid_u_hi(u0, c).astype(u_prev.dtype)
            else:
                ru = resid_u(u0)
        if el_operator is not None:
            Au = _op_masked(el_operator(theta), mask_u)
        else:
            Au = _masked_operator(resid_u, u0, mask_u)
        if cfg.precond_degree > 1:
            if isinstance(theta, dict) and "_lmax_u" in theta:
                lmax_u = theta["_lmax_u"]
            else:
                lmax_u = estimate_lmax(Au, Mu, u0.shape, u0.dtype)
            Mu_solve = make_chebyshev_precond(Au, Mu, lmax_u, cfg.precond_degree)
        else:
            Mu_solve = Mu
        rhs_u = jnp.where(mask_u, 0.0, -ru)
        if el_cg is not None:
            du, info_u = el_cg(theta, rhs_u)
        elif warm:
            du, info_u = pcg(
                Au,
                rhs_u,
                M=Mu_solve,
                rtol=0.0,
                atol=jnp.maximum(cfg.cg_rtol * anchor_u, cfg.cg_atol),
                maxiter=cfg.cg_maxiter,
            )
        else:
            du, info_u = pcg(
                Au,
                rhs_u,
                M=Mu_solve,
                rtol=cfg.cg_rtol,
                atol=cfg.cg_atol,
                maxiter=cfg.cg_maxiter,
            )
        u = u0 + du
        # A stalled elasticity CG (maxiter without reaching tolerance) must
        # freeze the trajectory like a failed Newton does — mirror pcg's own
        # stopping test, plus finiteness (advisor finding r1).
        rhs_norm = anchor_u if warm else jnp.sqrt(jnp.sum(rhs_u * rhs_u))
        tol_u = jnp.maximum(cfg.cg_rtol * rhs_norm, cfg.cg_atol)
        conv_u = jnp.logical_and(
            jnp.isfinite(info_u["resnorm"]), info_u["resnorm"] <= tol_u
        )
        if use_refine:
            # one f64-residual correction pass (classic iterative
            # refinement: f32 operator solves the f64 defect equation)
            ru2 = resid_u_hi(u, c).astype(u_prev.dtype)
            rhs_u2 = jnp.where(mask_u, 0.0, -ru2)
            if el_cg is not None:
                if el_cg_has_rtol:
                    du2, _ = el_cg(
                        theta, rhs_u2,
                        rtol=cfg.refine_cg_rtol or cfg.cg_rtol,
                    )
                else:  # fused kernels without an rtol knob
                    du2, _ = el_cg(theta, rhs_u2)
            else:
                du2, _ = pcg(
                    Au, rhs_u2, M=Mu_solve,
                    rtol=cfg.refine_cg_rtol or cfg.cg_rtol,
                    atol=cfg.cg_atol,
                    maxiter=cfg.cg_maxiter,
                )
            u = u + du2
            conv_u = jnp.logical_and(conv_u, jnp.isfinite(jnp.sum(du2)))
        return u, c, jnp.logical_and(conv_c, conv_u), k

    @jax.custom_vjp
    def step(theta, u_prev, c_prev, t):
        return _solve_forward(theta, u_prev, c_prev, t)

    def step_fwd(theta, u_prev, c_prev, t):
        out = _solve_forward(theta, u_prev, c_prev, t)
        u, c, conv, k = out
        return out, (theta, u_prev, c_prev, t, u, c)

    def step_bwd(saved, cot):
        theta, u_prev, c_prev, t, u, c = saved
        u_bar, c_bar, _, _ = cot
        gc = bc_values_c(t)
        gu = bc_values_u(t)
        resid_c = _masked(mask_c, gc, lambda cc, cp, th: rd_residual(cc, cp, th, t))
        resid_u = _masked(mask_u, gu, lambda uu, cc, th: el_residual(uu, cc, th, t))

        if el_precond is not None:
            Mu_raw = el_precond(theta)
            Mu = lambda r: jnp.where(mask_u, r, Mu_raw(jnp.where(mask_u, 0.0, r)))
        else:
            diag_u = jnp.where(mask_u, 1.0, el_diag(theta))
            Mu = lambda r: r / diag_u

        # adjoint elasticity solve: A_uu^T lam_u = u_bar (A symmetric)
        if el_operator is not None:
            Au = _op_masked(el_operator(theta), mask_u)
        else:
            Au = _masked_operator(lambda uu: resid_u(uu, c, theta), u, mask_u)
        if cfg.precond_degree > 1:
            if isinstance(theta, dict) and "_lmax_u" in theta:
                lmax_u = theta["_lmax_u"]
            else:
                lmax_u = estimate_lmax(Au, Mu, u.shape, u.dtype)
            Mu = make_chebyshev_precond(Au, Mu, lmax_u, cfg.precond_degree)
        if el_cg is not None:
            lam_u, _ = el_cg(theta, jnp.where(mask_u, 0.0, u_bar))
        else:
            lam_u, _ = pcg(
                Au, jnp.where(mask_u, 0.0, u_bar), M=Mu,
                rtol=cfg.cg_rtol, atol=cfg.cg_atol, maxiter=cfg.cg_maxiter,
            )
        # rhs for c adjoint: c_bar - (dR_u/dc)^T lam_u
        _, vjp_u = jax.vjp(lambda cc, th: resid_u(u, cc, th), c, theta)
        dRu_dc_T_lam, theta_bar_u = vjp_u(lam_u)
        rhs_c = c_bar - dRu_dc_T_lam
        if rd_jacobian is not None:
            Ac = _op_masked(rd_jacobian(theta, c), mask_c)
        else:
            Ac = _masked_operator(lambda cc: resid_c(cc, c_prev, theta), c, mask_c)
        if rd_precond is not None:
            Mc_raw = rd_precond(theta)
            Mc = lambda r: jnp.where(
                mask_c, r, Mc_raw(jnp.where(mask_c, 0.0, r))
            )
        else:
            diag_c = jnp.where(mask_c, 1.0, rd_diag(theta))
            Mc = lambda r: r / diag_c
        if cfg.precond_degree > 1:
            if isinstance(theta, dict) and "_lmax_c" in theta:
                lmax_c = theta["_lmax_c"]
            else:
                lmax_c = estimate_lmax(Ac, Mc, c.shape, c.dtype)
            Mc = make_chebyshev_precond(Ac, Mc, lmax_c, cfg.precond_degree)
        if rd_cg is not None:
            lam_c, _ = rd_cg(theta, c, jnp.where(mask_c, 0.0, rhs_c))
        else:
            lam_c, _ = pcg(
                Ac, jnp.where(mask_c, 0.0, rhs_c), M=Mc,
                rtol=cfg.cg_rtol, atol=cfg.cg_atol, maxiter=cfg.cg_maxiter,
            )
        # parameter + c_prev cotangents via residual VJPs
        _, vjp_c = jax.vjp(lambda cp, th: resid_c(c, cp, th), c_prev, theta)
        c_prev_bar_neg, theta_bar_c = vjp_c(lam_c)
        theta_bar = jax.tree_util.tree_map(
            # int leaves (aux-threaded plan tables) carry float0
            # cotangents, which support no arithmetic — pass them through
            lambda a, b: a if getattr(a, "dtype", None) == jax.dtypes.float0
            else -(a + b),
            theta_bar_u, theta_bar_c,
        )
        c_prev_bar = -c_prev_bar_neg
        u_prev_bar = jnp.zeros_like(u_prev)
        return (theta_bar, u_prev_bar, c_prev_bar, None)

    step.defvjp(step_fwd, step_bwd)

    @jax.custom_vjp
    def step_warm(theta, u_prev, c_prev, t, guess):
        return _solve_forward(theta, u_prev, c_prev, t, guess)

    def step_warm_fwd(theta, u_prev, c_prev, t, guess):
        out = _solve_forward(theta, u_prev, c_prev, t, guess)
        u, c, conv, k = out
        return out, (theta, u_prev, c_prev, t, u, c)

    def step_warm_bwd(saved, cot):
        # identical IFT adjoint; the converged state does not depend on
        # the warm start, so its cotangent is exactly zero
        theta_bar, u_prev_bar, c_prev_bar, _ = step_bwd(saved, cot)
        return (theta_bar, u_prev_bar, c_prev_bar, None,
                (jnp.zeros_like(u_prev_bar), jnp.zeros_like(c_prev_bar)))

    step_warm.defvjp(step_warm_fwd, step_warm_bwd)

    @jax.custom_vjp
    def step_warm_anchored(theta, u_prev, c_prev, t, guess, anchor_c):
        return _solve_forward(theta, u_prev, c_prev, t, guess, anchor_c)

    def step_warm_anchored_fwd(theta, u_prev, c_prev, t, guess, anchor_c):
        out = _solve_forward(theta, u_prev, c_prev, t, guess, anchor_c)
        u, c, conv, k = out
        return out, (theta, u_prev, c_prev, t, u, c)

    def step_warm_anchored_bwd(saved, cot):
        # identical IFT adjoint; neither the guess nor the anchored
        # tolerance changes the converged state, so their cotangents are
        # exactly zero
        theta_bar, u_prev_bar, c_prev_bar, _ = step_bwd(saved, cot)
        return (theta_bar, u_prev_bar, c_prev_bar, None,
                (jnp.zeros_like(u_prev_bar), jnp.zeros_like(c_prev_bar)),
                jnp.zeros((), c_prev_bar.dtype))

    step_warm_anchored.defvjp(step_warm_anchored_fwd, step_warm_anchored_bwd)

    def step_api(theta, u_prev, c_prev, t, guess=None, anchor_c=None):
        if guess is None:
            return step(theta, u_prev, c_prev, t)
        if anchor_c is None:
            return step_warm(theta, u_prev, c_prev, t, guess)
        return step_warm_anchored(theta, u_prev, c_prev, t, guess, anchor_c)

    return step_api
