"""Frozen per-tissue-class factored assembly for supernode halo-ELL planes.

The per-simulate theta-plane assembly is gather-rate bound on the dense
placement gather — ~25 ms/step at the reference's 5-step horizon, ~18% of
the flagship step (docs/numerics.md roofline; VERDICT r4 #4).  But the
models' per-cell coefficients are CLASS-WISE CONSTANT — per-tissue
``DiscontinuousScalar`` semantics (reference helper_classes.py:47-58),
realised in the rebuild as label-LUT gathers (models/tumor_growth_brain.py
make_theta, core/params.py TissueCoefficient) — and every assembled plane
is LINEAR in its per-cell coefficient with fixed geometry:

    W(theta) = P(c ⊙ g) = Σ_t  coeff_t(theta) · P(1_t ⊙ g)

with P the (fixed) class-split pull + placement gather of ops/bell.py and
1_t the cell-indicator of class t.  So the placement gather runs ONCE PER
CLASS CHANNEL at setup time (runtime_aux, frozen like the two-level
coarse), and each simulate reduces the frozen channel stacks with ~10
traced scalars — an elementwise fma tree at streaming bandwidth (~4 ms at
197k tets) instead of ~125 ms of gathers.

Channel structure (T = number of cell classes present):

- elasticity  (2T): W = Σ_t mu_t G^mu_t + lam_t G^lam_t
- coupling    (T):  C = Σ_t coupling_t (2 mu_t + d lam_t) G^c_t
- rd const    (2T): W = Σ_t (1 − dt rho_t) M_t + dt D_t K_t
- mass        (1):  theta-independent — stored outright.

Exactness contract: valid iff every per-cell coefficient array in theta is
constant within each class; ``Simulation.theta_class_labels`` returns the
labels only when the model guarantees that (per-tissue parameter models).
Per-class scalars are read back from one static REPRESENTATIVE cell per
class — exact under the contract, and the vjp routes each class cotangent
through its representative to the SAME per-tissue parameter gradients as
the dense path (the label-LUT gather's vjp sums per-cell cotangents per
tissue; only the class total is nonzero either way).  Differentiating
w.r.t. a RAW per-cell coefficient array is outside the contract (the
class labels gate already excludes such models).

Kill switch: ``GLIMS_FACTORED=0`` (models/base.py runtime_aux gate).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from glimslib_tpu.ops import bell as bell_mod


def class_reps(labels):
    """(classes, reps): sorted unique class labels and one static
    representative cell index per class."""
    labels = np.asarray(labels)
    classes, reps = np.unique(labels, return_index=True)
    return classes, reps.astype(np.int32)


def _stiffness_entries(arrays, ind, dtype):
    """(npe, npe, nc) entries of the scalar stiffness ∫ ∇φi·∇φj masked to
    one class: (vol · ind) gg (the K part of ops/bell.py
    rd_const_entries)."""
    g, vol = arrays
    gg = jnp.sum(g[:, None, :, :] * g[None, :, :, :], axis=2)
    return (vol * jnp.asarray(ind, dtype)) * gg


def _support_idx(classes, support, key):
    """Indices (into the sorted class list) of the classes where the
    coefficient ``key`` can be nonzero.  ``support`` maps coefficient name
    → set of class labels with STRUCTURAL support (make_theta builds the
    others with LUT fill 0.0 for ANY parameter values — e.g. D/rho vanish
    outside GM/WM, reference brain_quad.py:95-104); absent key = all."""
    if not support or key not in support:
        return list(range(len(classes)))
    keep = support[key]
    return [i for i, c in enumerate(classes) if int(c) in keep]


def build_cache(plan, arrays, labels, m0, dtype, want_cuc, want_rd,
                want_mrd, support=None, tables=None):
    """Frozen channel stacks for the theta-only bell planes.

    Returns the aux dict: ``_FReps`` (T,) int32 representative cells,
    ``_FWel`` (2T, nb, s, Kh, d, d), optional ``_FCuc`` (T, nb, s, Kh, d),
    ``_FWrd`` (1+|supp rho|+|supp D|, nb, s, Kh) — channel 0 the FULL mass
    plane, then per-supported-class mass and stiffness channels (the rd
    plane is M − dt Σ rho_t M_t + dt Σ D_t K_t) — with ``_FWrdRhoReps`` /
    ``_FWrdDReps`` the matching representative cells, and ``_FMrd``
    aliasing channel 0.  All in the RAW ``BellPlan.assemble`` layouts, so
    the per-simulate reduction slots into
    ``_augment_theta_with_operators`` exactly where ``assemble_fused``'s
    outputs did (downstream transposes/kernel relayouts unchanged).

    Channels are assembled per family (one fused placement gather each) to
    bound transient memory at flagship scale.  Each family build runs
    under ONE jit with the plan tables as ARGUMENTS — eagerly, every
    gather/accumulate op would remote-compile separately on the axon
    backend (minutes of setup); as closure constants the tables would
    blow the remote-compile payload limit (ops/bell.py docstring)."""
    import jax

    labels = np.asarray(labels)
    classes, reps = class_reps(labels)
    g, vol = arrays
    T = len(classes)
    # (T, nc) stacked indicators as ONE jit argument
    inds = jnp.asarray(
        np.stack([(labels == c) for c in classes]).astype(np.float64), dtype
    )
    tb = tables if tables is not None else plan.tables()
    out = {"_FReps": jnp.asarray(reps)}
    zero = jnp.zeros((), dtype)

    @jax.jit
    def _el(tb, inds, g, vol):
        # elasticity: mu channels then lam channels (reduction order
        # contract with planes_from_theta)
        arr = (g, vol)
        ents = [bell_mod.elasticity_entries(arr, inds[t], zero, dtype)
                for t in range(T)]
        ents += [bell_mod.elasticity_entries(arr, zero, inds[t], dtype)
                 for t in range(T)]
        return jnp.stack(bell_mod.assemble_fused(plan, ents, tb), axis=0)

    out["_FWel"] = _el(tb, inds, g, vol)
    if want_cuc:

        @jax.jit
        def _cuc(tb, inds, g, vol):
            # unit-coefficient channels: mu=ind/2, lam=0, coupling=1
            # makes kfac = ind · vol/(d+1) (ops/bell.py
            # coupling_uc_entries)
            arr = (g, vol)
            ents = [
                bell_mod.coupling_uc_entries(
                    arr, 0.5 * inds[t], zero, jnp.ones((), dtype), dtype,
                )
                for t in range(T)
            ]
            return jnp.stack(bell_mod.assemble_fused(plan, ents, tb), axis=0)

        out["_FCuc"] = _cuc(tb, inds, g, vol)
    if want_rd:
        rho_i = _support_idx(classes, support, "rho")
        d_i = _support_idx(classes, support, "D")

        @jax.jit
        def _rd(tb, inds, g, vol):
            arr = (g, vol)
            M_full = bell_mod.mass_entries(arr, m0, dtype)
            ents = [M_full]
            ents += [M_full * inds[i] for i in rho_i]
            ents += [_stiffness_entries(arr, inds[i], dtype) for i in d_i]
            return jnp.stack(bell_mod.assemble_fused(plan, ents, tb), axis=0)

        planes = _rd(tb, inds, g, vol)
        out["_FWrd"] = planes
        out["_FWrdRhoReps"] = jnp.asarray(reps[rho_i])
        out["_FWrdDReps"] = jnp.asarray(reps[d_i])
        if want_mrd:
            out["_FMrd"] = planes[0]
    return out


def _reduce(G, coeffs):
    """Σ_ch coeffs[ch] · G[ch] as a static fma tree (XLA fuses it into one
    streaming pass over the stacked tables; never a dot — CLAUDE.md)."""
    out = coeffs[0] * G[0]
    for i in range(1, G.shape[0]):
        out = out + coeffs[i] * G[i]
    return out


def _at_reps(x, reps, dtype):
    """Per-class scalars from a per-cell (or scalar) coefficient."""
    x = jnp.asarray(x, dtype)
    if x.ndim == 0:
        return jnp.broadcast_to(x, reps.shape)
    return jnp.take(x, reps)


def planes_from_theta(theta, dim, dtype, want_cuc, want_rd, want_mrd):
    """Reduce the frozen channel stacks with theta's per-class scalars.

    Returns the plane list in ``_augment_theta_with_operators``'s
    ``assemble_fused`` order — [Wel, Cuc?, Wrd?, Mrd?] — or None when the
    cache does not cover the wanted planes (caller falls back to the dense
    assembly)."""
    if "_FReps" not in theta or "_FWel" not in theta:
        return None
    if want_cuc and "_FCuc" not in theta:
        return None
    if want_rd and "_FWrd" not in theta:
        return None
    if want_mrd and "_FMrd" not in theta:
        return None
    reps = theta["_FReps"]
    mu_t = _at_reps(theta["mu"], reps, dtype)
    lam_t = _at_reps(theta["lam"], reps, dtype)
    planes = [_reduce(theta["_FWel"], jnp.concatenate([mu_t, lam_t]))]
    if want_cuc:
        cpl_t = _at_reps(theta["coupling"], reps, dtype)
        planes.append(
            _reduce(theta["_FCuc"], cpl_t * (2.0 * mu_t + dim * lam_t))
        )
    if want_rd:
        dt = jnp.asarray(theta["dt"], dtype)
        rho_t = _at_reps(theta["rho"], theta["_FWrdRhoReps"], dtype)
        D_t = _at_reps(theta["D"], theta["_FWrdDReps"], dtype)
        planes.append(
            _reduce(
                theta["_FWrd"],
                jnp.concatenate(
                    [jnp.ones((1,), dtype), -dt * rho_t, dt * D_t]
                ),
            )
        )
    if want_mrd:
        planes.append(theta["_FMrd"])
    return planes


# -- P2 (quad) concentration plane (ops/p2_ell.py) ---------------------------


def _p2_stiffness_geom(p2k, dtype):
    """(npe, npe, nc) geometry of the P2 stiffness entries (the K factor
    of ops/p2_ell.py _const_entries: Σ_ab T[i,j,a,b] (A Aᵀ)_ab, chunked —
    never einsum, CLAUDE.md) and the per-cell |det J|."""
    from glimslib_tpu.ops import p2_ell

    d, npe, nc = p2k.dim, p2k.npe, p2k.n_cells
    _, T_, _ = p2_ell.p2_ref_tensors(d)
    T = jnp.asarray(T_.reshape(npe * npe, d * d), dtype)
    AAT, det = p2_ell._geom(p2k, dtype)
    AAT2 = AAT.reshape(nc, d * d)
    K = jnp.zeros((npe * npe, nc), dtype)
    for ab in range(d * d):
        K = K + T[:, ab, None] * AAT2[None, :, ab]
    return K.reshape(npe, npe, nc), det


def build_p2_cache(p2plan, p2k, labels, dtype, want_mass, support=None,
                   tables=None):
    """Frozen per-class channels of the assembled P2 rd constant plane
    (``_P2BWrdC`` — the quad models' per-simulate placement gather over
    7.3x the P1 dof count): ``_FP2Wrd`` channels [M_full, M_t (supp rho),
    K_t (supp D)] + rep arrays, and ``_FP2Mrd`` (the static P2 consistent
    mass) when the streamed quad residual is active.  Jitted with the P2
    plan tables as arguments (see :func:`build_cache`)."""
    import jax

    from glimslib_tpu.ops import p2_ell

    labels = np.asarray(labels)
    classes, reps = class_reps(labels)
    inds = jnp.asarray(
        np.stack([(labels == c) for c in classes]).astype(np.float64), dtype
    )
    M0_, _, _ = p2_ell.p2_ref_tensors(p2k.dim)
    M0 = jnp.asarray(M0_, dtype)
    rho_i = _support_idx(classes, support, "rho")
    d_i = _support_idx(classes, support, "D")
    tb = tables if tables is not None else p2plan.tables()

    # ONE CHANNEL PER JIT CALL, memory-bounded assembly: the P2 plan at
    # flagship scale (248M dense slots, 7.4M off-diag pairs) cannot fuse
    # T' channels through one placement gather — the (rows, K, T')
    # intermediates lane-pad their small trailing dims to 128 and the
    # axon AOT planner allocates them outright (f32[5, 7404096, 6] plans
    # as 18.9 GB > HBM).  assemble_maybe_chunked bounds each channel's
    # transients under lax.map; ~1 s per channel of SETUP time (the whole
    # point of the frozen cache is that no simulate pays this again).
    from functools import partial

    @partial(jax.jit, static_argnames=("kind",))
    def _channel(tb, ind, kind):
        Kg, det = _p2_stiffness_geom(p2k, dtype)
        if kind == "mass":
            ent = M0[:, :, None] * (det * ind)[None, None, :]
        else:
            ent = (det * ind) * Kg
        return bell_mod.assemble_maybe_chunked(p2plan, ent, tb)

    ones = jnp.ones((p2k.n_cells,), dtype)
    chans = [_channel(tb, ones, "mass")]
    chans += [_channel(tb, inds[i], "mass") for i in rho_i]
    chans += [_channel(tb, inds[i], "stiff") for i in d_i]
    planes = jnp.stack(chans, axis=0)
    out = {
        "_FP2Wrd": planes,
        "_FP2RhoReps": jnp.asarray(reps[rho_i]),
        "_FP2DReps": jnp.asarray(reps[d_i]),
    }
    if want_mass:
        out["_FP2Mrd"] = planes[0]
    return out


def p2_planes_from_theta(theta, dtype, want_mass):
    """[Wrd2] (+ [Mrd2]) reduced from the frozen P2 channels, or None."""
    if "_FP2Wrd" not in theta:
        return None
    if want_mass and "_FP2Mrd" not in theta:
        return None
    dt = jnp.asarray(theta["dt"], dtype)
    rho_t = _at_reps(theta["rho"], theta["_FP2RhoReps"], dtype)
    D_t = _at_reps(theta["D"], theta["_FP2DReps"], dtype)
    planes = [
        _reduce(
            theta["_FP2Wrd"],
            jnp.concatenate([jnp.ones((1,), dtype), -dt * rho_t, dt * D_t]),
        )
    ]
    if want_mass:
        planes.append(theta["_FP2Mrd"])
    return planes
