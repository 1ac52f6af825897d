"""Mechanically-coupled reaction-diffusion tumor-growth model.

Rebuild of reference ``glimslib/simulation/simulation_tumor_growth.py``
(``TumorGrowth``): the weak forms at l.110-122,

  F_m  = inner(sigma(u), eps(v)) dx - inner(sigma(v), c*k*I) dx
         - inner(body_force, v) dx - vonNeumann(v)
  F_rd = c v dx + dt D grad(c).grad(v) dx - c_prev v dx
         - dt rho c (1-c) v dx - dt source v dx - dt vonNeumann(D v)

with parameters ``diffusion, coupling, proliferation, E, poisson``
(l.74-76), each a scalar or a per-tissue dict (DiscontinuousScalar
analogue).  The mixed P1-vector x P1 space (l.67-72) maps to nodal arrays
``u (n_nodes, d)`` / ``c (n_nodes,)``.

TPU-native differences (by design, not omission):
- heterogeneous coefficients are ``values[cell_labels]`` gathers and remain
  differentiable — the reference's DiscontinuousScalar+adjoint limitation
  (docstring l.40-46) does not exist here;
- the SNES Newton solve (l.126-140) is the block-triangular Newton-CG of
  solvers/coupled.py with IFT adjoint.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from glimslib_tpu import config
from glimslib_tpu.core.params import TissueCoefficient
from glimslib_tpu.models.base import Simulation
from glimslib_tpu.ops import forms


class TumorGrowth(Simulation):
    def __init__(self, mesh, time_dependent=True, dtype=None):
        super().__init__(mesh, time_dependent=time_dependent, dtype=dtype)
        self.units = {
            "motility": "m^2/s",
            "Emodulus": "N/m^2",
            "none": "",
            "growth_rate": "1/s",
        }

    def _define_model_params(self):
        # reference simulation_tumor_growth.py:74-76
        self.required_params = ["diffusion", "coupling", "proliferation", "E", "poisson"]
        self.optional_params = ["body_force", "source_term"]

    def _setup_functionspace(self):
        # reference simulation_tumor_growth.py:67-72: P1 vector x P1 scalar
        self.functionspace.init_function_space(
            [(1, 1), (0, 1)], {0: "displacement", 1: "concentration"}
        )

    # -- coefficients --------------------------------------------------------

    def _per_cell(self, value):
        """Scalar stays scalar; TissueCoefficient/dict becomes per-cell."""
        if isinstance(value, TissueCoefficient):
            return value.per_cell()
        if isinstance(value, dict):
            lookup = self.subdomains.tissue_value_array(value)
            return jnp.asarray(lookup, dtype=self.dtype)[
                jnp.asarray(self.subdomains.cell_labels.astype(np.int32))
            ]
        return jnp.asarray(value, dtype=self.dtype)

    def theta_class_labels(self):
        """Subdomain cell labels when every plane coefficient is scalar or
        per-tissue (dict / TissueCoefficient over the SAME labels) — the
        factored-assembly contract (ops/bell_factored.py).  Raw per-cell
        arrays or spatial callables return None (dense assembly)."""
        import numbers

        sub_labels = np.asarray(self.subdomains.cell_labels)
        p = self.params.as_dict()
        for key in ("diffusion", "proliferation", "coupling", "E", "poisson"):
            v = p.get(key)
            if isinstance(v, numbers.Number):
                continue
            if isinstance(v, dict):
                continue
            if isinstance(v, TissueCoefficient):
                if np.array_equal(np.asarray(v.cell_labels), sub_labels):
                    continue
                return None
            return None
        return sub_labels

    def make_theta(self, params: Dict):
        E = self._per_cell(params["E"])
        nu = self._per_cell(params["poisson"])
        # time-dependent source/body force: callables f(x_cell_midpoints, t)
        # evaluated inside the jitted step (the reference's Expression.t
        # update, helper_classes.py:1055-1077)
        src = params.get("source_term", 0.0)
        bf = params.get("body_force")
        self._source_t = src if callable(src) else None
        self._body_force_t = bf if callable(bf) else None
        theta = {
            "D": self._per_cell(params["diffusion"]),
            "rho": self._per_cell(params["proliferation"]),
            "coupling": self._per_cell(params["coupling"]),
            "mu": forms.compute_mu(E, nu),
            "lam": forms.compute_lambda(E, nu),
            "dt": jnp.asarray(float(params["sim_time_step"]), dtype=self.dtype),
            "body_force": jnp.asarray(
                bf if (bf is not None and not callable(bf))
                else np.zeros(self.mesh.dim),
                dtype=self.dtype,
            ),
            "source": self._per_cell(0.0 if callable(src) else src),
        }
        return theta

    _source_t = None
    _body_force_t = None

    def _midpoints(self, hi=False):
        """Cell midpoints at the working dtype, or f64 (``hi=True``) for
        mixed-precision refinement defect residuals (advisor r2)."""
        attr = "_cell_mid_jnp_hi" if hi else "_cell_mid_jnp"
        if not hasattr(self, attr):
            setattr(self, attr, jnp.asarray(
                self.mesh.cell_midpoints,
                dtype=jnp.float64 if hi else self.dtype,
            ))
        return getattr(self, attr)

    # -- residuals -----------------------------------------------------------

    def _vn_rd_term(self, theta, t, hi=False):
        """- dt * sum_bcs ∫ D q φ ds  (reference l.120: test function scaled
        by diff_const).  Per-facet D taken from the owning cell when D is
        heterogeneous.  ``hi=True``: f64 facet tables + value evaluation."""
        vdtype = jnp.float64 if hi else self.dtype
        out = None
        for name, bc in self.bcs.von_neumann_bcs.items():
            if bc["subspace_id"] != self.SUBSPACE_CONCENTRATION:
                continue
            kern = self.bcs.von_neumann_kernels(bc, hi=hi)
            q = bc["bc_value"]
            # value points: facet nodes (P1 kernels) or facet quadrature
            # points (P2 trace kernels) — coords (nf, k, dim)
            coords = kern.value_coords
            if callable(q):
                qv = jnp.reshape(
                    q(coords.reshape(-1, coords.shape[-1]), t), coords.shape[:2]
                ).astype(vdtype)
            else:
                qv = jnp.broadcast_to(
                    jnp.asarray(q, vdtype), coords.shape[:2]
                )
            D = theta["D"]
            if D.ndim == 0:
                qv = qv * D
            else:
                qv = qv * D[jnp.asarray(bc["facet_cells"])][:, None]
            term = kern.scalar_flux_residual(qv)
            out = term if out is None else out + term
        return out

    def rd_residual(self, c, c_prev, theta, t):
        if "_Mst" in theta:
            # fully-streaming form: R = W_const c + wc(c) c / 2 - M c_prev - load
            ops = self._stencil_ops
            wc = ops.build_rd_wc(c, theta["rho"], theta["dt"], conc_max=1.0)
            return (
                ops.apply_scalar(theta["_Wrd_const"], c)
                + 0.5 * ops.apply_scalar(wc, c)
                - ops.apply_scalar(theta["_Mst"], c_prev)
                - theta["_rd_load"]
            )
        if "_Bell_rd_load" in theta:
            # streaming form on the supernode halo-ELL path (unstructured
            # meshes): R = W_const c + dtρ/c_max ∫c²φ − M c_prev − load —
            # two assembled matvecs + a single-field quadratic gather
            # replace the two-field gather+scatter evaluation
            # (ops/bell.py build_bell_mass)
            from glimslib_tpu.ops import bell as bell_mod

            bplan = self._get_bell_plan()
            tb = self._bell_tables_from(theta)
            halo = (tb or bplan.tables())["_BellHalo"]
            if "_BellMrdT" in theta:
                lin = bell_mod.apply_bell_scalar_T(
                    bplan, halo, theta["_BellWrdCT"], c
                ) - bell_mod.apply_bell_scalar_T(
                    bplan, halo, theta["_BellMrdT"], c_prev
                )
            else:
                lin = bell_mod.apply_bell_scalar(
                    bplan, halo, theta["_BellWrdC"], c
                ) - bell_mod.apply_bell_scalar(
                    bplan, halo, theta["_BellMrd"], c_prev
                )
            quad = self.kernels.rd_quad_residual(
                c, theta["rho"], theta["dt"], conc_max=1.0
            )
            return lin + quad - theta["_Bell_rd_load"]
        source = theta["source"]
        if self._source_t is not None:
            source = source + jnp.asarray(
                self._source_t(self._midpoints(), t), self.dtype
            )
        r = self.kernels.rd_residual(
            c,
            c_prev,
            theta["D"],
            theta["rho"],
            theta["dt"],
            source=source,
            conc_max=1.0,
        )
        vn = self._vn_rd_term(theta, t)
        if vn is not None:
            r = r - theta["dt"] * vn
        return r

    def el_residual(self, u, c, theta, t):
        if "_Cuc" in theta:
            # fully-streaming form (lattice meshes): W_el u + C_uc c - load
            ops = self._stencil_ops
            return (
                ops.apply_vector(theta["_Wel"], u)
                + ops.apply_coupling(theta["_Cuc"], c)
                - theta["_el_load"]
            )
        if "_Bell_el_load" in theta:
            # streaming form on the supernode halo-ELL path (unstructured
            # meshes): assembled matvecs replace the matrix-free per-cell
            # gathers (ops/bell.py build_bell_coupling_uc)
            from glimslib_tpu.ops import bell as bell_mod

            bplan = self._get_bell_plan()
            tb = self._bell_tables_from(theta)
            halo = (tb or bplan.tables())["_BellHalo"]
            if "_BellCucT" in theta:
                return (
                    bell_mod.apply_bell_vector_T(
                        bplan, halo, theta["_BellWelT"], u
                    )
                    + bell_mod.apply_bell_coupling_T(
                        bplan, halo, theta["_BellCucT"], c
                    )
                    - theta["_Bell_el_load"]
                )
            return (
                bell_mod.apply_bell_vector(
                    bplan, halo, theta["_BellWel"], u
                )
                + bell_mod.apply_bell_coupling(
                    bplan, halo, theta["_BellCuc"], c
                )
                - theta["_Bell_el_load"]
            )
        bf = theta["body_force"]
        if self._body_force_t is not None:
            bf = bf + jnp.asarray(
                self._body_force_t(self._midpoints(), t), self.dtype
            )
        r = self.kernels.elasticity_residual(
            u, c, theta["mu"], theta["lam"], theta["coupling"],
            body_force=bf,
        )
        vn = self.bcs.von_neumann_residual(self.SUBSPACE_DISPLACEMENT, t)
        if vn is not None:
            r = r - vn
        return r

    def rd_diag(self, theta):
        return self.kernels.rd_mass_stiffness_diag(theta["D"], theta["rho"], theta["dt"])

    def el_diag(self, theta):
        return self.kernels.elasticity_diag(theta["mu"], theta["lam"])

    # -- f64 residuals for mixed-precision refinement ------------------------

    _kernels_hi = None

    def _get_kernels_hi(self):
        if self._kernels_hi is None:
            from glimslib_tpu.ops.assembly import P1Kernels

            self._kernels_hi = P1Kernels(self.mesh, dtype=jnp.float64)
        return self._kernels_hi

    def hi_residual_fns(self):
        """(rd_hi, el_hi): the same physics evaluated with f64 geometry
        tables on the gather path — the defect-evaluation side of
        mixed-precision iterative refinement (StepConfig.refine_f64).
        The f32 working path keeps steering the solves; these define what
        'converged' means."""
        k64 = self._get_kernels_hi()

        def rd_hi(c, c_prev, theta, t):
            source = theta["source"]
            if self._source_t is not None:
                source = source + jnp.asarray(
                    self._source_t(self._midpoints(hi=True), t), jnp.float64
                )
            r = k64.rd_residual(
                c, c_prev, theta["D"], theta["rho"], theta["dt"],
                source=source, conc_max=1.0,
            )
            vn = self._vn_rd_term(theta, t, hi=True)
            if vn is not None:
                r = r - theta["dt"] * vn
            return r

        def el_hi(u, c, theta, t):
            bf = theta["body_force"]
            if self._body_force_t is not None:
                bf = bf + jnp.asarray(
                    self._body_force_t(self._midpoints(hi=True), t),
                    jnp.float64,
                )
            r = k64.elasticity_residual(
                u, c, theta["mu"], theta["lam"], theta["coupling"],
                body_force=bf,
            )
            vn = self.bcs.von_neumann_residual(
                self.SUBSPACE_DISPLACEMENT, t, hi=True
            )
            if vn is not None:
                r = r - vn
            return r

        return rd_hi, el_hi

    # -- adjoint runners (reference simulation_tumor_growth.py:142-170) ------

    def run_for_adjoint(self, parameters, output_dir=None):
        """Update (diffusion, proliferation, coupling) then run."""
        self.params.diffusion, self.params.proliferation, self.params.coupling = (
            parameters
        )
        self.run(keep_nth=1, save_method=None, clear_all=False, plot=False,
                 output_dir=output_dir or config.output_dir_simulation_tmp)
        return self.solution

    def run_for_adjoint2(self, parameters, output_dir=None):
        """2-parameter variant (diffusion, proliferation)."""
        self.params.diffusion, self.params.proliferation = parameters
        self.run(keep_nth=1, save_method=None, clear_all=False, plot=False,
                 output_dir=output_dir or config.output_dir_simulation_tmp)
        return self.solution

    def init_postprocess(self, output_dir=None):
        from glimslib_tpu.postprocess import PostProcessTumorGrowth

        self.postprocess = PostProcessTumorGrowth(
            self.results, self.params, output_dir=output_dir or "."
        )
        return self.postprocess
