"""TumorGrowth with quadratic (P2) concentration.

Rebuild of reference ``simulation/simulation_tumor_growth_quad.py``: same
class and physics as :class:`~glimslib_tpu.models.tumor_growth.TumorGrowth`,
only the concentration element degree changes to 2
(reference simulation_tumor_growth_quad.py:69).  Assembly runs through the
quadrature-based P2 kernels (ops/p2.py); the elasticity block stays P1 and
couples to the concentration through its exact per-cell integral.

Dirichlet BCs on the P2 concentration subspace constrain vertex AND
facet edge-midpoint dofs (core/bcs.py); von-Neumann fluxes integrate over
the facet trace element by quadrature (ops/p2.py ``P2FacetKernels``);
initial values are true L2 projections onto the P2 space
(reference helper_classes.py:983-986).
"""

from __future__ import annotations

import jax.numpy as jnp

from glimslib_tpu.models.tumor_growth import TumorGrowth as _TumorGrowthP1
from glimslib_tpu.ops.p2 import P2Kernels


class TumorGrowth(_TumorGrowthP1):
    CONCENTRATION_DEGREE = 2

    def _setup_functionspace(self):
        self.functionspace.init_function_space(
            [(1, 1), (0, 2)], {0: "displacement", 1: "concentration"}
        )
        self.p2 = P2Kernels(self.mesh, dtype=self.dtype)

    # -- residuals over the P2 concentration space ---------------------------

    def rd_residual(self, c, c_prev, theta, t):
        if isinstance(theta, dict) and "_P2B_rd_load" in theta:
            # streamed form on the P2 supernode halo-ELL path (round 4,
            # ops/p2_ell.py): R = W_const c + dtρ/c_max ∫c²φ − M c_prev
            # − load — two assembled matvecs + the factored cubic term
            # replace the per-evaluation quadrature gather+scatter; the
            # SAME degree-6 rule, re-associated, so values match
            # P2Kernels.rd_residual to round-off
            from glimslib_tpu.ops import bell as bell_mod
            from glimslib_tpu.ops import p2_ell

            plan = self._get_p2_plan()
            tb = plan.tables_from_theta(theta)
            halo = (tb or plan.tables())[plan.prefix + "Halo"]
            lin = bell_mod.apply_bell_scalar(
                plan, halo, theta["_P2BWrdC"], c
            ) - bell_mod.apply_bell_scalar(
                plan, halo, theta["_P2BMrd"], c_prev
            )
            quad = p2_ell.p2_cubic_residual(
                plan, self.p2, c, theta["rho"], theta["dt"], 1.0,
                self.dtype, tables=tb,
            )
            return lin + quad - theta["_P2B_rd_load"]
        r = self.p2.rd_residual(
            c, c_prev, theta["D"], theta["rho"], theta["dt"],
            source=theta["source"], conc_max=1.0,
        )
        vn = self._vn_rd_term(theta, t)
        if vn is not None:
            # reference scales the flux by dt*D (simulation_tumor_growth.py:120)
            r = r - theta["dt"] * vn
        return r

    def el_residual(self, u, c, theta, t):
        c_int = self.p2.cell_integral(c)
        r = self.kernels.elasticity_residual_cint(
            u, c_int, theta["mu"], theta["lam"], theta["coupling"],
            body_force=theta["body_force"],
        )
        vn = self.bcs.von_neumann_residual(self.SUBSPACE_DISPLACEMENT, t)
        if vn is not None:
            r = r - vn
        return r

    def rd_diag(self, theta):
        return self.p2.rd_mass_stiffness_diag(theta["D"], theta["rho"], theta["dt"])

    def concentration_mass_action(self, c):
        return self.p2.mass_residual(c)

    def init_postprocess(self, output_dir=None):
        pp = super().init_postprocess(output_dir)
        return pp

    # -- f64 residuals for mixed-precision refinement ------------------------

    _p2_hi = None

    def hi_residual_fns(self):
        if self._p2_hi is None:
            self._p2_hi = P2Kernels(self.mesh, dtype=jnp.float64)
        p2h = self._p2_hi
        k64 = self._get_kernels_hi()

        def rd_hi(c, c_prev, theta, t):
            r = p2h.rd_residual(
                c, c_prev, theta["D"], theta["rho"], theta["dt"],
                source=theta["source"], conc_max=1.0,
            )
            vn = self._vn_rd_term(theta, t, hi=True)
            if vn is not None:
                r = r - theta["dt"] * vn
            return r

        def el_hi(u, c, theta, t):
            c_int = p2h.cell_integral(c)
            r = k64.elasticity_residual_cint(
                u, c_int, theta["mu"], theta["lam"], theta["coupling"],
                body_force=theta["body_force"],
            )
            vn = self.bcs.von_neumann_residual(
                self.SUBSPACE_DISPLACEMENT, t, hi=True
            )
            if vn is not None:
                r = r - vn
            return r

        return rd_hi, el_hi
