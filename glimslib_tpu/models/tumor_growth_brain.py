"""Brain-specific tumor-growth model with per-tissue parameters.

Rebuild of reference ``simulation/simulation_tumor_growth_brain.py`` and
``simulation_tumor_growth_brain_quad.py`` (``TumorGrowthBrain``): 13
per-tissue parameters (brain_quad.py:17-23)

    E_GM, E_WM, E_CSF, E_VENT, nu_GM, nu_WM, nu_CSF, nu_VENT,
    D_GM, D_WM, rho_GM, rho_WM, coupling

over the tissue map {0: outside, 1: CSF, 2: GM, 3: WM, 4: Ventricles}
(image_based_optimization.py:391-394), with:
- zero diffusion/proliferation in CSF/Ventricles/outside
  (brain_quad.py:95-104),
- fixed stiff 'outside' material E=10e3, nu=0.45 (brain_quad.py:38-39).

The reference writes the weak form per-subdomain-measure by hand
(brain_quad.py:65-106) purely to work around dolfin-adjoint's inability to
differentiate DiscontinuousScalar coefficients.  Here the same physics is
one residual with per-cell coefficient arrays assembled by differentiable
gathers from the per-tissue parameter vector — forward results agree with
:class:`~glimslib_tpu.models.tumor_growth.TumorGrowth` given matching
coefficients (the reference's own parity claim, brain.py:12-15, validated
in tests/test_comparison.py), and every per-tissue scalar is a valid
adjoint control.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from glimslib_tpu import config
from glimslib_tpu.models.tumor_growth import TumorGrowth
from glimslib_tpu.ops import forms

# fixed material for the 'outside' region (reference brain_quad.py:38-39)
E_OUT = 10e3
NU_OUT = 0.45


class TumorGrowthBrain(TumorGrowth):
    # tissue names used by the workflow (image_based_optimization.py:391-394)
    TISSUES = ("outside", "CSF", "GM", "WM", "Ventricles")

    def _define_model_params(self):
        # reference brain_quad.py:17-23
        self.required_params = [
            "E_GM", "E_WM", "E_CSF", "E_VENT",
            "nu_GM", "nu_WM", "nu_CSF", "nu_VENT",
            "D_GM", "D_WM",
            "rho_GM", "rho_WM",
            "coupling",
        ]
        self.optional_params = ["body_force", "rd_source_term"]

    # -- coefficient assembly -------------------------------------------------

    def _tissue_lookup(self, by_name: Dict[str, object], fill=0.0):
        """Per-tissue dict {tissue_name: value} -> lookup array indexed by
        label id, as a differentiable stack of the given (possibly traced)
        values."""
        id_name = self.subdomains.tissue_id_name_map
        max_id = max(
            [int(self.subdomains.cell_labels.max())] + list(id_name.keys())
        )
        vals = []
        for tid in range(max_id + 1):
            name = id_name.get(tid)
            v = by_name.get(name, fill) if name is not None else fill
            vals.append(jnp.asarray(v, dtype=self.dtype))
        return jnp.stack(vals)

    def theta_class_labels(self):
        """Every brain coefficient is a per-tissue LUT gather over the
        subdomain cell labels (:meth:`make_theta`) — class-wise constant
        by construction, so the factored frozen assembly
        (ops/bell_factored.py) is always exact here."""
        return np.asarray(self.subdomains.cell_labels)

    def theta_class_support(self):
        """D and rho are built with LUT fill 0.0 outside GM+WM
        (:meth:`make_theta`, reference brain_quad.py:95-104) — their
        factored channels exist only for those classes."""
        name_id = {
            v: k for k, v in self.subdomains.tissue_id_name_map.items()
        }
        supp = {int(name_id[n]) for n in ("GM", "WM") if n in name_id}
        return {"D": supp, "rho": supp}

    def make_theta(self, params: Dict):
        p = params
        labels = jnp.asarray(self.subdomains.cell_labels.astype(np.int32))
        E_lut = self._tissue_lookup(
            {"CSF": p["E_CSF"], "GM": p["E_GM"], "WM": p["E_WM"],
             "Ventricles": p["E_VENT"], "outside": E_OUT},
            fill=E_OUT,
        )
        nu_lut = self._tissue_lookup(
            {"CSF": p["nu_CSF"], "GM": p["nu_GM"], "WM": p["nu_WM"],
             "Ventricles": p["nu_VENT"], "outside": NU_OUT},
            fill=NU_OUT,
        )
        # zero D / rho outside GM+WM (reference brain_quad.py:95-104)
        D_lut = self._tissue_lookup({"GM": p["D_GM"], "WM": p["D_WM"]}, fill=0.0)
        rho_lut = self._tissue_lookup(
            {"GM": p["rho_GM"], "WM": p["rho_WM"]}, fill=0.0
        )
        E = E_lut[labels]
        nu = nu_lut[labels]
        theta = {
            "D": D_lut[labels],
            "rho": rho_lut[labels],
            "coupling": jnp.asarray(p["coupling"], dtype=self.dtype),
            "mu": forms.compute_mu(E, nu),
            "lam": forms.compute_lambda(E, nu),
            "dt": jnp.asarray(float(p["sim_time_step"]), dtype=self.dtype),
            "body_force": jnp.asarray(
                p.get("body_force")
                if p.get("body_force") is not None
                else np.zeros(self.mesh.dim),
                dtype=self.dtype,
            ),
            "source": jnp.asarray(p.get("rd_source_term", 0.0), dtype=self.dtype),
        }
        return theta

    # -- adjoint runners (reference brain_quad.py:131-210) --------------------

    def _set_and_run(self, updates: Dict, output_dir=None):
        for k, v in updates.items():
            setattr(self.params, k, v)
        self.run(keep_nth=1, save_method=None, clear_all=False, plot=False,
                 output_dir=output_dir or config.output_dir_simulation_tmp)
        return self.solution

    def run_for_adjoint(self, parameters, output_dir=None):
        """5 params: D_WM, D_GM, rho_WM, rho_GM, coupling (brain_quad.py:131-149)."""
        d_wm, d_gm, r_wm, r_gm, k = parameters
        return self._set_and_run(
            {"D_WM": d_wm, "D_GM": d_gm, "rho_WM": r_wm, "rho_GM": r_gm,
             "coupling": k},
            output_dir,
        )

    run_for_adjoint_5params = run_for_adjoint

    def run_for_adjoint_4params(self, parameters, output_dir=None):
        """D_WM, D_GM, rho(=WM=GM), coupling (brain_quad.py:192-210)."""
        d_wm, d_gm, r, k = parameters
        return self._set_and_run(
            {"D_WM": d_wm, "D_GM": d_gm, "rho_WM": r, "rho_GM": r, "coupling": k},
            output_dir,
        )

    def run_for_adjoint_3params(self, parameters, output_dir=None):
        """D_WM (D_GM=0.2*D_WM), rho, coupling (brain_quad.py:151-169)."""
        d_wm, r, k = parameters
        return self._set_and_run(
            {"D_WM": d_wm, "D_GM": 0.2 * d_wm, "rho_WM": r, "rho_GM": r,
             "coupling": k},
            output_dir,
        )

    def run_for_adjoint_2params(self, parameters, output_dir=None):
        """D_WM (D_GM=0.2*D_WM), rho; coupling unchanged (brain_quad.py:171-189)."""
        d_wm, r = parameters
        return self._set_and_run(
            {"D_WM": d_wm, "D_GM": 0.2 * d_wm, "rho_WM": r, "rho_GM": r},
            output_dir,
        )

    def init_postprocess(self, output_dir=None):
        from glimslib_tpu.postprocess import PostProcessTumorGrowthBrain

        self.postprocess = PostProcessTumorGrowthBrain(
            self.results, self.params, output_dir=output_dir or "."
        )
        return self.postprocess
