"""Post-processing of recorded solutions: derived mechanical/growth fields,
summary metrics, and the cross-simulation Comparison parity harness.

Rebuild of reference ``helper_classes.py``:
- ``PostProcess`` (l.1521-1731): strain, pressure, von Mises stress,
  traction force on boundaries, displacement norm, ALE mesh warping for
  "deformed configuration" outputs,
- ``PostProcessTumorGrowth`` (l.1734-1940): stress from (E, nu), logistic
  growth field, growth-induced strain/jacobian, concentration in the
  deformed configuration, plot_all / save_all,
- ``PostProcessTumorGrowthBrain`` (l.1943-1972): per-tissue parameter
  mapping,
- ``Comparison`` (l.1975-2036): field-level errornorms between two
  simulations at shared recording steps -> pandas summary.

Derived tensor fields are computed per cell from the constant P1 gradients
(exact) and projected to nodes by lumped-mass L2 projection for output.
L2 norms use the consistent mass matrix: ||f||^2 = f^T M f.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from glimslib_tpu.ops import forms
from glimslib_tpu.ops.assembly import P1Kernels

logger = logging.getLogger(__name__)


class PostProcess:
    """Base postprocessor over a Results instance (reference l.1521-1731)."""

    def __init__(self, results, params=None, output_dir="."):
        self.results = results
        self.params = params
        self.output_dir = output_dir
        self.mesh = results.mesh
        self.dim = self.mesh.dim
        self.kernels = P1Kernels(self.mesh)
        self._lumped = np.asarray(self.kernels.lumped_mass())

    # -- helpers -------------------------------------------------------------

    def get_recording_steps(self):
        return self.results.get_recording_steps()

    def _fields(self, recording_step):
        f = self.results.get_result(recording_step)
        if f is None:
            raise KeyError(f"no recording step {recording_step}")
        return f

    def get_displacement(self, recording_step):
        return np.asarray(self._fields(recording_step)[0])

    def get_concentration(self, recording_step):
        c = np.asarray(self._fields(recording_step)[1])
        if c.ndim == 1 and len(c) > self.mesh.n_nodes:
            # P2 field (quad models): extract vertex-dof values (equal to
            # the function's vertex values) via the shared interleaved
            # layout (ops/p2.py p2_dof_layout)
            from glimslib_tpu.ops.p2 import p2_dof_layout

            _, rank, _ = p2_dof_layout(self.mesh)
            return c[rank[: self.mesh.n_nodes]]
        return c

    def cell_to_node(self, cell_vals):
        """Lumped-mass L2 projection of a cellwise-constant field to P1."""
        cell_vals = np.asarray(cell_vals, dtype=np.float64)
        d = self.dim
        w = self.mesh.cell_volumes / (d + 1)
        extra = cell_vals.shape[1:]
        acc = np.zeros((self.mesh.n_nodes,) + extra)
        wc = (w.reshape(-1, *([1] * len(extra))) * cell_vals)
        for j in range(d + 1):
            np.add.at(acc, self.mesh.cells[:, j], wc)
        return acc / self._lumped.reshape(-1, *([1] * len(extra)))

    # -- kinematic / stress fields (reference l.1566-1610) -------------------

    def get_strain_tensor(self, recording_step):
        """Per-cell small-strain tensor (nc, d, d)."""
        u = jnp.asarray(self.get_displacement(recording_step))
        grad_u = self.kernels.cell_vector_gradient(u)
        return np.asarray(forms.compute_strain(grad_u))

    def get_stress_tensor(self, recording_step, mu_cell, lam_cell):
        eps = jnp.asarray(self.get_strain_tensor(recording_step))
        return np.asarray(forms.compute_stress(eps, mu_cell, lam_cell))

    def get_pressure(self, recording_step, mu_cell, lam_cell):
        sig = self.get_stress_tensor(recording_step, mu_cell, lam_cell)
        return np.asarray(forms.compute_pressure_from_stress_tensor(jnp.asarray(sig)))

    def get_van_mises_stress(self, recording_step, mu_cell, lam_cell):
        sig = self.get_stress_tensor(recording_step, mu_cell, lam_cell)
        return np.asarray(forms.compute_van_mises_stress(jnp.asarray(sig), self.dim))

    def get_displacement_norm(self, recording_step):
        u = self.get_displacement(recording_step)
        return np.linalg.norm(u, axis=1)

    def get_total_jacobian(self, recording_step):
        u = jnp.asarray(self.get_displacement(recording_step))
        grad_u = self.kernels.cell_vector_gradient(u)
        return np.asarray(forms.compute_total_jacobian(grad_u))

    def get_traction_force(self, recording_step, mu_cell, lam_cell, facet_idx=None):
        """∫_Γ σ·n ds over boundary facets (reference l.1602-1610): sum of
        per-facet stress (from the owning cell) times area and normal."""
        m = self.mesh
        if facet_idx is None:
            facet_idx = np.arange(len(m.boundary_facet_area))
        sig = self.get_stress_tensor(recording_step, mu_cell, lam_cell)
        own = m.boundary_facet_cell[facet_idx]
        n = m.boundary_facet_normal[facet_idx]
        a = m.boundary_facet_area[facet_idx]
        tract = np.einsum("fab,fb->fa", sig[own], n)
        return (tract * a[:, None]).sum(axis=0)

    # -- ALE mesh warping (reference l.1712-1730) ---------------------------

    def deformed_mesh(self, recording_step, scale=1.0):
        """Functional replacement for ``update_mesh_displacement``: returns a
        new Mesh moved by the recorded displacement (reverse: scale=-1)."""
        return self.mesh.moved(scale * self.get_displacement(recording_step))

    def update_mesh_displacement(self, recording_step, reverse=False):
        """Stateful ALE warp with exact round-trip, the reference's
        ``update_mesh_displacement`` semantics (helper_classes.py:1712-1730):
        ``reverse=False`` moves ``self.mesh`` by the recorded displacement
        and remembers it; ``reverse=True`` undoes the remembered move,
        restoring the original coordinates bit-exactly.  The functional
        :meth:`deformed_mesh` stays the preferred API; this exists for
        reference-workflow parity (warp, measure in deformed config,
        unwarp)."""
        if reverse:
            prev = getattr(self, "_mesh_before_warp", None)
            if prev is None:
                logger.warning(
                    "update_mesh_displacement(reverse=True) without a prior "
                    "forward warp -- mesh left unchanged"
                )
                return self.mesh
            self.mesh = prev  # bit-exact restore
            self._mesh_before_warp = None
            return self.mesh
        if getattr(self, "_mesh_before_warp", None) is None:
            # single-slot semantics like the reference: re-warping replaces
            # the warp, reverse always restores the pre-warp coordinates
            self._mesh_before_warp = self.mesh
        self.mesh = self._mesh_before_warp.moved(
            self.get_displacement(recording_step)
        )
        return self.mesh


class PostProcessTumorGrowth(PostProcess):
    """Model-specific fields (reference l.1734-1940)."""

    def _material(self):
        """Per-cell (mu, lam) from params (scalars or per-tissue dicts)."""
        p = self.params
        getv = lambda name, default=None: getattr(p, name, default)
        E = getv("E")
        nu = getv("poisson")
        subdomains = getattr(p, "_subdomains", None)

        def percell(v):
            if isinstance(v, dict) and subdomains is not None:
                return subdomains.tissue_value_array(v)[subdomains.cell_labels]
            from glimslib_tpu.core.params import TissueCoefficient

            if isinstance(v, TissueCoefficient):
                return np.asarray(v.per_cell())
            return np.asarray(v, dtype=np.float64)

        E = percell(E)
        nu = percell(nu)
        mu = np.asarray(forms.compute_mu(E, nu))
        lam = np.asarray(forms.compute_lambda(E, nu))
        return mu, lam

    def get_stress(self, recording_step):
        mu, lam = self._material()
        return self.get_stress_tensor(recording_step, mu, lam)

    def get_pressure_field(self, recording_step):
        mu, lam = self._material()
        return self.get_pressure(recording_step, mu, lam)

    def get_van_mises(self, recording_step):
        mu, lam = self._material()
        return self.get_van_mises_stress(recording_step, mu, lam)

    def get_growth_logistic(self, recording_step):
        """rho*c*(1-c) nodal field (reference l.1746-1752)."""
        c = self.get_concentration(recording_step)
        rho = getattr(self.params, "proliferation", getattr(self.params, "rho_WM", 0.0))
        if isinstance(rho, dict):
            sd = self.params._subdomains
            rho_c = sd.tissue_value_array(rho)[sd.cell_labels]
            rho = self.cell_to_node(rho_c)
        return np.asarray(forms.compute_growth_logistic(c, rho, 1.0))

    def _coupling_per_cell(self):
        k = getattr(self.params, "coupling", 0.0)
        from glimslib_tpu.core.params import TissueCoefficient

        if isinstance(k, TissueCoefficient):
            return np.asarray(k.per_cell())
        if isinstance(k, dict):
            sd = self.params._subdomains
            return sd.tissue_value_array(k)[sd.cell_labels]
        return np.asarray(k, dtype=np.float64)

    def get_growth_induced_strain(self, recording_step):
        c = self.get_concentration(recording_step)
        k = self._coupling_per_cell()
        cbar = np.asarray(self.kernels.cell_average(jnp.asarray(c)))
        return np.asarray(forms.compute_growth_induced_strain(cbar, k, self.dim))

    def get_growth_induced_jacobian(self, recording_step):
        gs = self.get_growth_induced_strain(recording_step)
        return np.asarray(
            forms.compute_growth_induced_jacobian(jnp.asarray(gs), self.dim)
        )

    def get_concentration_deformed(self, recording_step):
        """Concentration mapped to the deformed configuration
        (reference l.1779-1786)."""
        c = self.get_concentration(recording_step)
        u = jnp.asarray(self.get_displacement(recording_step))
        grad_u = self.kernels.cell_vector_gradient(u)
        k = jnp.asarray(self._coupling_per_cell())
        cbar = self.kernels.cell_average(jnp.asarray(c))
        return np.asarray(
            forms.compute_concentration_deformed(cbar, grad_u, k, self.dim)
        )

    # -- output (reference l.1827-1940) --------------------------------------

    def plot_all(self, deformed=False, selection=None, output_dir=None):
        from glimslib_tpu.visualisation import plotting as plott

        outdir = output_dir or self.output_dir
        os.makedirs(outdir, exist_ok=True)
        steps = selection or self.get_recording_steps()
        for rs in steps:
            mesh = self.deformed_mesh(rs) if deformed else self.mesh
            tag = "deformed" if deformed else "reference"
            c = self.get_concentration(rs)
            u = self.get_displacement(rs)
            plott.plot_scalar_field(
                mesh, c, path=os.path.join(outdir, f"conc_{tag}_{rs:04d}.png"),
                title=f"concentration step {rs}",
            )
            plott.plot_vector_field(
                mesh, u, path=os.path.join(outdir, f"disp_{tag}_{rs:04d}.png"),
                title=f"displacement step {rs}",
            )
        return outdir

    def plot_for_pub(self, deformed=True, selection=None, output_dir=None):
        """Publication-style overlay figures: concentration contours on the
        (optionally deformed) domain with displacement quivers
        (reference plot_for_pub, helper_classes.py:1857-1920)."""
        import matplotlib.pyplot as plt

        from glimslib_tpu.visualisation import helpers, plotting as plott

        outdir = output_dir or os.path.join(self.output_dir, "pub")
        os.makedirs(outdir, exist_ok=True)
        steps = selection or self.get_recording_steps()
        for rs in steps:
            mesh = self.deformed_mesh(rs) if deformed else self.mesh
            if mesh.dim != 2:
                continue
            fig, ax = plt.subplots(figsize=(6, 6))
            plott.plot_scalar_field(
                mesh, self.get_concentration(rs), ax=ax, cmap="inferno",
                colorbar=True, alpha=0.9,
            )
            plott.plot_vector_field(
                mesh, self.get_displacement(rs), ax=ax, color="w", alpha=0.6,
            )
            ax.set_axis_off()
            helpers.show_plot(
                os.path.join(outdir, f"pub_{rs:04d}.png"), fig
            )
        return outdir

    def save_all(self, save_method="vtk", output_dir=None, selection=None):
        """Re-export all recorded steps with derived fields
        (reference l.1922-1940)."""
        from glimslib_tpu.utils import vtk_utils

        outdir = output_dir or self.output_dir
        os.makedirs(outdir, exist_ok=True)
        mu, lam = self._material()
        series = []
        steps = selection or self.get_recording_steps()
        for rs in steps:
            c = self.get_concentration(rs)
            u = self.get_displacement(rs)
            vm = self.get_van_mises(rs)
            pr = self.get_pressure_field(rs)
            fname = os.path.join(outdir, f"postprocess_{rs:06d}.vtu")
            vtk_utils.write_vtu(
                fname,
                self.mesh.points,
                self.mesh.cells,
                point_data={
                    "concentration": c,
                    "displacement": u,
                    "displacement_norm": self.get_displacement_norm(rs),
                    "van_mises": self.cell_to_node(vm),
                    "pressure": self.cell_to_node(pr),
                    "jacobian": self.cell_to_node(self.get_total_jacobian(rs)),
                },
            )
            t = self.results.data.get_time_series("solution").get_time(rs)
            series.append((rs, t, os.path.basename(fname)))
        vtk_utils.write_pvd(os.path.join(outdir, "postprocess.pvd"), series)
        return outdir


class PostProcessTumorGrowthBrain(PostProcessTumorGrowth):
    """Per-tissue parameter mapping (reference l.1943-1972)."""

    TISSUE_KEYS = {"E": "E_%s", "poisson": "nu_%s"}

    def map_params(self):
        """Map E_*/nu_* scalars into per-tissue dicts for the generic
        postprocessor (reference map_params, l.1952-1972)."""
        p = self.params
        tissues = {"GM": "GM", "WM": "WM", "CSF": "CSF", "Ventricles": "VENT"}
        E = {name: getattr(p, f"E_{suffix}") for name, suffix in tissues.items()}
        nu = {name: getattr(p, f"nu_{suffix}") for name, suffix in tissues.items()}
        p.set_parameter("E", E)
        p.set_parameter("poisson", nu)

    def _material(self):
        p = self.params
        if not hasattr(p, "E"):
            self.map_params()
        return super()._material()


class Comparison:
    """Field-level diff of two simulations at shared recording steps
    (reference helper_classes.py:1975-2036) — the built-in parity harness."""

    def __init__(self, sim_a, sim_b=None, results_b=None):
        self.a = sim_a.results if hasattr(sim_a, "results") else sim_a
        self.b = (
            sim_b.results if (sim_b is not None and hasattr(sim_b, "results"))
            else (sim_b or results_b)
        )
        mesh = self.a.mesh
        self.kernels = P1Kernels(mesh)
        self.mesh = mesh

    def _shared_steps(self):
        sa = set(self.a.get_recording_steps())
        sb = set(self.b.get_recording_steps())
        return sorted(sa & sb)

    def errornorm(self, fa, fb):
        """L2 norm of the difference: sqrt((a-b)^T M (a-b)), matching
        fenics.errornorm for same-space fields."""
        d = jnp.asarray(np.asarray(fa, dtype=np.float64) - np.asarray(fb, np.float64))
        if d.ndim == 1:
            md = self.kernels.mass_residual(d)
        else:
            md = self.kernels.mass_vector_residual(d)
        return float(jnp.sqrt(jnp.sum(d * md)))

    def max_difference(self, fa, fb):
        return float(np.abs(np.asarray(fa) - np.asarray(fb)).max())

    def compare(self, subspace_names=None):
        """Per-step, per-subspace errornorm + max diff -> pandas DataFrame
        (reference compare(), l.2027-2035)."""
        import pandas as pd

        rows = []
        names = subspace_names or {0: "displacement", 1: "concentration"}
        for rs in self._shared_steps():
            fa = self.a.get_result(rs)
            fb = self.b.get_result(rs)
            row = {"recording_step": rs}
            for sid, nm in names.items():
                row[f"errornorm_{nm}"] = self.errornorm(fa[sid], fb[sid])
                row[f"maxdiff_{nm}"] = self.max_difference(fa[sid], fb[sid])
            rows.append(row)
        return pd.DataFrame(rows)
