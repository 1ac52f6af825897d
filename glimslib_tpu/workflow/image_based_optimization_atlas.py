"""Atlas workflow: synthetic ground truth from the atlas's own forward sim.

Rebuild of reference ``optimization_workflow/image_based_optimization_atlas.py``
(``ImageBasedOptimizationAtlas``): the forward simulation on the atlas
produces the synthetic "patient"; target fields come from that forward sim
(thresholded concentration + displacement reconstructed through the image
pipeline); ``compare_original_optimized`` reports field errornorms and
parameter relative errors (reference atlas.py:80-151).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from glimslib_tpu.utils import file_utils as fu
from glimslib_tpu.utils.image_io import read_image
from glimslib_tpu.workflow.image_based_optimization import (
    ImageBasedOptimizationBase,
)


class ImageBasedOptimizationAtlas(ImageBasedOptimizationBase):
    # -- pipeline stages (reference atlas.py:15-43) --------------------------

    def prepare_domain(self):
        self.mesh_domain()

    def create_target_fields(self, reconstruct_displacement=False):
        """Targets from the atlas forward simulation (reference atlas.py:20-43):
        thresholded concentration at the final step + displacement field.

        ``reconstruct_displacement=True`` exercises the full image loop:
        warp the labelmap by the simulated displacement, re-estimate the
        displacement by registration (ANTs or demons fallback), and use the
        reconstruction as the target (reference l.876-978).  Default uses
        the simulated displacement directly (exact target)."""
        sim = self.sims["forward"]
        c_final = np.asarray(sim.solution[1])
        u_final = np.asarray(sim.solution[0])
        self.create_thresholded_conc_fields(c_final)
        if reconstruct_displacement:
            # the reference warps and registers the textured T1 image
            # (atlas.py:23-38, path_to_domain_image_main); fall back to the
            # labelmap when no intensity atlas was provided
            src_path = (self.path_to_image_atlas_orig
                        or self.path_to_labels_atlas_orig)
            src_img = read_image(src_path)
            if self.dim == 2:
                src_img = src_img.slice_z(self.image_z_slice)
            prefix = os.path.join(
                self.path_target_fields, "atlas"
            )
            fu.ensure_dir_exists(self.path_target_fields)
            path_def, path_disp = self._create_deformed_image(
                src_img, u_final, prefix
            )
            ref_path = os.path.join(self.path_target_fields, "labels_ref.mha")
            from glimslib_tpu.utils.image_io import Image, write_image

            write_image(ref_path, src_img.astype(np.float32))
            # fixed = reference (undeformed) image, moving = deformed image
            # (reference atlas.py:36-38): registering deformed->reference
            # recovers +u on the reference grid
            disp_nodal = self._reconstruct_deformation_field(
                ref_path, path_def, prefix + "_reg"
            )
            self.save_displacement_target(disp_nodal)
        else:
            self.save_displacement_target(u_final)
        self._save_state()

    def compare_displacement_field_simulated_registered(self):
        """Errornorm of the registration-reconstructed displacement vs the
        simulated truth -> measures dict (reference atlas.py:45-78)."""
        import jax.numpy as jnp

        from glimslib_tpu.utils import data_io as dio

        sim = self.sims["forward"]
        disp_sim = np.asarray(sim.solution[0])
        disp_est, _, _, _ = dio.load_function_mesh(
            self.path_displacement_reconstructed
        )
        diff = jnp.asarray(disp_sim - np.asarray(disp_est))
        err = float(jnp.sqrt(jnp.sum(
            diff * sim.displacement_mass_action(diff)
        )))
        self.measures["errornorm_displacement_simulated_vs_registered"] = err
        self._save_state()
        return err

    # -- comparison (reference atlas.py:80-151) ------------------------------

    def compare_original_optimized(self) -> Dict:
        """Errornorms forward-vs-optimized at shared steps + parameter
        relative errors (reference atlas.py:80-137)."""
        from glimslib_tpu.postprocess import Comparison

        comp = Comparison(self.sims["forward"], self.sims["optimized"])
        df = comp.compare()
        self.comparison_df = df
        fu.ensure_dir_exists(self.path_comparison)
        df.to_pickle(os.path.join(self.path_comparison, "comparison.pkl"))

        rel_errors = {}
        true_params = self.params_forward["model_params_varying"]
        for name, opt_val in self.model_params_optimized.items():
            if name in true_params:
                true = float(true_params[name])
                rel_errors[name] = abs(opt_val - true) / max(abs(true), 1e-30)
        self.measures["param_relative_errors"] = rel_errors
        for sid_name in ("concentration", "displacement"):
            col = f"errornorm_{sid_name}"
            if col in df:
                self.measures[f"final_errornorm_{sid_name}"] = float(
                    df[col].iloc[-1]
                )
        self._save_state()
        return {"field_errors": df, "param_relative_errors": rel_errors}
