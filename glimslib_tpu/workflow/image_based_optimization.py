"""Image-based inverse-problem workflow (base class).

Rebuild of reference ``optimization_workflow/image_based_optimization.py``
(1472 LoC, ``ImageBasedOptimizationBase``): the end-to-end pipeline

    image -> 2D slice / 3D mesh -> forward sim -> target fields ->
    adjoint optimization -> optimized re-simulation -> analysis

with the same staged directory layout (l.74-82), pickled resumable state
(l.152-183), logger setup (l.126-150), Gaussian seed IV (l.377-386), tissue
map {0: outside, 1: CSF, 2: GM, 3: WM, 4: Ventricles} (l.391-394),
clamped-everywhere Dirichlet (l.396-401), tanh-thresholded target fields at
T2=0.12/T1=0.80 (l.52-53, 1057-1132), and COM/volume analysis per step per
subdomain (l.1279-1401).

Differences by design (TPU-native):
- the forward model is :class:`~glimslib_tpu.models.tumor_growth_brain.TumorGrowthBrain`
  with P1 fields; the adjoint is native JAX autodiff
  (:mod:`glimslib_tpu.optimize`) instead of dolfin-adjoint tape replay;
- ANTs/MeshTool are optional: first-party fallbacks (demons displacement
  estimation, structured tet meshing) keep every stage runnable.
"""

from __future__ import annotations

import logging
import os
import pickle
from datetime import datetime
from typing import Dict, Optional

import numpy as np

from glimslib_tpu.models.tumor_growth_brain import TumorGrowthBrain
from glimslib_tpu.optimize.adjoint import (
    CONC_THRESHOLD_LEVELS,
    InverseProblem,
    param_map_for_type,
    thresh,
)
from glimslib_tpu.utils import data_io as dio
from glimslib_tpu.utils import file_utils as fu
from glimslib_tpu.utils import image_registration_utils as reg
from glimslib_tpu.utils.image_io import Image, read_image, write_image
from glimslib_tpu.workflow.path_io import PathIO

# tissue id -> name map (reference l.391-394)
TISSUE_MAP = {0: "outside", 1: "CSF", 2: "GM", 3: "WM", 4: "Ventricles"}


class BoundaryAll:
    def inside(self, x, on_boundary):
        return on_boundary


class ImageBasedOptimizationBase:
    """Pipeline state machine (reference l.37-183)."""

    # staged processing dirs (reference l.74-82)
    steps_sub_path_map = {
        "domain_prep": "01_domain_preparation",
        "forward_sim": "02_forward_simulation",
        "target_fields": "03_target_fields",
        "inverse_sim": "02_inverse_simulation",
        "optimized_sim": "02_optimized_simulation",
        "summary": "summary",
        "comparison": "comparison",
    }

    def __init__(self, base_dir, path_to_labels_atlas=None,
                 path_to_image_atlas=None, image_z_slice=None, plot=False,
                 model="linear"):
        # model: 'linear' (P1 concentration) or 'quad' (P2, the model the
        # reference workflow drives: image_based_optimization.py:26)
        self.model = model
        self.base_dir = base_dir
        self.data = PathIO(base_dir)
        self._setup_paths()
        self._setup_loggers()
        self.conc_threshold_levels = dict(CONC_THRESHOLD_LEVELS)
        self.measures: Dict = {}
        self.path_to_image_atlas_orig = path_to_image_atlas
        self.path_to_labels_atlas_orig = path_to_labels_atlas
        self.image_z_slice = image_z_slice
        self.plot = plot
        self.dim = 2 if image_z_slice is not None else 3
        self.sims: Dict[str, TumorGrowthBrain] = {}
        if path_to_labels_atlas:
            self._save_state()

    # -- paths / loggers / state (reference l.72-183) ------------------------

    def _setup_paths(self):
        for key, sub in self.steps_sub_path_map.items():
            path = os.path.join(self.base_dir, sub)
            setattr(self, f"path_{key}", path)
        self.path_to_state = os.path.join(self.base_dir, "state.pkl")
        self.path_to_summary = os.path.join(self.path_summary, "measures.pkl")
        fu.ensure_dir_exists(self.base_dir)

    def _setup_loggers(self):
        self.logger = logging.getLogger(type(self).__name__)
        fu.ensure_dir_exists(self.base_dir)
        logfile = os.path.join(
            self.base_dir, f"logger_{datetime.now():%Y-%m-%d_%H-%M-%S}.log"
        )
        fh = logging.FileHandler(logfile)
        fh.setLevel(logging.INFO)
        fh.setFormatter(logging.Formatter("%(asctime)s %(name)s %(message)s"))
        self.logger.addHandler(fh)

    _STATE_ATTRS = [
        "model",
        "path_to_image_atlas_orig", "path_to_labels_atlas_orig",
        "image_z_slice", "dim", "conc_threshold_levels", "measures",
        "params_forward", "params_inverse", "model_params_optimized",
        "path_mesh_hdf5", "path_labelfunction",
        "path_conc_T2", "path_conc_T1", "path_displacement_reconstructed",
        "path_parameters_optimized", "path_optimized_conc",
        "path_optimized_disp",
    ]

    def _save_state(self):
        state = {
            k: getattr(self, k) for k in self._STATE_ATTRS if hasattr(self, k)
        }
        with open(self.path_to_state, "wb") as f:
            pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)

    def _load_state(self):
        with open(self.path_to_state, "rb") as f:
            state = pickle.load(f)
        for k, v in state.items():
            setattr(self, k, v)

    def reload_state(self):
        """Resume a pipeline in a fresh process (reference l.867-874)."""
        self._load_state()
        if hasattr(self, "path_mesh_hdf5") and os.path.exists(self.path_mesh_hdf5):
            self._load_domain()

    # -- simulation reloads (reference l.824-865) ----------------------------

    def _reload_sim(self, name, pipeline_params, output_path):
        """Rebuild a simulation from pickled parameters and reload its
        recorded solution series from HDF5."""
        if name == "optimized":
            sim = self.init_optimized_problem()
        else:
            sim = self._init_problem(
                name,
                pipeline_params["seed_position"],
                pipeline_params["sim_params"],
                pipeline_params["model_params_varying"],
                pipeline_params["model_params_fixed"],
            )
        series = os.path.join(output_path, "solution_timeseries.h5")
        if os.path.exists(series):
            sim.reload_from_hdf5(series, output_dir=output_path)
        return sim

    def reload_forward_sim(self):
        return self._reload_sim("forward", self.params_forward,
                                self.path_forward_sim)

    def reload_inverse_sim(self):
        return self._reload_sim("inverse", self.params_inverse,
                                self.path_inverse_sim)

    def reload_optimized_sim(self):
        return self._reload_sim("optimized", self.params_inverse,
                                self.path_optimized_sim)

    # -- domain preparation (reference l.187-356) ----------------------------

    def mesh_domain(self):
        if self.dim == 2:
            self._extract_2d_domain()
        else:
            self._mesh_3d_domain()
        self._save_state()

    def _extract_2d_domain(self):
        """3D labelmap -> z-slice -> pixel-lattice mesh + label function ->
        HDF5 (reference l.187-249)."""
        self.logger.info("-- extracting 2D domain at z=%s", self.image_z_slice)
        mesh, labels = dio.get_labelfunction_from_image(
            self.path_to_labels_atlas_orig, self.image_z_slice
        )
        self.mesh = mesh
        self.labelfunction = labels
        self.path_mesh_hdf5 = self.data.create_fenics_path(
            processing=self.steps_sub_path_map["domain_prep"],
            datasource="domain", dim=self.dim,
        )
        from glimslib_tpu.core.subdomains import SubDomains

        sd = SubDomains(mesh)
        sd.setup_subdomains(label_function=labels)
        dio.save_mesh_hdf5(mesh, self.path_mesh_hdf5, subdomains=sd.cell_labels)
        self.path_labelfunction = self.data.create_fenics_path(
            processing=self.steps_sub_path_map["domain_prep"],
            datasource="domain", content="labels", dim=self.dim,
        )
        dio.save_function_mesh(labels, self.path_labelfunction, mesh=mesh)

    def _mesh_3d_domain(self):
        """3D labelmap -> tet mesh (MeshTool when available, first-party
        fallback otherwise) -> HDF5 (reference l.259-279, 336-351)."""
        self.logger.info("-- meshing 3D domain")
        from glimslib_tpu.utils import meshing

        img = read_image(self.path_to_labels_atlas_orig)
        # full-lattice keeps the offset-stencil fast path available
        mesh, cell_labels = meshing.mesh_image_labels(img, full_lattice=True)
        self.mesh = mesh
        # nodal label function from cell labels (majority vote via averaging)
        from glimslib_tpu.utils.vtk_utils import cell_to_point_data

        self.labelfunction = np.rint(
            cell_to_point_data(mesh.n_nodes, mesh.cells, cell_labels)
        )
        self.path_mesh_hdf5 = self.data.create_fenics_path(
            processing=self.steps_sub_path_map["domain_prep"],
            datasource="domain", dim=self.dim,
        )
        dio.save_mesh_hdf5(mesh, self.path_mesh_hdf5, subdomains=cell_labels)
        self.path_labelfunction = self.data.create_fenics_path(
            processing=self.steps_sub_path_map["domain_prep"],
            datasource="domain", content="labels", dim=self.dim,
        )
        dio.save_function_mesh(self.labelfunction, self.path_labelfunction,
                               mesh=mesh)

    def _load_domain(self):
        mesh, subdomains, _ = dio.read_mesh_hdf5(self.path_mesh_hdf5)
        self.mesh = mesh
        lab, _, _, _ = dio.load_function_mesh(self.path_labelfunction)
        self.labelfunction = lab

    # -- problem init (reference l.377-422) ----------------------------------

    def _init_problem(self, name, seed_position, sim_params: Dict,
                      model_params_varying: Dict, model_params_fixed: Dict,
                      output_dir=None):
        """Build a TumorGrowthBrain on the prepared domain with a Gaussian
        seed IV (reference l.377-422)."""
        if self.model == "quad":
            from glimslib_tpu.models.tumor_growth_brain_quad import (
                TumorGrowthBrain as BrainQuad,
            )

            sim = BrainQuad(self.mesh)
        else:
            sim = TumorGrowthBrain(self.mesh)
        sim.setup_global_parameters(
            label_function=self.labelfunction,
            domain_names=TISSUE_MAP,
            boundaries={"boundary_all": BoundaryAll()},
            dirichlet_bcs={
                "clamped_boundary": {
                    "bc_value": np.zeros(self.mesh.dim),
                    "named_boundary": "boundary_all",
                    "subspace_id": 0,
                }
            },
        )
        seed = np.asarray(seed_position, dtype=np.float64)
        width = sim_params.get("seed_width", 1.0)

        def iv_conc(x):
            return np.exp(-((x - seed) ** 2).sum(axis=1) / (2 * width**2))

        params = dict(model_params_fixed)
        params.update(model_params_varying)
        sim.setup_model_parameters(
            iv_expression={0: np.zeros(self.mesh.dim), 1: iv_conc},
            sim_time=sim_params["sim_time"],
            sim_time_step=sim_params["sim_time_step"],
            **params,
        )
        self.sims[name] = sim
        return sim

    # -- forward simulation (reference l.483-564) ----------------------------

    def init_forward_problem(self, seed_position, model_params_varying,
                             model_params_fixed, sim_params):
        self.params_forward = {
            "seed_position": list(np.asarray(seed_position, float)),
            "model_params_varying": dict(model_params_varying),
            "model_params_fixed": dict(model_params_fixed),
            "sim_params": dict(sim_params),
        }
        self._save_state()
        return self._init_problem(
            "forward", seed_position, sim_params, model_params_varying,
            model_params_fixed,
        )

    def run_forward_sim(self, plot=None, save_method=None):
        sim = self.sims["forward"]
        sim.run(
            keep_nth=1, save_method=save_method,
            plot=self.plot if plot is None else plot,
            output_dir=self.path_forward_sim,
        )
        self.measures["forward_final_max_conc"] = float(
            np.max(sim.solution[1])
        )
        self._save_state()
        return sim

    # -- target fields (reference l.876-1163) --------------------------------

    def create_thresholded_conc_fields(self, conc_field, subdir="target_fields"):
        """tanh-thresholded concentration target fields at T2/T1 levels
        (reference l.1057-1132), saved to HDF5."""
        c = np.asarray(conc_field, dtype=np.float64)
        cT2 = np.asarray(thresh(c, self.conc_threshold_levels["T2"]))
        cT1 = np.asarray(thresh(c, self.conc_threshold_levels["T1"]))
        self.path_conc_T2 = self.data.create_fenics_path(
            processing=self.steps_sub_path_map[subdir],
            datasource="simulation", content="conc", frame="deformed",
            extension="h5", datatype="fenics", domain="full",
        ).replace("conc", "conc-T2")
        self.path_conc_T1 = self.path_conc_T2.replace("T2", "T1")
        dio.save_function_mesh(cT2, self.path_conc_T2, mesh=self.mesh)
        dio.save_function_mesh(cT1, self.path_conc_T1, mesh=self.mesh)
        self._save_state()
        return cT2, cT1

    def save_displacement_target(self, disp_field, subdir="target_fields"):
        self.path_displacement_reconstructed = self.data.create_fenics_path(
            processing=self.steps_sub_path_map[subdir],
            datasource="registration", content="disp", frame="def2ref",
            extension="h5", datatype="fenics", domain="full",
        )
        dio.save_function_mesh(
            np.asarray(disp_field), self.path_displacement_reconstructed,
            mesh=self.mesh,
        )
        self._save_state()

    def _create_deformed_image(self, labelmap_img: Image, disp_field,
                               out_prefix):
        """Warp the source image by the simulated displacement and write it +
        the displacement channels (reference l.876-941).  Integer-valued
        sources (labelmaps) are rounded back to labels; float sources (T1
        intensities, the reference's registration input) keep their
        values."""
        disp_on_grid = self._sample_field_on_image_grid(disp_field, labelmap_img)
        warped = reg.apply_displacement(
            labelmap_img, labelmap_img, -disp_on_grid
        )  # pull-back with inverse ~ -u for small deformations
        path_img = f"{out_prefix}_labels_deformed.mha"
        src = np.asarray(labelmap_img.data)
        is_labels = np.issubdtype(src.dtype, np.integer) or np.allclose(
            src, np.rint(src)
        )
        if is_labels:
            data = np.rint(warped.data).astype(np.int16)
        else:
            data = np.asarray(warped.data, dtype=np.float32)
        write_image(path_img, Image(data, warped.origin, warped.spacing))
        path_disp = f"{out_prefix}_displacement.mha"
        write_image(path_disp, Image(
            disp_on_grid.astype(np.float32), labelmap_img.origin,
            labelmap_img.spacing, is_vector=True,
        ))
        return path_img, path_disp

    def _sample_field_on_image_grid(self, nodal_field, image: Image):
        from glimslib_tpu.utils.vtk_utils import resample_to_image

        dim = self.mesh.dim
        shape_xyz = image.size[:dim]
        origin = image.origin[:dim]
        spacing = image.spacing[:dim]
        out = resample_to_image(
            self.mesh.points, self.mesh.cells, {"f": np.asarray(nodal_field)},
            origin, spacing, shape_xyz,
        )["f"]
        axes = tuple(reversed(range(dim)))
        if out.ndim > dim:
            return np.transpose(out, axes + (dim,))
        return np.transpose(out, axes)

    def _reconstruct_deformation_field(self, reference_img_path,
                                       deformed_img_path, out_prefix):
        """Estimate the displacement from image pairs — ANTs SyN when
        installed, demons fallback otherwise (reference l.943-978) — and
        convert it to a nodal mesh function."""
        prefix = reg.register_ants(
            reference_img_path, deformed_img_path, out_prefix,
            registration_type="Syn", image_ext="mha", dim=self.dim,
        )
        warp = read_image(f"{prefix}1Warp.mha")
        disp_nodal = dio.create_fenics_function_from_image(warp, self.mesh)
        return disp_nodal

    # -- inverse problem (reference l.565-822) -------------------------------

    def init_inverse_problem(self, seed_position, model_params_varying,
                             sim_params, model_params_fixed=None,
                             optimization_type=5, target_weights=None, **kw):
        self.params_inverse = {
            "seed_position": list(np.asarray(seed_position, float)),
            "model_params_varying": dict(model_params_varying),
            "model_params_fixed": dict(
                model_params_fixed
                if model_params_fixed is not None
                else self.params_forward["model_params_fixed"]
            ),
            "sim_params": dict(sim_params),
            "optimization_type": optimization_type,
            # per-target misfit multipliers (e.g. down-weight 'disp' when
            # the displacement target is registration-reconstructed)
            "target_weights": dict(target_weights or {}),
        }
        self._save_state()
        return self._init_problem(
            "inverse", seed_position, sim_params,
            self.params_inverse["model_params_varying"],
            self.params_inverse["model_params_fixed"],
        )

    def _load_target_fields(self):
        cT2, _, _, _ = dio.load_function_mesh(self.path_conc_T2)
        cT1, _, _, _ = dio.load_function_mesh(self.path_conc_T1)
        disp, _, _, _ = dio.load_function_mesh(
            self.path_displacement_reconstructed
        )
        return {"conc_T2": cT2, "conc_T1": cT1, "disp": disp}

    def run_inverse_problem(self, opt_params=None):
        """Dispatch by optimization type (reference l.770-793)."""
        optimization_type = self.params_inverse["optimization_type"]
        params_names, update_fn = param_map_for_type(optimization_type)
        params_init = [
            self.params_inverse["model_params_varying"][n] for n in params_names
        ]
        return self.run_inverse_problem_n_params(
            params_init, params_names, update_fn, opt_params=opt_params
        )

    def run_inverse_problem_n_params(self, params_init_values, params_names,
                                     update_fn, opt_params=None):
        """The adjoint optimization core (reference l.660-767)."""
        sim = self.sims["inverse"]
        targets = self._load_target_fields()
        ip = InverseProblem(
            sim, params_names, targets, update_fn=update_fn,
            threshold_levels=self.conc_threshold_levels,
            target_weights=self.params_inverse.get("target_weights"),
        )
        self.logger.info("== Start Optimization")
        x_opt, progress, res = ip.minimize(
            np.asarray(params_init_values, dtype=np.float64),
            opt_params=opt_params,
        )
        self.model_params_optimized = dict(zip(params_names, x_opt))
        # persist like the reference (l.736-762)
        self.path_parameters_optimized = self.data.create_params_path(
            processing=self.steps_sub_path_map["inverse_sim"],
            datasource="optimization",
        )
        with open(self.path_parameters_optimized, "wb") as f:
            pickle.dump(self.model_params_optimized, f,
                        protocol=pickle.HIGHEST_PROTOCOL)
        pkl = self.data.create_params_path(
            processing=self.steps_sub_path_map["inverse_sim"],
            datasource="optimization_progress",
        )
        xls = pkl.replace(".pkl", ".xls")
        self.optimization_progress = progress.save(path_pkl=pkl, path_xls=xls)
        self.measures["optimization_success"] = bool(res.success)
        self.measures["optimization_nit"] = int(res.nit)
        self.measures["optimization_fun"] = float(res.fun)
        self.measures["total_time_optimization_seconds"] = (
            progress.total_time_seconds
        )
        self.measures["number_iterations_optimization"] = (
            progress.number_iterations
        )
        self._save_state()
        return self.model_params_optimized

    # -- optimized re-simulation (reference l.517-612) -----------------------

    def init_optimized_problem(self):
        params_opt = dict(self.params_inverse["model_params_varying"])
        _, update_fn = param_map_for_type(
            self.params_inverse["optimization_type"]
        )
        names, _ = param_map_for_type(self.params_inverse["optimization_type"])
        v = np.array([self.model_params_optimized[n] for n in names])
        params_opt.update(update_fn(v))
        return self._init_problem(
            "optimized",
            self.params_inverse["seed_position"],
            self.params_inverse["sim_params"],
            params_opt,
            self.params_inverse["model_params_fixed"],
        )

    def run_optimized_sim(self, plot=None, save_method=None):
        sim = self.sims["optimized"]
        sim.run(
            keep_nth=1, save_method=save_method,
            plot=self.plot if plot is None else plot,
            output_dir=self.path_optimized_sim,
        )
        # save the final concentration/displacement fields like the
        # reference (l.584-596) — consumed by compute_com_all
        self.path_optimized_conc = self.data.create_fenics_path(
            processing=self.steps_sub_path_map["optimized_sim"],
            datasource="simulation", content="conc", frame="reference",
            extension="h5", domain="full",
        )
        self.path_optimized_disp = self.path_optimized_conc.replace(
            "conc", "disp"
        )
        conc = np.asarray(sim.solution[1])
        if hasattr(sim, "p2"):
            conc = np.asarray(sim.p2.vertex_part(conc))
        dio.save_function_mesh(conc, self.path_optimized_conc, mesh=self.mesh)
        dio.save_function_mesh(np.asarray(sim.solution[0]),
                               self.path_optimized_disp, mesh=self.mesh)
        self._save_state()
        return sim

    # -- analysis (reference l.1241-1430) ------------------------------------

    @staticmethod
    def _xls_or_csv(df, path_xls):
        """Persist a DataFrame to xls, falling back to csv when no xls
        engine is installed (same policy as the optimizer progress frames)."""
        try:
            df.to_excel(path_xls)
        except Exception:
            df.to_csv(os.path.splitext(path_xls)[0] + ".csv")

    @staticmethod
    def _conc_kernels(sim, field):
        """Kernels matching the dof layout of ``field``: the P2 kernels for
        quad-model concentration vectors, the P1 kernels otherwise."""
        p2 = getattr(sim, "p2", None)
        if p2 is not None and len(np.asarray(field)) == p2.n_dofs:
            return p2
        return sim.kernels

    def _cell_integrals(self, sim, field):
        """Per-cell integrals ∫_e f dx of a nodal field, (n_cells,)."""
        import jax.numpy as jnp

        kern = self._conc_kernels(sim, field)
        return np.asarray(
            kern.cell_integral(jnp.asarray(np.asarray(field, np.float64)))
        )

    def compute_volume(self, sim, field, cell_mask=None):
        """∫ f dx over the full domain or a subdomain cell mask (reference
        compute_volume / dx(i) measures, l.1403-1413)."""
        ci = self._cell_integrals(sim, field)
        return float(ci.sum() if cell_mask is None else ci[cell_mask].sum())

    def compute_com(self, sim, field, cell_mask=None):
        """Centre of mass [∫ x_a f dx / ∫ f dx]; NaN components when the
        masked volume vanishes (reference compute_com, l.1415-1430)."""
        f = np.asarray(field, np.float64)
        kern = self._conc_kernels(sim, f)
        coords = np.asarray(getattr(kern, "dof_coords", sim.mesh.points))
        vol = self.compute_volume(sim, f, cell_mask)
        com = []
        for a in range(sim.mesh.dim):
            if vol > 0:
                ci = self._cell_integrals(sim, f * coords[:, a])
                num = ci.sum() if cell_mask is None else ci[cell_mask].sum()
                com.append(float(num) / vol)
            else:
                com.append(float("nan"))
        return com

    def compute_from_conc_for_each_time_step(self, threshold=None,
                                             problem_type="forward",
                                             computation="volume"):
        """Per-recorded-step, per-tissue-subdomain tumor ``volume`` or
        ``com`` of the threshold indicator (c >= threshold), in the
        reference configuration (reference l.1336-1401).

        Columns: ``sim_time_step``, ``all`` (or ``all_0..all_{d-1}`` for
        COM), then one column (or d columns) per tissue name, lowercased —
        matching the reference frame's scheme.  Saved to
        ``<sim dir>/{computation}_{threshold}.pkl`` (+ xls/csv).
        """
        import pandas as pd

        if not threshold:
            threshold = self.conc_threshold_levels["T2"]
        if problem_type not in self.sims:
            self.logger.warning(
                "Cannot compute '%s' for '%s': no such simulation instance",
                computation, problem_type,
            )
            return None
        sim = self.sims[problem_type]
        if getattr(sim, "results", None) is None:
            # e.g. the inverse sim: run_for_adjoint records nothing
            # (reference simulation_tumor_growth.py:142-155 runs with
            # saving/plotting off)
            self.logger.warning(
                "Cannot compute '%s' for '%s': no recorded results",
                computation, problem_type,
            )
            return None
        base_path = getattr(self, f"path_{problem_type}_sim")
        masks = [("all", None)] + [
            (name.lower(), sim.subdomains.cell_mask(tid))
            for tid, name in sim.subdomains.tissue_id_name_map.items()
        ]
        rows = []
        for step in sim.results.get_recording_steps():
            c = np.asarray(sim.results.get_result(step)[1], np.float64)
            # hard indicator at the dofs; the reference projects
            # fenics.conditional(ge(conc, threshold)) (l.1358-1360)
            q = (c >= threshold).astype(np.float64)
            row = {"sim_time_step": step}
            if computation == "volume":
                ci = self._cell_integrals(sim, q)
                for name, mask in masks:
                    row[name] = float(
                        ci.sum() if mask is None else ci[mask].sum()
                    )
            elif computation == "com":
                for name, mask in masks:
                    for a, x in enumerate(self.compute_com(sim, q, mask)):
                        row[f"{name}_{a}"] = x
            else:
                self.logger.warning("Cannot compute '%s' -- undefined",
                                    computation)
                return None
            rows.append(row)
        results = pd.DataFrame(rows)
        fu.ensure_dir_exists(base_path)
        save_base = os.path.join(base_path, f"{computation}_{threshold}")
        results.to_pickle(save_base + ".pkl")
        self._xls_or_csv(results, save_base + ".xls")
        return results

    def compute_volume_thresholded(self):
        """Volumes of the saved T2/T1 target fields -> measures dict
        (reference l.1262-1277)."""
        sim = self.sims.get("inverse") or self.sims.get("forward")
        if sim is None:
            self.logger.warning("Cannot compute volume: no simulation instance")
            return
        vol_dict = {
            "volume_threshold_T2_target": getattr(self, "path_conc_T2", None),
            "volume_threshold_T1_target": getattr(self, "path_conc_T1", None),
        }
        for name, path in vol_dict.items():
            if path and os.path.exists(path):
                conc, _, _, _ = dio.load_function_mesh(path)
                self.measures[name] = self.compute_volume(sim, conc)
            else:
                self.logger.warning(
                    "Cannot compute volume: '%s' does not exist", path
                )
        self._save_state()

    def compute_com_all(self, conc_dict=None):
        """COMs of the target fields and the optimized final concentration
        -> measures dict as ``com_{i}_{name}`` (reference l.1279-1304)."""
        sim = self.sims.get("inverse") or self.sims.get("forward")
        if sim is None:
            self.logger.warning("Cannot compute com: no simulation instance")
            return
        field_dict = {
            "threshold_T2_target": getattr(self, "path_conc_T2", None),
            "threshold_T1_target": getattr(self, "path_conc_T1", None),
            "inverse": getattr(self, "path_optimized_conc", None),
        }
        if conc_dict is not None:
            field_dict.update(conc_dict)
        for name, path in field_dict.items():
            if path and os.path.exists(path):
                conc, _, _, _ = dio.load_function_mesh(path)
                for i, coord in enumerate(self.compute_com(sim, conc)):
                    self.measures[f"com_{i}_{name}"] = coord
            else:
                self.logger.warning("Cannot compute COM: '%s' does not exist",
                                    path)
        self._save_state()

    def post_process(self, sim_list=None, threshold_list=None):
        """Full analysis stage (reference post_process, l.1306-1333):
        target-field volumes/COMs into the measures dict, then per-step
        per-subdomain volume/COM frames for every (simulation, threshold)
        pair, merged on ``sim_time_step`` with columns renamed to
        ``{problem_type}_{measure}_{threshold}_{name}`` and saved to
        ``<base_dir>/{volume,com}.pkl`` (+ xls/csv)."""
        import itertools

        import pandas as pd

        if sim_list is None:
            sim_list = [n for n in ("forward", "inverse", "optimized")
                        if n in self.sims]
        if threshold_list is None:
            threshold_list = [self.conc_threshold_levels["T2"],
                              self.conc_threshold_levels["T1"]]
        self.compute_volume_thresholded()
        self.compute_com_all()
        frames = {}
        for measure in ("volume", "com"):
            results_df = pd.DataFrame()
            for problem_type, threshold in itertools.product(
                    sim_list, threshold_list):
                tmp = self.compute_from_conc_for_each_time_step(
                    threshold=threshold, problem_type=problem_type,
                    computation=measure,
                )
                if tmp is None:
                    continue
                tmp = tmp.rename(columns={
                    n: "_".join([problem_type, measure, str(threshold), n])
                    for n in tmp.columns if n != "sim_time_step"
                })
                results_df = tmp if results_df.empty else pd.merge(
                    results_df, tmp, how="left", on="sim_time_step"
                )
            path = os.path.join(self.base_dir, measure + ".pkl")
            results_df.to_pickle(path)
            self._xls_or_csv(results_df,
                             os.path.join(self.base_dir, measure + ".xls"))
            frames[measure] = results_df
        self._save_state()
        return frames

    def compute_volume_com_per_step(self, sim_name="forward"):
        """Convenience frame (back-compat): global T2-threshold volume +
        unthresholded-concentration COM per recorded step.  The
        reference-parity per-subdomain frames are produced by
        :meth:`post_process` / :meth:`compute_from_conc_for_each_time_step`."""
        import pandas as pd

        sim = self.sims[sim_name]
        rows = []
        for rs in sim.results.get_recording_steps():
            c = np.asarray(sim.results.get_result(rs)[1], np.float64)
            thr = (c > self.conc_threshold_levels["T2"]).astype(np.float64)
            row = {"recording_step": rs,
                   "volume_T2": self.compute_volume(sim, thr)}
            for a, x in enumerate(self.compute_com(sim, c)):
                row[f"com_{'xyz'[a]}"] = x
            rows.append(row)
        return pd.DataFrame(rows)

    def write_analysis_summary(self, add_info=None):
        """Persist the measures dict (reference l.1241-1260)."""
        if add_info:
            self.measures.update(add_info)
        fu.ensure_dir_exists(self.path_summary)
        with open(self.path_to_summary, "wb") as f:
            pickle.dump(self.measures, f, protocol=pickle.HIGHEST_PROTOCOL)
        return self.path_to_summary
