"""Results management: in-memory time series + persistent checkpoints.

Rebuild of reference ``helper_classes.py``:
- ``TimeSeriesDataTimePoint`` / ``TimeSeriesData`` / ``TimeSeriesMultiData``
  (l.1083-1308): in-memory series of solution fields keyed by recording
  step, with whole-series HDF5 save/load,
- ``Results`` (l.1312-1453): per-step persistence (VTK series / XDMF) and
  full-series HDF5 checkpoint consumed by ``reload_from_hdf5``
  (simulation_base.py:319-325).

The HDF5 layout stores the mesh once and each recorded step's subspace
fields under ``/series/<name>/step_XXXXX`` with ``time`` / ``time_step``
attributes — a single-file replacement for ``fenics.HDF5File`` usage at
helper_classes.py:1256-1308.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


class TimeSeriesDataTimePoint:
    """One recorded step (reference helper_classes.py:1083-1126)."""

    def __init__(self, time, time_step, recording_step, fields: Dict[int, np.ndarray]):
        self.time = float(time)
        self.time_step = int(time_step)
        self.recording_step = int(recording_step)
        self.fields = {k: np.array(v) for k, v in fields.items()}  # deep copy

    def get_field(self, subspace_id):
        return self.fields[subspace_id]


class TimeSeriesData:
    """Series of recorded steps for one named solution
    (reference helper_classes.py:1128-1254)."""

    def __init__(self, name="solution", functionspace=None):
        self.name = name
        self.functionspace = functionspace
        self.data: Dict[int, TimeSeriesDataTimePoint] = {}

    def add_observation(self, field_dict, time, time_step, recording_step, replace=False):
        if recording_step in self.data and not replace:
            logger.warning("recording step %d already exists", recording_step)
            return
        self.data[recording_step] = TimeSeriesDataTimePoint(
            time, time_step, recording_step, field_dict
        )

    def get_observation(self, recording_step) -> Optional[TimeSeriesDataTimePoint]:
        return self.data.get(recording_step)

    def get_most_recent_observation(self):
        if not self.data:
            return None
        return self.data[max(self.data)]

    def get_solution_function(self, recording_step, subspace_id=None):
        """Reference helper_classes.py:1159-1181: return a recorded field,
        whole mixed dict or one subspace."""
        obs = self.get_observation(recording_step)
        if obs is None:
            return None
        if subspace_id is None:
            return obs.fields
        return obs.fields[subspace_id]

    def get_recording_steps(self):
        return sorted(self.data.keys())

    def get_time(self, recording_step):
        obs = self.get_observation(recording_step)
        return obs.time if obs else None

    def __len__(self):
        return len(self.data)


class TimeSeriesMultiData:
    """Multiple named time series + whole-series HDF5 I/O
    (reference helper_classes.py:1256-1308)."""

    def __init__(self):
        self._series: Dict[str, TimeSeriesData] = {}

    def register_time_series(self, name, functionspace=None):
        if name not in self._series:
            self._series[name] = TimeSeriesData(name, functionspace)

    def get_time_series(self, name) -> Optional[TimeSeriesData]:
        return self._series.get(name)

    def get_all_time_series(self):
        return dict(self._series)

    def add_observation(self, name, field_dict, time, time_step, recording_step,
                        replace=False):
        self._series[name].add_observation(
            field_dict, time, time_step, recording_step, replace
        )

    def get_solution_function(self, name, recording_step, subspace_id=None):
        return self._series[name].get_solution_function(recording_step, subspace_id)

    # -- HDF5 ---------------------------------------------------------------

    def save_to_hdf5(self, path, mesh=None):
        import h5py

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with h5py.File(path, "w") as f:
            if mesh is not None:
                g = f.create_group("mesh")
                g.create_dataset("points", data=mesh.points)
                g.create_dataset("cells", data=mesh.cells)
            root = f.create_group("series")
            for name, series in self._series.items():
                gs = root.create_group(name)
                for rstep in series.get_recording_steps():
                    obs = series.get_observation(rstep)
                    gt = gs.create_group(f"step_{rstep:05d}")
                    gt.attrs["time"] = obs.time
                    gt.attrs["time_step"] = obs.time_step
                    gt.attrs["recording_step"] = obs.recording_step
                    for sid, arr in obs.fields.items():
                        gt.create_dataset(f"subspace_{sid}", data=arr)
        logger.info("saved time series to %s", path)

    def load_from_hdf5(self, path):
        import h5py

        with h5py.File(path, "r") as f:
            for name, gs in f["series"].items():
                self.register_time_series(name)
                for key in sorted(gs.keys()):
                    gt = gs[key]
                    fields = {}
                    for dname, dset in gt.items():
                        sid = int(dname.split("_")[1])
                        fields[sid] = np.asarray(dset)
                    self._series[name].add_observation(
                        fields,
                        float(gt.attrs["time"]),
                        int(gt.attrs["time_step"]),
                        int(gt.attrs["recording_step"]),
                        replace=True,
                    )

    # -- Orbax (TPU-ecosystem checkpointing) --------------------------------

    def save_to_orbax(self, path, mesh=None):
        """Whole-series checkpoint via Orbax (the JAX-ecosystem equivalent
        of the HDF5 series checkpoint, reference helper_classes.py:1256-1308
        — async-capable, sharding-aware storage used by TPU training
        stacks).  Layout: one PyTree
        {series: {name: {step_xxxxx: {time, time_step, recording_step,
        fields: {sid: array}}}}, mesh: {points, cells}}."""
        import orbax.checkpoint as ocp

        tree = {"series": {}}
        for name, series in self._series.items():
            st = {}
            for rstep in series.get_recording_steps():
                obs = series.get_observation(rstep)
                st[f"step_{rstep:05d}"] = {
                    "time": np.asarray(obs.time),
                    "time_step": np.asarray(obs.time_step),
                    "recording_step": np.asarray(obs.recording_step),
                    "fields": {
                        str(sid): np.asarray(arr)
                        for sid, arr in obs.fields.items()
                    },
                }
            tree["series"][name] = st
        if mesh is not None:
            tree["mesh"] = {"points": mesh.points, "cells": mesh.cells}
        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, tree, force=True)
        ckptr.wait_until_finished()
        logger.info("saved time series to orbax checkpoint %s", path)

    def load_from_orbax(self, path):
        """Restore a series checkpoint written by :meth:`save_to_orbax`."""
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        tree = ckptr.restore(os.path.abspath(path))
        for name, st in tree["series"].items():
            self.register_time_series(name)
            for key in sorted(st.keys()):
                rec = st[key]
                fields = {
                    int(sid): np.asarray(arr)
                    for sid, arr in rec["fields"].items()
                }
                self._series[name].add_observation(
                    fields,
                    float(rec["time"]),
                    int(rec["time_step"]),
                    int(rec["recording_step"]),
                    replace=True,
                )
        return tree.get("mesh")

    @staticmethod
    def read_mesh_hdf5(path):
        import h5py

        from glimslib_tpu.core.mesh import Mesh

        with h5py.File(path, "r") as f:
            if "mesh" not in f:
                return None
            return Mesh.from_arrays(f["mesh/points"][...], f["mesh/cells"][...])


class Results:
    """Owns the 'solution' time series and the on-disk output lifecycle
    (reference helper_classes.py:1312-1453)."""

    def __init__(self, functionspace, subdomains=None, output_dir="."):
        self._functionspace = functionspace
        self._subdomains = subdomains
        self.output_dir = output_dir
        self.data = TimeSeriesMultiData()
        self.data.register_time_series("solution", functionspace)
        self._vtk_series = []  # (recording_step, time, filename)

    @property
    def mesh(self):
        return self._functionspace.mesh

    def add_to_results(self, current_sim_time, time_step, recording_step, fields):
        """Record a solution (deep-copied), reference helper_classes.py:1336-1338."""
        fields = {k: np.asarray(v) for k, v in fields.items()}
        self.data.add_observation(
            "solution", fields, current_sim_time, time_step, recording_step,
            replace=True,
        )

    def get_result(self, recording_step):
        return self.data.get_solution_function("solution", recording_step)

    def get_recording_steps(self):
        return self.data.get_time_series("solution").get_recording_steps()

    # -- per-step persistence (helper_classes.py:1360-1409) -----------------

    def save_solution_start(self, method="xdmf", clear_all=False):
        if clear_all and os.path.isdir(self.output_dir):
            import shutil

            shutil.rmtree(self.output_dir, ignore_errors=True)
        if method is not None:
            os.makedirs(self.output_dir, exist_ok=True)
        self._vtk_series = []

    def save_solution(self, recording_step, time, fields=None, method="xdmf"):
        if method is None:
            return
        if fields is None:
            fields = self.get_result(recording_step)
        if fields is None:
            return
        names = self._functionspace.get_subspace_names()
        n_pts = self.mesh.n_nodes
        point_data = {}
        for sid, arr in fields.items():
            arr = np.asarray(arr)
            if arr.ndim == 1 and len(arr) > n_pts:
                # P2 field: extract the vertex-dof values (equal to the
                # function's vertex values) via the shared interleaved
                # layout (ops/p2.py p2_dof_layout)
                from glimslib_tpu.ops.p2 import p2_dof_layout

                _, rank, _ = p2_dof_layout(self.mesh)
                arr = arr[rank[:n_pts]]
            point_data[names.get(sid, f"subspace_{sid}")] = arr
        if method == "vtk":
            from glimslib_tpu.utils import vtk_utils

            fname = os.path.join(
                self.output_dir, f"solution_{recording_step:06d}.vtu"
            )
            vtk_utils.write_vtu(fname, self.mesh.points, self.mesh.cells, point_data)
            self._vtk_series.append((recording_step, time, os.path.basename(fname)))
        elif method == "xdmf":
            from glimslib_tpu.utils import vtk_utils

            fname = os.path.join(self.output_dir, "solution.h5")
            vtk_utils.append_xdmf_step(
                os.path.join(self.output_dir, "solution.xdmf"),
                fname,
                self.mesh,
                point_data,
                recording_step,
                time,
            )
        else:
            raise ValueError(f"unknown save method {method!r}")

    def save_solution_end(self, method="xdmf"):
        if method == "vtk" and self._vtk_series:
            from glimslib_tpu.utils import vtk_utils

            vtk_utils.write_pvd(
                os.path.join(self.output_dir, "solution.pvd"), self._vtk_series
            )

    def save_label_function(self):
        """Reference helper_classes.py:1406-1409."""
        if self._subdomains is None or self._subdomains.label_function is None:
            return
        from glimslib_tpu.utils import vtk_utils

        os.makedirs(self.output_dir, exist_ok=True)
        vtk_utils.write_vtu(
            os.path.join(self.output_dir, "label_function.vtu"),
            self.mesh.points,
            self.mesh.cells,
            {"label": np.asarray(self._subdomains.label_function)},
            cell_data={"subdomains": np.asarray(self._subdomains.cell_labels)},
        )

    # -- whole-series checkpoint (helper_classes.py:1441-1445) --------------

    def save_solution_hdf5(self, path=None):
        path = path or os.path.join(self.output_dir, "solution_timeseries.h5")
        self.data.save_to_hdf5(path, mesh=self.mesh)
        return path

    def load_solution_hdf5(self, path):
        self.data.load_from_hdf5(path)

    def save_solution_orbax(self, path=None):
        """Orbax-based whole-series checkpoint (alternative to HDF5; see
        TimeSeriesMultiData.save_to_orbax)."""
        path = path or os.path.join(self.output_dir, "solution_timeseries.ocp")
        self.data.save_to_orbax(path, mesh=self.mesh)
        return path

    def load_solution_orbax(self, path):
        self.data.load_from_orbax(path)
