"""Simulation parameter management.

Rebuild of reference ``helper_classes.py`` ``Parameters`` (l.910-1077):

- required/optional parameter declaration + validation (l.988-1026),
- dict-valued parameters (per-tissue maps like ``{'GM': 0.02, 'WM': 0.05}``)
  automatically become heterogeneous coefficients (l.1028-1035) — here a
  per-tissue lookup array + per-cell gather instead of a
  ``DiscontinuousScalar`` Expression, so they remain differentiable,
- initial-value expressions per subspace + projected IV function
  (l.974-986),
- time-dependent parameters as callables ``f(t)`` or ``f(x, t)`` (analogue
  of ``Expression.t`` updates, l.1055-1077).
"""

from __future__ import annotations

import logging
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class Parameters:
    def __init__(self, functionspace, subdomains, time_dependent=False):
        self._functionspace = functionspace
        self._subdomains = subdomains
        self.time_dependent = time_dependent
        self.required_params: List[str] = []
        self.optional_params: List[str] = []
        self._param_names: List[str] = []
        self._iv_expressions = None

    # -- declaration (helper_classes.py:988-1026) ---------------------------

    def define_required_params(self, params: List[str]):
        self.required_params = list(params)
        if self.time_dependent:
            for p in ("sim_time", "sim_time_step"):
                if p not in self.required_params:
                    self.required_params.append(p)

    def define_optional_params(self, params: List[str]):
        self.optional_params = list(params)

    def init_parameters(self, param_dict: Dict):
        missing = [p for p in self.required_params if p not in param_dict]
        if missing:
            raise ValueError(f"missing required parameters: {missing}")
        unknown = [
            p
            for p in param_dict
            if p not in self.required_params and p not in self.optional_params
        ]
        if unknown:
            raise ValueError(f"unknown parameters: {unknown}")
        for name, value in param_dict.items():
            self.set_parameter(name, value)

    def set_parameter(self, name: str, value):
        """Dict values become per-tissue coefficient specs
        (helper_classes.py:1028-1035)."""
        if isinstance(value, dict):
            lookup = self._subdomains.tissue_value_array(value)
            value = TissueCoefficient(
                lookup, self._subdomains.cell_labels, tissue_map=value
            )
        setattr(self, name, value)
        if name not in self._param_names:
            self._param_names.append(name)

    def get_names(self):
        return list(self._param_names)

    def as_dict(self):
        return {n: getattr(self, n) for n in self._param_names}

    # -- coefficient access --------------------------------------------------

    def cell_coefficient(self, name: str):
        """Per-cell coefficient array (or scalar) for assembly kernels."""
        v = getattr(self, name)
        if isinstance(v, TissueCoefficient):
            return v.per_cell()
        return v

    # -- initial values (helper_classes.py:974-986) --------------------------

    def set_initial_value_expressions(self, iv_expression: Dict[int, object]):
        self._iv_expressions = iv_expression

    def create_initial_value_function(self):
        """L2-project the IV expressions onto their subspaces (reference
        projects, does not interpolate: helper_classes.py:983-986)."""
        if self._iv_expressions is None:
            raise ValueError("no initial value expressions set")
        return self._functionspace.project_over_space(self._iv_expressions)

    # -- time updates (helper_classes.py:1055-1077) --------------------------

    def time_update_parameters(self, time):
        """No-op: time-dependent parameters are callables evaluated at solve
        time inside the jitted step.  Kept for reference API parity."""


class TissueCoefficient:
    """Heterogeneous per-tissue coefficient: lookup-by-label gather.

    Differentiable replacement for ``DiscontinuousScalar``
    (helper_classes.py:47-58): ``per_cell()`` is ``values[cell_labels]`` and
    gradients flow to ``values``."""

    def __init__(self, values, cell_labels, tissue_map=None):
        self.values = jnp.asarray(values)
        self.cell_labels = jnp.asarray(np.asarray(cell_labels, dtype=np.int32))
        self.tissue_map = tissue_map or {}

    def per_cell(self):
        return jnp.take(self.values, self.cell_labels)

    def with_values(self, values):
        return TissueCoefficient(values, self.cell_labels, self.tissue_map)
