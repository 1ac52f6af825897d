"""TumorGrowthBrain with quadratic (P2) concentration.

Rebuild of reference ``simulation/simulation_tumor_growth_brain_quad.py``:
the per-tissue brain model over a P1-vector x P2-scalar mixed space — the
model the reference's optimization workflow drives
(image_based_optimization.py:26).  Combines the per-tissue coefficient
wiring of :class:`~glimslib_tpu.models.tumor_growth_brain.TumorGrowthBrain`
with the P2 kernels of :mod:`glimslib_tpu.ops.p2`, and carries the same
``run_for_adjoint_{2,3,4,5}params`` tied-parameter runners
(brain_quad.py:131-210).
"""

from __future__ import annotations

from glimslib_tpu.models.tumor_growth_brain import TumorGrowthBrain as _BrainP1
from glimslib_tpu.models.tumor_growth_quad import TumorGrowth as _QuadMixin


class TumorGrowthBrain(_BrainP1):
    CONCENTRATION_DEGREE = 2

    # function space + residuals from the quad mixin
    _setup_functionspace = _QuadMixin._setup_functionspace
    rd_residual = _QuadMixin.rd_residual
    el_residual = _QuadMixin.el_residual
    rd_diag = _QuadMixin.rd_diag
    concentration_mass_action = _QuadMixin.concentration_mass_action
