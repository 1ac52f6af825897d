"""Reference-compatible module path: ``glimslib.simulation`` ->
``glimslib_tpu.simulation`` (models live in :mod:`glimslib_tpu.models`)."""

from glimslib_tpu import config
from glimslib_tpu.models.base import Simulation as FenicsSimulation
from glimslib_tpu.models.tumor_growth import TumorGrowth
from glimslib_tpu.models.tumor_growth_brain import TumorGrowthBrain

__all__ = ["config", "FenicsSimulation", "TumorGrowth", "TumorGrowthBrain"]
