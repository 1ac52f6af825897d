from glimslib_tpu.models.base import Simulation
from glimslib_tpu.models.tumor_growth import TumorGrowth
from glimslib_tpu.models.tumor_growth_brain import TumorGrowthBrain

__all__ = ["Simulation", "TumorGrowth", "TumorGrowthBrain"]
