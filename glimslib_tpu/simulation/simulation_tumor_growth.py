"""Reference-compatible module path for ``glimslib/simulation/
simulation_tumor_growth.py``."""

from glimslib_tpu.models.tumor_growth import TumorGrowth  # noqa: F401
