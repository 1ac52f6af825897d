from glimslib_tpu.core.mesh import Mesh, rectangle_mesh, box_mesh, interval_mesh
from glimslib_tpu.core.elements import (
    P1Element,
    P2Element,
    simplex_quadrature,
)
from glimslib_tpu.core.functionspace import FunctionSpace, SubSpaces
from glimslib_tpu.core.subdomains import SubDomains
from glimslib_tpu.core.bcs import BoundaryConditions
from glimslib_tpu.core.params import Parameters
from glimslib_tpu.core.results import (
    TimeSeriesData,
    TimeSeriesMultiData,
    Results,
)

__all__ = [
    "Mesh",
    "rectangle_mesh",
    "box_mesh",
    "interval_mesh",
    "P1Element",
    "P2Element",
    "simplex_quadrature",
    "FunctionSpace",
    "SubSpaces",
    "SubDomains",
    "BoundaryConditions",
    "Parameters",
    "TimeSeriesData",
    "TimeSeriesMultiData",
    "Results",
]
