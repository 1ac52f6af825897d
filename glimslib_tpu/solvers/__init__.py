from glimslib_tpu.solvers.cg import pcg
from glimslib_tpu.solvers.newton import newton

__all__ = ["pcg", "newton"]
