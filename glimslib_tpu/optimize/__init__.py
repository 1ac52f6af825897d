from glimslib_tpu.optimize.adjoint import InverseProblem, thresh
from glimslib_tpu.optimize.lbfgsb import minimize_lbfgsb, OptimizationProgress

__all__ = ["InverseProblem", "thresh", "minimize_lbfgsb", "OptimizationProgress"]
