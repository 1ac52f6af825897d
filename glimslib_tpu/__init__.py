"""GlimSLib-TPU: a TPU-native framework for PDE-based spatial tumor-growth
simulation and image-based inverse problems.

This is a ground-up re-design of the capabilities of GlimSLib
(reference: danielabler/glimslib) for TPU hardware:

- The FEniCS/DOLFIN FEM stack (reference ``glimslib/fenics_local.py``) is
  replaced by a matrix-free unstructured tri/tet FEM core in JAX
  (:mod:`glimslib_tpu.core`, :mod:`glimslib_tpu.ops`), with element
  gather/compute/scatter running on the MXU/VPU and hot paths as Pallas
  kernels.
- PETSc/SNES Newton solves (reference ``simulation/simulation_tumor_growth.py:126-140``)
  become block-triangular Newton-Krylov with matrix-free preconditioned CG
  under ``jax.lax.while_loop`` (:mod:`glimslib_tpu.solvers`).
- dolfin-adjoint reverse-mode taping (reference
  ``optimization_workflow/image_based_optimization.py:660-767``) becomes
  native ``jax.grad`` through a ``lax.scan`` time loop with
  implicit-function-theorem ``custom_vjp`` through the Newton solve
  (:mod:`glimslib_tpu.optimize`).
- MPI domain decomposition (reference README.md:142-183) becomes mesh
  sharding over a ``jax.sharding.Mesh`` with ``shard_map`` and XLA
  collectives over ICI (:mod:`glimslib_tpu.parallel`).
"""

from glimslib_tpu import config

__version__ = "0.1.0"

__all__ = ["config", "__version__"]
