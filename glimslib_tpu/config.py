"""Global configuration.

Mirrors the role of reference ``glimslib/config.py`` (output paths, external
tool locations) and the ``USE_ADJOINT`` import-time switch
(reference ``glimslib/config.py:24``, ``glimslib/fenics_local.py:3-9``).

In the rebuild there is no import-time backend switch: everything is always
differentiable (JAX), so ``USE_ADJOINT`` is retained only as a no-op
compatibility flag.
"""

import os

# -- paths ------------------------------------------------------------------
base_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
output_dir = os.environ.get("GLIMS_OUTPUT_DIR", os.path.join(base_dir, "output"))
output_dir_simulation_tmp = os.path.join(output_dir, "simulation_tmp")
output_dir_testing = os.path.join(output_dir, "testing")
test_data_dir = os.environ.get(
    "GLIMS_TEST_DATA_DIR", os.path.join(base_dir, "test_data")
)

# -- external tool locations (reference config.py:19-21) --------------------
# These binaries are optional; the drivers in utils/ gate on their presence
# and fall back to first-party implementations where possible.
path_to_meshtool_bin = os.environ.get("GLIMS_MESHTOOL_BIN", "meshtool")
path_to_meshtool_xsd = os.environ.get("GLIMS_MESHTOOL_XSD", "")
path_to_ants_bin = os.environ.get("GLIMS_ANTS_BIN_DIR", "")

# -- adjoint compatibility flag (reference config.py:24) --------------------
# The reference selects plain FEniCS vs FEniCS+dolfin-adjoint at import time.
# Here autodiff is always available; the flag exists for API compatibility.
USE_ADJOINT = False

# -- numerics ---------------------------------------------------------------
# Default floating dtype for device computation.  Tests/parity runs use
# float64 (on CPU); TPU benchmarks use float32 (f64 is emulated on TPU).
default_dtype = os.environ.get("GLIMS_DTYPE", "float64")

# Solver operating-point profile (GLIMS_PROFILE, read at MODEL BUILD time
# so tests/tools can flip it per construction):
#   'accurate' (default) — the rebuild's published accuracy point:
#     elasticity cg_rtol 1e-7 (f32) with mixed-precision refinement auto
#     (measured 3.2e-6 plain / 1.6e-7 refined on the north-star configs,
#     tools/tpu_accuracy.py).
#   'reference' — the REFERENCE's operating point: PETSc KSP default
#     rtol 1e-5 (the reference's SNES solves use default Krylov
#     tolerances, simulation_tumor_growth.py:126-140), i.e. elasticity
#     cg_rtol 1e-5 + Dembo-Eisenstat-Steihaug forcing 1e-3 on the
#     concentration block's inner CG, refinement off.  Newton still
#     converges the exact nonlinear residual to newton_rtol — inner-solve
#     looseness changes the contraction rate, never the converged state;
#     the elasticity block (LINEAR, so its rtol directly bounds solution
#     error) lands exactly where the reference's does.  Speed/accuracy at
#     both points are published in docs/numerics.md.
profile_default = os.environ.get("GLIMS_PROFILE", "accurate")


def resolve_profile():
    """Current solver profile ('accurate' | 'reference'); env wins so the
    flag can be flipped per model construction."""
    p = os.environ.get("GLIMS_PROFILE", profile_default).strip().lower()
    if p not in ("accurate", "reference"):
        raise ValueError(f"GLIMS_PROFILE={p!r}: use 'accurate' or 'reference'")
    return p


# Chebyshev polynomial preconditioning degree for the per-step CG solves
# (solvers/cg.py make_chebyshev_precond; 0/1 = Jacobi/block-Jacobi alone).
# Overridable per model via ``sim.step_config``.
precond_degree = int(os.environ.get("GLIMS_PRECOND_DEGREE", "0"))

# Mixed-precision iterative refinement for f32 runs (f64 Newton residuals +
# one elasticity correction pass; StepConfig.refine_f64).  Recovers ~1e-7
# accuracy on TPU f32 at a few emulated-f64 residual evals per step.
# Three states: "auto" (default — ON for f32 models whenever jax x64 is
# enabled, so the 1e-6 north-star parity holds out of the box), "1", "0".
refine_f64 = os.environ.get("GLIMS_REFINE_F64", "auto")


def resolve_refine_f64(dtype=None):
    """Resolve the refine_f64 tri-state for a model's working dtype.

    Explicit GLIMS_REFINE_F64=0/1 wins; "auto" enables refinement exactly
    when it can help: an f32 working dtype with jax x64 available for the
    f64 defect residuals (without x64 the f64 kernels silently downcast and
    refinement is a no-op that still costs residual evals)."""
    if refine_f64 in ("0", "1"):
        return refine_f64 == "1"
    import jax
    import jax.numpy as jnp

    if dtype is not None and jnp.dtype(dtype) != jnp.float32:
        return False
    return bool(jax.config.read("jax_enable_x64"))


def enable_x64():
    """Enable 64-bit computation in JAX (needed for 1e-6-level parity)."""
    import jax

    jax.config.update("jax_enable_x64", True)


def get_default_dtype():
    import numpy as np

    return np.dtype(default_dtype)
