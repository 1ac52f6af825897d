"""Shared configuration for the example scripts (the rebuild's analogue of
the reference's ``test_cases/*/testing_config.py``).

Examples write to ``output/examples/<name>`` and generate the synthetic
brain atlas on first use (the reference's bundled SRI24 data is git-LFS and
unavailable here)."""

import os

import numpy as np

# Platform/precision selection must happen before any jax computation; the
# axon site hook pins JAX_PLATFORMS, so use the config API:
#   GLIMS_PLATFORM=cpu GLIMS_X64=1 python examples/<script>.py
import jax

if os.environ.get("GLIMS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GLIMS_PLATFORM"])
if os.environ.get("GLIMS_X64") == "1":
    jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

from glimslib_tpu import config

output_path = os.path.join(config.output_dir, "examples")

TISSUE_MAP = {0: "outside", 1: "CSF", 2: "GM", 3: "WM", 4: "Ventricles"}

BRAIN_PARAMS_FIXED = dict(
    E_GM=3e3, E_WM=3e3, E_CSF=1e3, E_VENT=1e3,
    nu_GM=0.45, nu_WM=0.45, nu_CSF=0.45, nu_VENT=0.3,
)
BRAIN_PARAMS_VARYING = dict(
    D_WM=0.1, D_GM=0.02, rho_WM=0.1, rho_GM=0.02, coupling=0.15
)


class BoundaryAll:
    def inside(self, x, on_boundary):
        return on_boundary


def example_out(name):
    path = os.path.join(output_path, name)
    os.makedirs(path, exist_ok=True)
    return path


def synthetic_atlas_path(tmp_dir=None, nx=64, ny=64, nz=24):
    """Write (once) and return the synthetic 3D brain labelmap path."""
    from glimslib_tpu.utils.image_io import Image, write_mha
    from glimslib_tpu.utils.synthetic import brain_labelmap_3d

    d = tmp_dir or example_out("data")
    p = os.path.join(d, f"synthetic_brain_atlas_{nx}x{ny}x{nz}.mha")
    if not os.path.exists(p):
        lab = brain_labelmap_3d(nx, ny, nz)
        write_mha(p, Image(lab, origin=(0, 0, 0), spacing=(1, 1, 1)))
    return p


def gaussian_iv(center, width=1.0):
    c = np.asarray(center, dtype=np.float64)

    def f(x):
        return np.exp(-((x - c) ** 2).sum(axis=1) / (2 * width**2))

    return f
