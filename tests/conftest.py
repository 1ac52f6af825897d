"""Test configuration: force CPU with 8 virtual devices and 64-bit floats.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(``xla_force_host_platform_device_count``), standing in for real TPU chips —
the analogue of the reference's single-host ``mpirun -np 4`` testing
(reference README.md:155-183).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon site hook pins JAX_PLATFORMS before conftest runs; the config
# update below wins regardless
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# single-CPU sandbox: persistent compile cache makes repeat runs fast
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
