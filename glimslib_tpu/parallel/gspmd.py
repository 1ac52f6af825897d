"""GSPMD node-sharded execution of the stencil-mode time loop.

The shard-mapped kernels (parallel/shard.py) replicate node vectors and
psum element contributions — robust for any unstructured mesh.  On lattice
meshes running the offset-stencil operators (ops/stencil.py) there is a
strictly better option: *shard the node vectors themselves* over the device
mesh and let XLA's GSPMD partitioner insert the halo communication.  Every
stencil application is `jnp.roll` + multiply-add, and GSPMD lowers a roll
of a sharded array to collective-permutes of just the halo slices — the
hand-written MPI ghost exchange of the reference (SURVEY.md §2.3), derived
automatically ("pick a mesh, annotate shardings, let XLA insert
collectives").

Constraint: the node count must divide evenly by the device count (GSPMD
sharding of dim 0); lattice meshes can always be generated to satisfy this.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import NamedSharding, PartitionSpec as P


def shard_simulate(sim, n_steps, dt, device_mesh: DeviceMesh):
    """Jit the simulation's time loop with node-sharded inputs.

    Returns (simulate_fn, prepare) where ``prepare(theta, u0, c0)`` places
    the arrays with the right shardings.  Requires stencil mode (lattice
    mesh) and ``n_nodes %% n_devices == 0``.
    """
    n_dev = device_mesh.devices.size
    if sim.mesh.lattice_strides is None:
        raise ValueError("gspmd sharding requires a lattice mesh (stencil mode)")
    if sim.mesh.n_nodes % n_dev:
        raise ValueError(
            f"n_nodes={sim.mesh.n_nodes} not divisible by {n_dev} devices; "
            "choose a lattice resolution with n_nodes % n_devices == 0"
        )
    axis = device_mesh.axis_names[0]
    sh_u = NamedSharding(device_mesh, P(axis, None))
    sh_c = NamedSharding(device_mesh, P(axis))
    rep = NamedSharding(device_mesh, P())

    simulate = sim.build_simulate_fn(n_steps, dt)
    jitted = jax.jit(simulate, in_shardings=(None, sh_u, sh_c))

    def prepare(theta, u0, c0):
        return (
            jax.device_put(theta, rep),
            jax.device_put(u0, sh_u),
            jax.device_put(c0, sh_c),
        )

    return jitted, prepare
