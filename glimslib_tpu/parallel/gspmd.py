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
collectives").  Per-device memory and bandwidth scale as N/devices: the
operator planes, the CG vectors, and the scan carry are all pinned to the
device axis (Simulation._shard_nodes), so nothing node-sized is replicated
in the hot loop.

Non-divisible node counts: GSPMD shards an axis only when its size divides
the device count; pad the mesh with
:func:`glimslib_tpu.core.mesh.pad_mesh_nodes` before constructing the model
(padding nodes are unused → auto-masked zero-Dirichlet dofs, results on
real nodes are identical).

This module is the functional entry; the object API is
``sim.use_sharding(device_mesh, mode='nodes')`` followed by a normal
``sim.run()``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh as DeviceMesh


def shard_simulate(sim, n_steps, dt, device_mesh: DeviceMesh):
    """Jit the simulation's time loop with node-sharded inputs.

    Returns (simulate_fn, prepare) where ``prepare(theta, u0, c0)`` places
    the arrays with the right shardings.  Requires stencil mode (lattice
    mesh) and ``n_nodes % n_devices == 0`` (see pad_mesh_nodes).
    """
    n_dev = device_mesh.devices.size
    if sim.mesh.lattice_strides is None:
        raise ValueError("gspmd sharding requires a lattice mesh (stencil mode)")
    if sim.mesh.n_nodes % n_dev:
        raise ValueError(
            f"n_nodes={sim.mesh.n_nodes} not divisible by {n_dev} devices; "
            "pad the mesh with glimslib_tpu.core.mesh.pad_mesh_nodes(mesh, "
            f"{n_dev}) before constructing the model"
        )
    sim.use_sharding(device_mesh, mode="nodes")
    sh_u, sh_c = sim._node_shardings()
    from jax.sharding import NamedSharding, PartitionSpec as P

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
