"""Shard-mapped assembly kernels: mesh-parallel residual evaluation.

The MPI-parallel assembly/solve of the reference (DOLFIN ghost updates +
PETSc allreduce per Newton iteration, SURVEY.md §3.4) becomes:

  - cells sharded over a 1-D ``jax.sharding.Mesh`` axis (ICI on hardware),
  - each device gathers nodal values for its cell block, runs the dense
    per-cell element math (shared SoA kernels from ops/assembly.py),
    pull-gathers contributions into a full-length node vector (static
    incidence tables; TPU scatters are ~40x slower than row-gathers),
  - one ``psum`` over the mesh axis accumulates inter-device node
    contributions (the halo exchange), yielding replicated residuals.

CG/Newton then run on replicated node vectors: every device executes the
same reductions — SPMD exactly like the reference's ``mpirun`` model, with
XLA collectives riding ICI instead of MPI messages.  For node vectors that
must scale PER DEVICE, use the owned/ghost node-sharded mode instead
(parallel/nodeshard.py, ``use_sharding(mode='nodes')`` on unstructured
meshes): partitioned vectors with a static halo exchange.  This replicated
mode remains the zero-bookkeeping fallback for small problems.

``ShardedP1Kernels`` implements the same method surface as
:class:`~glimslib_tpu.ops.assembly.P1Kernels`, so any model becomes
multi-chip by swapping its kernels (``Simulation.use_sharding``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import NamedSharding, PartitionSpec as P

from glimslib_tpu.ops.assembly import (
    elasticity_diag_contrib,
    elasticity_element_contrib,
    rd_diag_contrib,
    rd_element_contrib,
)

try:  # jax>=0.6 stable name
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def make_device_mesh(n_devices: Optional[int] = None, axis_name: str = "mesh_x"):
    """1-D device mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return DeviceMesh(np.array(devs[:n]), (axis_name,))


class ShardedP1Kernels:
    """Drop-in sharded replacement for P1Kernels (same method names).

    Per-device block arrays use the same SoA layout as P1Kernels (cell axis
    last); coefficients are materialized per-cell and sharded with the cell
    blocks; nodal vectors are replicated."""

    def __init__(self, mesh, device_mesh: DeviceMesh, dtype=None):
        from glimslib_tpu.parallel.partition import partition_cells

        if dtype is None:
            dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32

        self.dim = mesh.dim
        self.n_nodes = mesh.n_nodes
        self.n_cells = mesh.n_cells
        self.npe = mesh.dim + 1
        self.dtype = dtype
        self.device_mesh = device_mesh
        self.axis = device_mesh.axis_names[0]
        n_parts = device_mesh.devices.size
        self.part = partition_cells(mesh, n_parts)

        import math

        self._m0 = 1.0 / ((self.dim + 1) * (self.dim + 2))
        self._t0 = math.factorial(self.dim) / math.factorial(self.dim + 3)

        # SoA per-part arrays (leading axis = parts, cell axis last)
        cells_T = np.ascontiguousarray(self.part.cells.transpose(0, 2, 1))
        grads_T = np.ascontiguousarray(self.part.grads.transpose(0, 2, 3, 1))
        per = cells_T.shape[-1]
        # per-part COMPACT pull tables (see ops/assembly.py ScatterPlan):
        # node accumulation as gathers, not segment_sum — TPU scatters are
        # ~40x slower than row-gathers.  Each part accumulates only into
        # the ~n/P (+halo) nodes its cells actually touch (rows of the
        # compact table), then expands to the full node vector with one
        # n-row placement gather — O(touched*K + n) per device instead of
        # O(n*K), so per-device scatter work scales down with the device
        # count.
        from glimslib_tpu.ops.assembly import make_scatter_plan

        n_entries = self.npe * per
        touched = [np.unique(cells_T[p].ravel()) for p in range(n_parts)]
        plans = []
        for p in range(n_parts):
            local_ids = np.searchsorted(touched[p], cells_T[p].ravel())
            plans.append(make_scatter_plan(local_ids, len(touched[p])))
        T = max(len(t) for t in touched)
        K = max(pl.pull_table.shape[1] for pl in plans)
        pull = np.full((n_parts, T, K), n_entries, dtype=np.int32)
        g2c = np.zeros((n_parts, mesh.n_nodes), dtype=np.int32)
        for p, pl in enumerate(plans):
            t = pl.pull_table.copy()
            # re-point each part's sentinel to the shared one (n_entries)
            t[t == pl.n_entries] = n_entries
            pull[p, : t.shape[0], : t.shape[1]] = t
            # placement: global node -> compact row + 1 (0 = untouched)
            g2c[p, touched[p]] = np.arange(len(touched[p])) + 1

        self._shard = NamedSharding(device_mesh, P(self.axis))
        put = lambda a: jax.device_put(jnp.asarray(a), self._shard)
        self.cells_T = put(cells_T)  # (P, npe, C)
        self.vol = put(jnp.asarray(self.part.vol, dtype=dtype))  # (P, C)
        self.grads_T = put(jnp.asarray(grads_T, dtype=dtype))  # (P, npe, d, C)
        self.pull_table = put(pull)  # (P, T, K) compact
        self.g2c = put(g2c)  # (P, n_nodes)
        self._cell_perm = jnp.asarray(self.part.cell_perm)

    # -- plumbing ------------------------------------------------------------

    def _cellwise(self, value):
        """Coefficient (scalar or (nc,)) -> blocked (P, C), traceable."""
        v = jnp.asarray(value, self.dtype)
        if v.ndim == 0:
            v = jnp.broadcast_to(v, (self.n_cells,))
        return jnp.take(v, self._cell_perm, axis=0)

    def _run(self, local, cell_args, rep_args):
        n_cell = 5 + len(cell_args)
        in_specs = (P(self.axis),) * n_cell + (P(),) * len(rep_args)
        fn = shard_map(
            local, mesh=self.device_mesh, in_specs=in_specs, out_specs=P()
        )
        return fn(
            self.cells_T, self.vol, self.grads_T, self.pull_table, self.g2c,
            *cell_args, *rep_args,
        )

    @staticmethod
    def _local_scatter(contrib_flat, pull, g2c, n_nodes, axis):
        """Compact pull-gather accumulation + placement + all-reduce.

        Accumulates into the part's touched-node rows (shared core with
        ops/assembly.py scatter), then expands to the full node vector via
        the g2c placement gather (row 0 = untouched -> zero)."""
        from glimslib_tpu.ops.assembly import pull_accumulate

        compact = pull_accumulate(pull.ravel(), pull.shape[0], contrib_flat)
        was_1d = compact.ndim == 1
        if was_1d:
            compact = jnp.stack([compact, compact], axis=-1)
        comp0 = jnp.pad(compact, [(1, 0)] + [(0, 0)] * (compact.ndim - 1))
        out = jnp.take(comp0, g2c, axis=0)
        if was_1d:
            out = out[..., 0]
        return jax.lax.psum(out, axis)

    @staticmethod
    def _gather_rows(pack, cells):
        """Replicated (n_nodes, w) fields -> (npe, C, w) per-entry rows."""
        return jnp.take(pack, cells.ravel(), axis=0).reshape(
            cells.shape[0], cells.shape[1], pack.shape[1]
        )

    # -- kernels -------------------------------------------------------------

    def rd_residual(self, c, c_prev, D, rho, dt, source=0.0, conc_max=1.0):
        axis, n_nodes, dim = self.axis, self.n_nodes, self.dim
        m0, t0 = self._m0, self._t0
        scatter = self._local_scatter

        gather_rows = self._gather_rows

        def local(cells, vol, grads, pull, g2c, D, rho, src, c, c_prev, dt):
            cells, vol, grads = cells[0], vol[0], grads[0]
            pull, g2c = pull[0], g2c[0]
            D, rho, src = D[0], rho[0], src[0]
            ge = gather_rows(jnp.stack([c, c_prev], axis=-1), cells)
            ce, cpe = ge[..., 0], ge[..., 1]  # (npe, C)
            contrib = rd_element_contrib(
                ce, cpe, grads, vol, D, rho, dt, src, conc_max, m0, t0, dim
            )
            return scatter(contrib.reshape(-1), pull, g2c, n_nodes, axis)

        return self._run(
            local,
            cell_args=(self._cellwise(D), self._cellwise(rho),
                       self._cellwise(source)),
            rep_args=(c, c_prev, jnp.asarray(dt, self.dtype)),
        )

    def elasticity_residual(self, u, c, mu, lam, coupling, body_force=None):
        axis, n_nodes, dim = self.axis, self.n_nodes, self.dim
        scatter = self._local_scatter
        bf = (
            jnp.zeros((dim,), self.dtype)
            if body_force is None
            else jnp.broadcast_to(jnp.asarray(body_force, self.dtype), (dim,))
        )

        gather_rows = self._gather_rows

        def local(cells, vol, grads, pull, g2c, mu, lam, coupling, u, c, bf):
            cells, vol, grads = cells[0], vol[0], grads[0]
            pull, g2c = pull[0], g2c[0]
            mu, lam, coupling = mu[0], lam[0], coupling[0]
            # one width-(d+1) row-gather fetches u AND c per entry
            ge = gather_rows(jnp.concatenate([u, c[:, None]], axis=1), cells)
            ue = jnp.transpose(ge[..., :dim], (2, 0, 1))  # (d, npe, C)
            c_int = ge[..., dim].mean(axis=0) * vol
            contrib = elasticity_element_contrib(
                ue, c_int, grads, vol, mu, lam, coupling, bf[:, None], dim
            )
            ent = jnp.moveaxis(contrib, 1, -1).reshape(-1, dim)
            return scatter(ent, pull, g2c, n_nodes, axis)

        return self._run(
            local,
            cell_args=(self._cellwise(mu), self._cellwise(lam),
                       self._cellwise(coupling)),
            rep_args=(u, c, bf),
        )

    def rd_mass_stiffness_diag(self, D, rho, dt):
        axis, n_nodes, dim = self.axis, self.n_nodes, self.dim
        m0 = self._m0
        scatter = self._local_scatter

        def local(cells, vol, grads, pull, g2c, D, dt):
            cells, vol, grads = cells[0], vol[0], grads[0]
            pull, g2c = pull[0], g2c[0]
            D = D[0]
            contrib = rd_diag_contrib(grads, vol, D, dt, m0, dim)
            return scatter(contrib.reshape(-1), pull, g2c, n_nodes, axis)

        return self._run(
            local, cell_args=(self._cellwise(D),),
            rep_args=(jnp.asarray(dt, self.dtype),),
        )

    def elasticity_diag(self, mu, lam):
        axis, n_nodes, dim = self.axis, self.n_nodes, self.dim
        scatter = self._local_scatter

        def local(cells, vol, grads, pull, g2c, mu, lam):
            cells, vol, grads = cells[0], vol[0], grads[0]
            pull, g2c = pull[0], g2c[0]
            mu, lam = mu[0], lam[0]
            contrib = elasticity_diag_contrib(grads, vol, mu, lam)
            ent = jnp.moveaxis(contrib, 1, -1).reshape(-1, dim)
            return scatter(ent, pull, g2c, n_nodes, axis)

        return self._run(
            local, cell_args=(self._cellwise(mu), self._cellwise(lam)),
            rep_args=(),
        )

    def mass_residual(self, c):
        axis, n_nodes = self.axis, self.n_nodes
        m0 = self._m0
        scatter = self._local_scatter

        def local(cells, vol, grads, pull, g2c, c):
            cells, vol, pull, g2c = cells[0], vol[0], pull[0], g2c[0]
            ce = jnp.take(c, cells, axis=0)
            contrib = vol * (m0 * (jnp.sum(ce, axis=0) + ce))
            return scatter(contrib.reshape(-1), pull, g2c, n_nodes, axis)

        return self._run(local, cell_args=(), rep_args=(c,))

    def mass_vector_residual(self, u):
        axis, n_nodes, dim = self.axis, self.n_nodes, self.dim
        m0 = self._m0
        scatter = self._local_scatter
        gather_rows = self._gather_rows

        def local(cells, vol, grads, pull, g2c, u):
            cells, vol, pull, g2c = cells[0], vol[0], pull[0], g2c[0]
            ue = gather_rows(u, cells)  # (npe, C, d)
            contrib = vol[None, :, None] * m0 * (
                jnp.sum(ue, axis=0, keepdims=True) + ue
            )
            return scatter(contrib.reshape(-1, dim), pull, g2c, n_nodes, axis)

        return self._run(local, cell_args=(), rep_args=(u,))

    def integrate_p1(self, c):
        axis = self.axis

        def local(cells, vol, grads, pull, g2c, c):
            cells, vol = cells[0], vol[0]
            ce = jnp.take(c, cells, axis=0)
            return jax.lax.psum(jnp.sum(vol * ce.mean(axis=0)), axis)

        return self._run(local, cell_args=(), rep_args=(c,))
