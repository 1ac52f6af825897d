"""Shard-mapped assembly kernels: mesh-parallel residual evaluation.

The MPI-parallel assembly/solve of the reference (DOLFIN ghost updates +
PETSc allreduce per Newton iteration, SURVEY.md §3.4) becomes:

  - cells sharded over a 1-D ``jax.sharding.Mesh`` axis (ICI on hardware),
  - each device gathers nodal values for its cell block, runs the dense
    per-cell element math, scatter-adds into a full-length node vector
    (sorted segment-sum),
  - one ``psum`` over the mesh axis accumulates inter-device node
    contributions (the halo exchange), yielding replicated residuals.

CG/Newton then run on replicated node vectors: every device executes the
same reductions — SPMD exactly like the reference's ``mpirun`` model, with
XLA collectives riding ICI instead of MPI messages.  A node-sharded variant
with ``ppermute`` halo exchange (owned/ghost splitting) is the planned
optimization for node vectors that exceed per-device HBM; at GlimSLib
problem sizes (<=1e6 nodes) replicated vectors avoid halo bookkeeping
entirely and the psum is a single fused all-reduce per residual.

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

from glimslib_tpu.core.elements import p1_cubic_tensor, p1_mass_matrix


def _einsum(spec, *ops):
    """Tiny-contraction einsum as broadcast-multiply + reduce.

    The element contractions here run over axes of size 3-6; lowering them
    as ``dot_general`` puts them on the MXU where f32 inputs are truncated
    to bf16 by default (wrong answers for Newton/CG) and
    ``Precision.HIGHEST`` triggers a multi-pass codegen with pathological
    compile times on TPU.  Explicit multiply+reduce stays on the VPU: exact
    f32/f64 accumulation, fast compiles, and XLA fuses it with the
    surrounding elementwise work.
    """
    if spec in ("ij,cj->ci", "ij,fj->fi"):
        M, x = ops
        return jnp.sum(M[None] * x[:, None, :], axis=-1)
    if spec == "cj,cjd->cd":
        x, g = ops
        return jnp.sum(x[:, :, None] * g, axis=1)
    if spec == "cd,cid->ci":
        gc, g = ops
        return jnp.sum(gc[:, None, :] * g, axis=-1)
    if spec == "ijk,cj,ck->ci":
        T, a, b = ops
        return jnp.sum(
            T[None] * a[:, None, :, None] * b[:, None, None, :], axis=(-2, -1)
        )
    if spec == "cid,cid->ci":
        a, b = ops
        return jnp.sum(a * b, axis=-1)
    if spec == "cja,cjb->cab":
        u, g = ops
        return jnp.sum(u[:, :, :, None] * g[:, :, None, :], axis=1)
    if spec == "cab,cib->cia":
        s, g = ops
        return jnp.sum(s[:, None, :, :] * g[:, :, None, :], axis=-1)
    if spec in ("ij,cjd->cid", "ij,fja->fia"):
        M, u = ops
        return jnp.sum(M[None, :, :, None] * u[:, None, :, :], axis=2)
    raise NotImplementedError(spec)

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

    All coefficient arguments are materialized per-cell and sharded with the
    cell blocks; nodal vectors are replicated."""

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

        self._shard = NamedSharding(device_mesh, P(self.axis))
        self._rep = NamedSharding(device_mesh, P())
        put = lambda a: jax.device_put(jnp.asarray(a), self._shard)
        self.cells = put(self.part.cells)
        self.vol = put(jnp.asarray(self.part.vol, dtype=dtype))
        self.grads = put(jnp.asarray(self.part.grads, dtype=dtype))
        self.sort_idx = put(self.part.sort_idx)
        self.sorted_ids = put(self.part.sorted_ids)
        self.mass_unit = jnp.asarray(p1_mass_matrix(self.dim), dtype=dtype)
        self.cubic_unit = jnp.asarray(p1_cubic_tensor(self.dim), dtype=dtype)
        self._cell_perm = jnp.asarray(self.part.cell_perm)

    # -- plumbing ------------------------------------------------------------

    def _cellwise(self, value):
        """Coefficient (scalar or (nc,)) -> blocked (P, C), traceable."""
        v = jnp.asarray(value, self.dtype)
        if v.ndim == 0:
            v = jnp.broadcast_to(v, (self.n_cells,))
        return jnp.take(v, self._cell_perm, axis=0)

    def _run(self, local, cell_args, rep_args):
        """shard_map with the standard (cells, vol, grads, sort, ids) block
        plus extra cell-sharded and replicated args."""
        n_cell = 5 + len(cell_args)
        in_specs = (P(self.axis),) * n_cell + (P(),) * len(rep_args)
        fn = shard_map(
            local, mesh=self.device_mesh, in_specs=in_specs, out_specs=P()
        )
        return fn(
            self.cells, self.vol, self.grads, self.sort_idx, self.sorted_ids,
            *cell_args, *rep_args,
        )

    # -- kernels -------------------------------------------------------------

    def rd_residual(self, c, c_prev, D, rho, dt, source=0.0, conc_max=1.0):
        mass_unit, cubic_unit = self.mass_unit, self.cubic_unit
        axis, n_nodes, npe, dim = self.axis, self.n_nodes, self.npe, self.dim

        def local(cells, vol, grads, sort_idx, sorted_ids, D, rho, src,
                  c, c_prev, dt):
            cells, vol, grads = cells[0], vol[0], grads[0]
            sort_idx, sorted_ids = sort_idx[0], sorted_ids[0]
            D, rho, src = D[0], rho[0], src[0]
            ce = jnp.take(c, cells, axis=0)
            cpe = jnp.take(c_prev, cells, axis=0)
            m_diff = vol[:, None] * _einsum("ij,cj->ci", mass_unit, ce - cpe)
            grad_c = _einsum("cj,cjd->cd", ce, grads)
            k_term = (dt * D * vol)[:, None] * _einsum(
                "cd,cid->ci", grad_c, grads
            )
            m_c = _einsum("ij,cj->ci", mass_unit, ce)
            t_cc = _einsum("ijk,cj,ck->ci", cubic_unit, ce, ce)
            logistic = (dt * rho * vol)[:, None] * (m_c - t_cc / conc_max)
            srct = (dt * src * vol / (dim + 1))[:, None] * jnp.ones(
                (1, npe), ce.dtype
            )
            contrib = (m_diff + k_term - logistic - srct).reshape(-1)
            s = jnp.take(contrib, sort_idx, axis=0)
            r = jax.ops.segment_sum(
                s, sorted_ids, num_segments=n_nodes, indices_are_sorted=True
            )
            return jax.lax.psum(r, axis)

        return self._run(
            local,
            cell_args=(self._cellwise(D), self._cellwise(rho), self._cellwise(source)),
            rep_args=(c, c_prev, jnp.asarray(dt, self.dtype)),
        )

    def elasticity_residual(self, u, c, mu, lam, coupling, body_force=None):
        d, axis, n_nodes = self.dim, self.axis, self.n_nodes
        bf = (
            jnp.zeros((d,), self.dtype)
            if body_force is None
            else jnp.broadcast_to(jnp.asarray(body_force, self.dtype), (d,))
        )

        def local(cells, vol, grads, sort_idx, sorted_ids, mu, lam,
                  u, c, coupling, bf):
            cells, vol, grads = cells[0], vol[0], grads[0]
            sort_idx, sorted_ids = sort_idx[0], sorted_ids[0]
            mu, lam = mu[0], lam[0]
            ue = jnp.take(u, cells, axis=0)
            ce = jnp.take(c, cells, axis=0)
            grad_u = _einsum("cja,cjb->cab", ue, grads)
            eps = 0.5 * (grad_u + jnp.swapaxes(grad_u, 1, 2))
            tr = jnp.trace(eps, axis1=1, axis2=2)
            sigma = (
                2.0 * mu[:, None, None] * eps
                + (lam * tr)[:, None, None] * jnp.eye(d, dtype=ue.dtype)
            )
            term_stress = vol[:, None, None] * _einsum(
                "cab,cib->cia", sigma, grads
            )
            cbar = ce.mean(axis=1)
            kfac = coupling * (2.0 * mu + d * lam) * cbar * vol
            contrib = term_stress - kfac[:, None, None] * grads
            contrib = contrib - (vol / (d + 1))[:, None, None] * bf[None, None, :]
            s = jnp.take(contrib.reshape(-1, d), sort_idx, axis=0)
            r = jax.ops.segment_sum(
                s, sorted_ids, num_segments=n_nodes, indices_are_sorted=True
            )
            return jax.lax.psum(r, axis)

        return self._run(
            local,
            cell_args=(self._cellwise(mu), self._cellwise(lam)),
            rep_args=(u, c, jnp.asarray(coupling, self.dtype), bf),
        )

    def rd_mass_stiffness_diag(self, D, rho, dt):
        mass_diag = jnp.diag(self.mass_unit)
        axis, n_nodes = self.axis, self.n_nodes

        def local(cells, vol, grads, sort_idx, sorted_ids, D, dt):
            cells, vol, grads = cells[0], vol[0], grads[0]
            sort_idx, sorted_ids = sort_idx[0], sorted_ids[0]
            D = D[0]
            mdiag = vol[:, None] * mass_diag[None, :]
            kdiag = (dt * D * vol)[:, None] * _einsum(
                "cid,cid->ci", grads, grads
            )
            s = jnp.take((mdiag + kdiag).reshape(-1), sort_idx, axis=0)
            r = jax.ops.segment_sum(
                s, sorted_ids, num_segments=n_nodes, indices_are_sorted=True
            )
            return jax.lax.psum(r, axis)

        return self._run(
            local, cell_args=(self._cellwise(D),),
            rep_args=(jnp.asarray(dt, self.dtype),),
        )

    def elasticity_diag(self, mu, lam):
        axis, n_nodes, dim = self.axis, self.n_nodes, self.dim

        def local(cells, vol, grads, sort_idx, sorted_ids, mu, lam):
            cells, vol, grads = cells[0], vol[0], grads[0]
            sort_idx, sorted_ids = sort_idx[0], sorted_ids[0]
            mu, lam = mu[0], lam[0]
            g2 = _einsum("cid,cid->ci", grads, grads)
            ga2 = grads**2
            diag = (
                vol[:, None, None] * mu[:, None, None] * (g2[:, :, None] + ga2)
                + vol[:, None, None] * lam[:, None, None] * ga2
            )
            s = jnp.take(diag.reshape(-1, dim), sort_idx, axis=0)
            r = jax.ops.segment_sum(
                s, sorted_ids, num_segments=n_nodes, indices_are_sorted=True
            )
            return jax.lax.psum(r, axis)

        return self._run(
            local, cell_args=(self._cellwise(mu), self._cellwise(lam)),
            rep_args=(),
        )

    def mass_residual(self, c):
        mass_unit, axis, n_nodes = self.mass_unit, self.axis, self.n_nodes

        def local(cells, vol, grads, sort_idx, sorted_ids, c):
            cells, vol = cells[0], vol[0]
            sort_idx, sorted_ids = sort_idx[0], sorted_ids[0]
            ce = jnp.take(c, cells, axis=0)
            contrib = vol[:, None] * _einsum("ij,cj->ci", mass_unit, ce)
            s = jnp.take(contrib.reshape(-1), sort_idx, axis=0)
            r = jax.ops.segment_sum(
                s, sorted_ids, num_segments=n_nodes, indices_are_sorted=True
            )
            return jax.lax.psum(r, axis)

        return self._run(local, cell_args=(), rep_args=(c,))

    def mass_vector_residual(self, u):
        mass_unit, axis, n_nodes, dim = (
            self.mass_unit, self.axis, self.n_nodes, self.dim
        )

        def local(cells, vol, grads, sort_idx, sorted_ids, u):
            cells, vol = cells[0], vol[0]
            sort_idx, sorted_ids = sort_idx[0], sorted_ids[0]
            ue = jnp.take(u, cells, axis=0)
            contrib = vol[:, None, None] * _einsum("ij,cjd->cid", mass_unit, ue)
            s = jnp.take(contrib.reshape(-1, dim), sort_idx, axis=0)
            r = jax.ops.segment_sum(
                s, sorted_ids, num_segments=n_nodes, indices_are_sorted=True
            )
            return jax.lax.psum(r, axis)

        return self._run(local, cell_args=(), rep_args=(u,))

    def integrate_p1(self, c):
        axis = self.axis

        def local(cells, vol, grads, sort_idx, sorted_ids, c):
            cells, vol = cells[0], vol[0]
            ce = jnp.take(c, cells, axis=0)
            return jax.lax.psum(jnp.sum(vol * ce.mean(axis=1)), axis)

        return self._run(local, cell_args=(), rep_args=(c,))
