"""Node-sharded unstructured execution: owned/ghost halo exchange.

The reference's MPI mode partitions EVERYTHING — meshes load distributed
(reference ``glimslib/utils/data_io.py:663-713``), each rank owns a node
range and DOLFIN ghost updates move only boundary values (SURVEY.md §2.3).
The earlier ``parallel/shard.py`` 'cells' mode replicates node vectors
(per-device memory does not scale); this module is the planned
owned/ghost replacement for unstructured meshes, TPU-shaped:

- nodes are split into ``n/ndev`` CONTIGUOUS ranges of the mesh order
  (use a Morton-ordered mesh, core/mesh.py ``reordered_morton``, so the
  ranges are compact blobs and the exchanged surface is small);
- each device holds the cells touching its owned nodes (overlap
  assembly: boundary cells are duplicated on the few devices owning
  their nodes, so every device computes ALL contributions to its own
  rows and no reverse exchange is needed);
- the halo exchange is STATIC and gather-shaped: each device publishes
  the padded row-slab of its owned values that other devices reference
  (``pub_idx``), one ``lax.all_gather`` moves the slabs over the device
  axis (ICI on hardware), and each device assembles its ghost buffer
  with a single placement row-gather (``ghost_src``) — no scatters, no
  dynamic shapes, no per-pair bookkeeping;
- per-device state (owned vectors, local cells, incidence tables) is
  O(n/ndev + surface): per-device memory scales down with the device
  count, unlike the replicated-vector 'cells' mode.

Residual/diagonal/mass kernels reuse the shared element-contribution
math of ops/assembly.py; accumulation into owned rows goes through
:func:`make_scatter_plan_dropping` (contributions to neighbor-owned rows
are dropped locally — the neighbor computes them itself from its copy of
the boundary cell).  CG/Newton then run on GSPMD-sharded node vectors:
elementwise ops stay sharded, dot products lower to local reductions
plus one ``psum`` — SPMD exactly like the reference's ``mpirun`` model,
with XLA collectives riding ICI instead of MPI messages.
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
    make_scatter_plan_dropping,
    pull_accumulate,
    rd_diag_contrib,
    rd_element_contrib,
)

try:  # jax>=0.6 stable name
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


class NodeShardSpec:
    """Host-precomputed owned/ghost partition of one unstructured mesh.

    All per-device tables are stacked on a leading ``ndev`` axis and
    padded to common sizes (static shapes for shard_map)."""

    def __init__(self, mesh, n_devices: int):
        n = mesh.n_nodes
        ndev = int(n_devices)
        if n % ndev:
            raise ValueError(
                f"n_nodes={n} not divisible by {ndev} devices; pad with "
                "core.mesh.pad_mesh_nodes first"
            )
        self.n = n
        self.ndev = ndev
        self.nnl = nnl = n // ndev
        cells = np.asarray(mesh.cells, dtype=np.int64)
        nc, npe = cells.shape
        self.nc, self.npe = nc, npe

        owner = cells // nnl  # (nc, npe) owning device of each cell node
        grads = np.moveaxis(np.asarray(mesh.cell_grads), 0, -1)  # (npe,d,nc)
        vol = np.asarray(mesh.cell_volumes)
        d = mesh.dim
        self.dim = d

        local_cells = [
            np.where((owner == p).any(axis=1))[0] for p in range(ndev)
        ]
        Cl = max(len(lc) for lc in local_cells)
        self.Cl = Cl
        ghosts = []
        for p in range(ndev):
            nd = np.unique(cells[local_cells[p]])
            ghosts.append(nd[(nd < p * nnl) | (nd >= (p + 1) * nnl)])
        G = max((len(g) for g in ghosts), default=1)
        G = max(G, 1)
        self.G = G

        # publish slabs: owned values referenced by any other device
        pubs = []
        for q in range(ndev):
            need = [g[(g >= q * nnl) & (g < (q + 1) * nnl)] for g in ghosts]
            pubs.append(np.unique(np.concatenate(need + [np.array([], np.int64)])))
        Pmax = max(max((len(pb) for pb in pubs), default=1), 1)
        self.P = Pmax
        pub_idx = np.full((ndev, Pmax), nnl, dtype=np.int32)  # sentinel
        for q, pb in enumerate(pubs):
            pub_idx[q, : len(pb)] = pb - q * nnl
        # ghost buffer assembly: position of each ghost in the gathered
        # (ndev * P) slab stack; sentinel points at the zero pad row
        ghost_src = np.full((ndev, G), ndev * Pmax, dtype=np.int32)
        for p, g in enumerate(ghosts):
            if len(g):
                q = g // nnl
                pos = np.array(
                    [np.searchsorted(pubs[qq], jj) for qq, jj in zip(q, g)],
                    dtype=np.int64,
                )
                ghost_src[p, : len(g)] = q * Pmax + pos

        # local cell tables: node -> xb index (own | nnl+ghost | zero pad)
        cells_xb = np.full((ndev, npe, Cl), nnl + G, dtype=np.int32)
        cell_ids = np.full((ndev, Cl), nc, dtype=np.int32)
        grads_l = np.zeros((ndev, npe, d, Cl))
        vol_l = np.zeros((ndev, Cl))
        cell_own = np.zeros((ndev, Cl))
        res_tables = []
        for p in range(ndev):
            lc = local_cells[p]
            cell_ids[p, : len(lc)] = lc
            grads_l[p, :, :, : len(lc)] = grads[:, :, lc]
            vol_l[p, : len(lc)] = vol[lc]
            # integration ownership: the device owning the MIN node of a
            # cell integrates it (every other copy weights it zero)
            cell_own[p, : len(lc)] = (cells[lc].min(axis=1) // nnl) == p
            cn = cells[lc]  # (cl, npe) global node ids
            xb = np.where(
                (cn >= p * nnl) & (cn < (p + 1) * nnl),
                cn - p * nnl,
                nnl + np.searchsorted(ghosts[p], np.clip(cn, 0, n)),
            )
            cells_xb[p, :, : len(lc)] = xb.T
            # owned-row accumulation plan over the (npe, Cl) entry order;
            # ghost-row entries (xb >= nnl) are dropped (overlap assembly)
            emap = np.full((npe, Cl), nnl + G, dtype=np.int64)
            emap[:, : len(lc)] = xb.T
            res_tables.append(
                make_scatter_plan_dropping(emap.ravel(), nnl).pull_table
            )
        Kr = max(t.shape[1] for t in res_tables)
        n_entries = npe * Cl
        res_pull = np.full((ndev, nnl, Kr), n_entries, dtype=np.int32)
        for p, t in enumerate(res_tables):
            tt = t.copy()
            tt[tt == n_entries] = n_entries  # shared sentinel (same value)
            res_pull[p, :, : t.shape[1]] = tt
        self.pub_idx = pub_idx
        self.ghost_src = ghost_src
        self.cells_xb = cells_xb
        self.cell_ids = cell_ids
        self.grads_l = grads_l
        self.vol_l = vol_l
        self.cell_own = cell_own
        self.res_pull = res_pull


def _exchange(xl, pub_idx, ghost_src, axis):
    """Owned values (nnl, w) -> local buffer xb (nnl + G + 1, w): one
    all_gather of the published boundary slabs + one placement gather.

    Width-4 f64 rows (exactly one 32-byte vector register) trigger a heap
    corruption in this jaxlib's XLA:CPU partitioned executables (measured:
    w=1,2,3,5,8 f64 and w=8 f32 are fine, w=4 f64 aborts in malloc, with
    or without the collective) — pad such rows to width 5 and slice the
    pad column back off at the end."""
    w = xl.shape[1]
    bug = xl.dtype == jnp.float64 and w == 4
    if bug:
        xl = jnp.pad(xl, ((0, 0), (0, 1)))
    xp = jnp.pad(xl, ((0, 1), (0, 0)))  # sentinel zero row for pub padding
    pub = jnp.take(xp, pub_idx, axis=0)  # (P, w)
    allpub = jax.lax.all_gather(pub, axis)  # (ndev, P, w)
    flat = allpub.reshape(-1, xl.shape[1])
    flat = jnp.pad(flat, ((0, 1), (0, 0)))  # sentinel zero row
    ghost = jnp.take(flat, ghost_src, axis=0)  # (G, w)
    xb = jnp.concatenate(
        [xl, ghost, jnp.zeros((1, xl.shape[1]), xl.dtype)]
    )
    return xb[:, :w] if bug else xb


class NodeShardedP1Kernels:
    """P1Kernels-surface kernels over owned/ghost node-sharded vectors.

    Node vectors in and out are GSPMD-sharded on their leading axis over
    the device mesh; per-cell coefficient arrays stay replicated (small:
    one float per cell).  Drop-in for ``Simulation.use_sharding`` on
    unstructured meshes (the node-scaling analogue of the reference's
    ``mpirun`` runs, test_case_simulation_tumor_growth_3D_atlas_mpi.py)."""

    def __init__(self, mesh, device_mesh: DeviceMesh, dtype=None):
        import math

        if dtype is None:
            dtype = (
                jnp.float64 if jax.config.read("jax_enable_x64")
                else jnp.float32
            )
        self.dtype = dtype
        self.dim = mesh.dim
        self.n_nodes = mesh.n_nodes
        self.n_cells = mesh.n_cells
        self.npe = mesh.dim + 1
        self.device_mesh = device_mesh
        self.axis = device_mesh.axis_names[0]
        ndev = device_mesh.devices.size
        self.spec = spec = NodeShardSpec(mesh, ndev)
        self._m0 = 1.0 / ((self.dim + 1) * (self.dim + 2))
        self._t0 = math.factorial(self.dim) / math.factorial(self.dim + 3)

        shard = NamedSharding(device_mesh, P(self.axis))
        put = lambda a: jax.device_put(jnp.asarray(a), shard)
        self._tabs = (
            put(spec.cells_xb),
            put(spec.cell_ids),
            put(jnp.asarray(spec.grads_l, dtype)),
            put(jnp.asarray(spec.vol_l, dtype)),
            put(jnp.asarray(spec.cell_own, dtype)),
            put(spec.res_pull),
            put(spec.pub_idx),
            put(spec.ghost_src),
        )

    # -- plumbing ------------------------------------------------------------

    def _cellco(self, value, cell_ids):
        """Replicated scalar or per-cell (nc,) coefficient -> local (Cl,)."""
        v = jnp.asarray(value, self.dtype)
        if v.ndim == 0:
            return jnp.broadcast_to(v, cell_ids.shape)
        vp = jnp.pad(v, (0, 1))  # sentinel cell -> 0
        return jnp.take(vp, cell_ids, axis=0)

    def _run(self, local, node_args, rep_args, out_spec=None):
        """shard_map ``local(tabs..., node_args..., rep_args...)``."""
        n_node = len(node_args)
        in_specs = (
            (P(self.axis),) * len(self._tabs)
            + (P(self.axis),) * n_node
            + (P(),) * len(rep_args)
        )
        fn = shard_map(
            local, mesh=self.device_mesh, in_specs=in_specs,
            out_specs=out_spec if out_spec is not None else P(self.axis),
        )
        return fn(*self._tabs, *node_args, *rep_args)

    @staticmethod
    def _local_scatter(contrib_flat, res_pull):
        return pull_accumulate(
            res_pull.ravel(), res_pull.shape[0], contrib_flat
        )

    @staticmethod
    def _gather_cells(xb, cells_xb):
        """Local buffer (nnl+G+1, w) -> per-entry rows (npe, Cl, w)."""
        return jnp.take(xb, cells_xb.ravel(), axis=0).reshape(
            cells_xb.shape[0], cells_xb.shape[1], xb.shape[1]
        )

    # -- kernels (method surface of ops/assembly.P1Kernels) -------------------

    def rd_residual(self, c, c_prev, D, rho, dt, source=0.0, conc_max=1.0):
        axis, dim, m0, t0 = self.axis, self.dim, self._m0, self._t0
        cellco, scatter_l, gather = (
            self._cellco, self._local_scatter, self._gather_cells,
        )

        def local(cxb, cid, g, v, own, pull, pub, gsrc, c, c_prev,
                  D, rho, src, dt):
            cxb, cid, g, v, pull = cxb[0], cid[0], g[0], v[0], pull[0]
            pub, gsrc = pub[0], gsrc[0]
            xb = _exchange(jnp.stack([c, c_prev], axis=-1), pub, gsrc, axis)
            ge = gather(xb, cxb)
            ce, cpe = ge[..., 0], ge[..., 1]
            contrib = rd_element_contrib(
                ce, cpe, g, v, cellco(D, cid), cellco(rho, cid), dt,
                cellco(src, cid), conc_max, m0, t0, dim,
            )
            return scatter_l(contrib.reshape(-1), pull)

        return self._run(
            local, node_args=(c, c_prev),
            rep_args=(D, rho, source, jnp.asarray(dt, self.dtype)),
        )

    def elasticity_residual(self, u, c, mu, lam, coupling, body_force=None):
        axis, dim = self.axis, self.dim
        cellco, scatter_l, gather = (
            self._cellco, self._local_scatter, self._gather_cells,
        )
        bf = (
            jnp.zeros((dim,), self.dtype) if body_force is None
            else jnp.broadcast_to(jnp.asarray(body_force, self.dtype), (dim,))
        )

        def local(cxb, cid, g, v, own, pull, pub, gsrc, u, c,
                  mu, lam, coupling, bf):
            cxb, cid, g, v, pull = cxb[0], cid[0], g[0], v[0], pull[0]
            pub, gsrc = pub[0], gsrc[0]
            xb = _exchange(
                jnp.concatenate([u, c[:, None]], axis=1), pub, gsrc, axis
            )
            ge = gather(xb, cxb)  # (npe, Cl, d+1)
            ue = jnp.transpose(ge[..., :dim], (2, 0, 1))  # (d, npe, Cl)
            c_int = ge[..., dim].mean(axis=0) * v
            contrib = elasticity_element_contrib(
                ue, c_int, g, v, cellco(mu, cid), cellco(lam, cid),
                cellco(coupling, cid), bf[:, None], dim,
            )
            ent = jnp.moveaxis(contrib, 1, -1).reshape(-1, dim)
            return scatter_l(ent, pull)

        return self._run(
            local, node_args=(u, c), rep_args=(mu, lam, coupling, bf),
        )

    def rd_mass_stiffness_diag(self, D, rho, dt):
        cellco, scatter_l = self._cellco, self._local_scatter
        m0, dim = self._m0, self.dim

        def local(cxb, cid, g, v, own, pull, pub, gsrc, D, dt):
            cid, g, v, pull = cid[0], g[0], v[0], pull[0]
            contrib = rd_diag_contrib(g, v, cellco(D, cid), dt, m0, dim)
            return scatter_l(contrib.reshape(-1), pull)

        return self._run(
            local, node_args=(),
            rep_args=(D, jnp.asarray(dt, self.dtype)),
        )

    def elasticity_diag(self, mu, lam):
        cellco, scatter_l = self._cellco, self._local_scatter
        dim = self.dim

        def local(cxb, cid, g, v, own, pull, pub, gsrc, mu, lam):
            cid, g, v, pull = cid[0], g[0], v[0], pull[0]
            contrib = elasticity_diag_contrib(
                g, v, cellco(mu, cid), cellco(lam, cid)
            )
            ent = jnp.moveaxis(contrib, 1, -1).reshape(-1, dim)
            return scatter_l(ent, pull)

        return self._run(local, node_args=(), rep_args=(mu, lam))

    def elasticity_diag_blocks(self, mu, lam):
        """Per-node (d, d) diagonal blocks (P1Kernels formula), owned rows
        only — feeds the same block-Jacobi preconditioner."""
        cellco, scatter_l = self._cellco, self._local_scatter
        dim, dtype = self.dim, self.dtype

        def local(cxb, cid, g, v, own, pull, pub, gsrc, mu, lam):
            cid, g, v, pull = cid[0], g[0], v[0], pull[0]
            mu_c, lam_c = cellco(mu, cid), cellco(lam, cid)
            gg = g[:, :, None, :] * g[:, None, :, :]  # (npe, a, b, Cl)
            g2 = jnp.sum(g * g, axis=1)  # (npe, Cl)
            eye = jnp.eye(dim, dtype=dtype)[None, :, :, None]
            contrib = v * (
                mu_c * (gg + eye * g2[:, None, None, :]) + lam_c * gg
            )
            flat = jnp.moveaxis(contrib, -1, 1).reshape(-1, dim * dim)
            return scatter_l(flat, pull)

        out = self._run(local, node_args=(), rep_args=(mu, lam))
        return out.reshape(-1, self.dim, self.dim)

    def block_jacobi_inverse_blocks(self, B, mask=None):
        """Elementwise over nodes — GSPMD keeps the sharding, no exchange."""
        d = self.dim
        if mask is not None:
            m = jnp.any(mask, axis=1)
            eye = jnp.eye(d, dtype=B.dtype)[None]
            B = jnp.where(m[:, None, None], eye, B)
        return jnp.linalg.inv(B)

    def apply_block_jacobi(self, Binv, r):
        return jnp.sum(Binv * r[:, None, :], axis=2)

    def mass_residual(self, c):
        m0 = self._m0
        scatter_l, gather = self._local_scatter, self._gather_cells

        def local(cxb, cid, g, v, own, pull, pub, gsrc, c):
            cxb, v, pull, pub, gsrc = cxb[0], v[0], pull[0], pub[0], gsrc[0]
            xb = _exchange(jnp.stack([c, c], axis=-1), pub, gsrc, self.axis)
            ce = gather(xb, cxb)[..., 0]  # (npe, Cl)
            contrib = v * (m0 * (jnp.sum(ce, axis=0) + ce))
            return scatter_l(contrib.reshape(-1), pull)

        return self._run(local, node_args=(c,), rep_args=())

    def mass_vector_residual(self, u):
        m0, dim = self._m0, self.dim
        scatter_l, gather = self._local_scatter, self._gather_cells

        def local(cxb, cid, g, v, own, pull, pub, gsrc, u):
            cxb, v, pull, pub, gsrc = cxb[0], v[0], pull[0], pub[0], gsrc[0]
            xb = _exchange(u, pub, gsrc, self.axis)
            ue = gather(xb, cxb)  # (npe, Cl, d)
            contrib = v[None, :, None] * m0 * (
                jnp.sum(ue, axis=0, keepdims=True) + ue
            )
            return scatter_l(contrib.reshape(-1, dim), pull)

        return self._run(local, node_args=(u,), rep_args=())

    def lumped_mass(self):
        dim, dtype = self.dim, self.dtype
        scatter_l = self._local_scatter

        def local(cxb, cid, g, v, own, pull, pub, gsrc):
            v, pull = v[0], pull[0]
            contrib = jnp.broadcast_to(
                v / (dim + 1), (dim + 1, v.shape[0])
            ).astype(dtype)
            return scatter_l(contrib.reshape(-1), pull)

        return self._run(local, node_args=(), rep_args=())

    def integrate_p1(self, c):
        axis = self.axis
        gather = self._gather_cells

        def local(cxb, cid, g, v, own, pull, pub, gsrc, c):
            cxb, v, own, pub, gsrc = cxb[0], v[0], own[0], pub[0], gsrc[0]
            xb = _exchange(jnp.stack([c, c], axis=-1), pub, gsrc, axis)
            ce = gather(xb, cxb)[..., 0]
            # 'own' weights boundary-duplicated cells on exactly one device
            return jax.lax.psum(jnp.sum(own * v * ce.mean(axis=0)), axis)

        return self._run(local, node_args=(c,), rep_args=(), out_spec=P())
