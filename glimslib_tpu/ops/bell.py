"""Supernode halo-ELL operators for unstructured meshes.

Second-generation replacement for the node block-ELL (ops/ell.py) on the
gather-bound unstructured path (the reference's CGAL brain meshes,
test_case_simulation_tumor_growth_3D_atlas_mpi.py:32-136).  Measured on
the v5e, the node-ELL matvec is gather-bound: 540k width-3 row gathers
at ~321 Mrow/s set a ~1.7 ms floor at 197k tets.  The nodes of one
compact supernode share most of their neighbors, so gathering each
supernode's UNIQUE halo once removes that redundancy:

- nodes are grouped into contiguous supernodes of ``s`` in the mesh
  order (use a Morton-ordered mesh, core/mesh.py reordered_morton, so
  supernodes are compact blobs — halo size ~126 vs s*K ~ 480 at s=32);
- per matvec: ONE width-d row gather of each supernode's EXTERNAL halo
  (nb * Khe rows — 4-5x fewer than node-ELL), then a dense local
  contraction y[b, i, a] = sum_{h, c} W[b, i, a, h, c] xh[b, h, c]
  as a full-lane VPU multiply-reduce over the flattened (Kh*d) axis.
  The halo layout is OWN-FIRST: slots [0, s) of each block are its own
  nodes — assembled from x by a pure reshape, no gather — and slots
  [s, s + Khe) its sorted external neighbors (the only gathered part;
  own nodes are ~25% of a Morton block's halo, measured 0.84 ms of
  per-matvec gather at 197k tets before the split);
- the local operator W stores explicit zeros for non-adjacent pairs
  (memory-for-gathers trade: ~11x fill at s=32, ~205 MB at 36k nodes —
  0.26 ms of HBM streaming replaces ~1.1 ms of gathers);
- assembly is SPLIT by entry class before the pull-gather (the dense
  (nb*s*Kh)-slot plan it replaces padded every slot to the DIAGONAL
  multiplicity ~cells-per-node, a ~435 MB table and ~108M gather rows):
  diagonal entries accumulate through the small per-node plan
  (multiplicity = cells per node), off-diagonal entries through a
  compact unique-pair plan (multiplicity = cells per edge, ~6), and one
  placement gather spreads [off-pairs | diag | 0] into the dense halo
  layout — ~12x fewer gather rows and ~12x smaller tables;
- the plan tables are LARGE (tens of MB at flagship scale): thread them
  as jit arguments via ``Simulation.runtime_aux()`` (keys from
  :meth:`BellPlan.tables`) — embedded as closure constants they blow
  the axon remote-compile payload limit (HTTP 413) and cost XLA
  constant-folding time.  Assembly runs inside
  ``_augment_theta_with_operators`` so mu/lam/D/rho gradients flow
  through the values like every other operator plane.

Also provides the matching SUPERNODE block-Jacobi: the (s*d x s*d)
self-block of each supernode, inverted once per simulate — a far
stronger smoother than per-node blocks for the same streaming apply
cost, and the natural fine-level partner of the affine coarse space
(solvers/twolevel.py) built on the same Morton blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from glimslib_tpu.ops.assembly import make_scatter_plan, pull_accumulate

try:  # jax>=0.6 stable name
    from jax import shard_map as _shard_map_raw
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_raw  # type: ignore


def _shard_map(fn, *, mesh, in_specs, out_specs):
    """shard_map with varying-mesh-axes checking off: ``pallas_call`` has
    no vma rule (jax 0.9 raises "vma on ShapeDtypeStruct must not be
    None" the moment a per-device Pallas kernel runs under a checked
    shard_map — exactly the hardware fast path of :func:`_bmv`).  Every
    wrapped kernel here maps block-sharded inputs to block-sharded
    outputs with no cross-device communication, so the check buys
    nothing."""
    try:
        return _shard_map_raw(fn, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False)
    except TypeError:  # pragma: no cover - older jax: check_rep era
        return _shard_map_raw(fn, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)


def _bmv(plan, A, x):
    """Batched matvec, per-device under block sharding.

    When ``plan.shard_ctx`` is set (Simulation.use_sharding(mode='bell')),
    the contraction runs inside ``shard_map`` over the device mesh with
    both the table and the halo operand partitioned on the supernode-block
    axis — each device streams only its own table slab (per-device Pallas
    kernels on hardware, the XLA mul+reduce fallback elsewhere), which is
    the whole point of the layout: the TABLES are the memory and
    bandwidth (hundreds of MB at flagship scale), the node vectors are
    tiny (n*d floats), so the SPMD split puts the block slabs on devices
    and lets GSPMD re-replicate the small result."""
    from glimslib_tpu.ops.bell_pallas import batched_matvec

    if plan.shard_ctx is None:
        return batched_matvec(A, x)
    mesh, axis = plan.shard_ctx
    from jax.sharding import PartitionSpec as P

    fn = _shard_map(
        batched_matvec, mesh=mesh,
        in_specs=(P(axis), P(axis)), out_specs=P(axis),
    )
    return fn(A, x)


class BellPlan:
    """Host-precomputed supernode halo structure for one mesh.

    Generic over the dof space: pass a ``mesh`` (P1 — dofs are the mesh
    nodes) or an explicit ``(conn, n)`` dof connectivity (e.g. the P2
    ``cell_dofs`` of ops/p2.py — dofs are vertices + edge midpoints, and
    the same class-split assembly avoids the O(n_dofs * K * multiplicity)
    naive-ELL tables that would run to GBs at flagship P2 sizes).
    ``prefix`` namespaces the aux-threaded table keys so two plans (the P1
    elasticity plan and a P2 concentration plan) can ride one theta."""

    # (device_mesh, axis_name) when the supernode-block axis is sharded
    # over a device mesh (models/base.py use_sharding(mode='bell'));
    # None for single-device execution.
    shard_ctx = None

    def __init__(self, mesh=None, s: int = 32, conn=None, n=None,
                 prefix: str = "_Bell", halo_chunk: int = 1):
        if mesh is not None:
            cells = np.asarray(mesh.cells, dtype=np.int64)
            n = mesh.n_nodes
        else:
            cells = np.asarray(conn, dtype=np.int64)
        self.prefix = prefix
        # CHUNK-ALIGNED halo (halo_chunk = G > 1): external slots come in
        # aligned groups of G consecutive dof ids and the halo gather
        # pulls (G,)-wide rows of x.reshape(-1, G) — one random access per
        # CHUNK instead of per dof.  The gather is row-RATE bound
        # (~0.2-0.4 G rows/s regardless of width <= 8 — CLAUDE perf
        # model), and on a Morton-interleaved dof space externals form
        # consecutive-id runs, so G=4 cuts the dominant P2 matvec cost
        # ~3x for ~30-40% more (zero-padded) table slots.  Slots covering
        # uncoupled dofs carry zero operator entries — exact.
        self.halo_chunk = G = max(int(halo_chunk), 1)
        nc, npe = cells.shape
        self.n = n
        self.npe = npe
        self.s = s = int(s)
        nb_real = (n + s - 1) // s
        # round the block count up for the Pallas batched matvecs
        # (ops/bell_pallas.py): to a lane-tile multiple (128) when that
        # wastes <= 6.25% — the block axis then rides the LANES of the
        # streamed (M, K, nb) tables — else to a sublane multiple (8).
        # Padded blocks carry sentinel halos and zero operator rows, and
        # every apply slices [:n].
        nb128 = -(-nb_real // 128) * 128
        nb = nb128 if nb128 <= 1.0625 * nb_real else -(-nb_real // 8) * 8
        self.nb = nb
        self.n_pad = nb * s

        # unique node-adjacency pairs (same construction as ops/ell.py),
        # in (i, j, cell) entry order to match the builders' value tensors
        rows = np.repeat(cells.T, npe, axis=0).reshape(npe, npe, nc)
        cols = np.tile(cells.T, (npe, 1)).reshape(npe, npe, nc)
        rflat = rows.ravel()
        cflat = cols.ravel()
        key = rflat * n + cflat
        uniq = np.unique(key)
        ur = (uniq // n).astype(np.int64)
        uc = (uniq % n).astype(np.int64)

        # per-supernode halo, OWN-FIRST layout: slot kh < s is the block's
        # own node b*s + kh (filled from x by reshape, never gathered);
        # slots [s, s + Khe) are the sorted EXTERNAL neighbors — the only
        # part the apply gathers (uniq is row-major sorted, so block ids
        # br are nondecreasing)
        br = ur // s
        bounds = np.searchsorted(br, np.arange(nb + 1))
        if G == 1:
            exts = []
            for b in range(nb):
                h = np.unique(uc[bounds[b]:bounds[b + 1]])
                exts.append(h[(h < b * s) | (h >= (b + 1) * s)])
            Khe = max((len(e) for e in exts), default=0)
            self.Khe = Khe
            self.khe_rows = Khe  # gather rows per block == dof slots
            self.Kh = Kh = s + Khe
            ext_ids = np.full((nb, max(Khe, 1)), n, dtype=np.int32)
            for b, e in enumerate(exts):
                ext_ids[b, : len(e)] = e
            self.ext_ids = ext_ids[:, :Khe]

            # kh slot of each unique pair's column: own -> local index,
            # external -> s + position in the block's sorted ext halo
            kh_u = np.empty(len(uniq), dtype=np.int64)
            for b in range(nb):
                sl = slice(bounds[b], bounds[b + 1])
                c = uc[sl]
                own = (c >= b * s) & (c < (b + 1) * s)
                kh_u[sl] = np.where(
                    own, c - b * s, s + np.searchsorted(exts[b], c)
                )
        else:
            # chunked halo: external slots are whole aligned G-chunks;
            # slot of dof c = s + (chunk position)*G + c%G
            n_chunks_tot = -(-n // G)
            chls = []
            for b in range(nb):
                h = np.unique(uc[bounds[b]:bounds[b + 1]])
                h = h[(h < b * s) | (h >= (b + 1) * s)]
                chls.append(np.unique(h // G))
            khe_rows = max((len(c) for c in chls), default=0)
            self.khe_rows = khe_rows  # gather rows per block (chunks)
            self.Khe = Khe = khe_rows * G  # dof slots per block
            self.Kh = Kh = s + Khe
            # sentinel = n_chunks_tot -> the zero row of the padded
            # (n_chunks_tot + 1, G) gather source
            ext_ids = np.full((nb, max(khe_rows, 1)), n_chunks_tot,
                              dtype=np.int32)
            for b, ch in enumerate(chls):
                ext_ids[b, : len(ch)] = ch
            self.ext_ids = ext_ids[:, :khe_rows]

            kh_u = np.empty(len(uniq), dtype=np.int64)
            for b in range(nb):
                sl = slice(bounds[b], bounds[b + 1])
                c = uc[sl]
                own = (c >= b * s) & (c < (b + 1) * s)
                pos = np.searchsorted(chls[b], c // G)
                kh_u[sl] = np.where(own, c - b * s, s + pos * G + c % G)
        dense_slot = (ur * Kh + kh_u)  # (b*s + i_loc) * Kh + kh

        # -- class-split assembly plans (see module docstring) -------------
        # diagonal entries (i == j): the value tensors expose them as the
        # static (npe, nc) slice ent[k, k, :]; accumulate per NODE through
        # the small per-node plan (multiplicity = cells per node)
        self.diag_plan = make_scatter_plan(cells.T.ravel(), n)
        # off-diagonal entries (i != j): static (npe^2 - npe, nc) slice;
        # accumulate per unique PAIR (multiplicity = cells per edge, ~6)
        ii, jj = np.meshgrid(np.arange(npe), np.arange(npe), indexing="ij")
        off_mask = (ii != jj).ravel()  # over the (i, j) leading axes
        self.off_entry_idx = np.where(off_mask)[0]  # static slice order
        isdiag_u = ur == uc
        off_u = np.where(~isdiag_u)[0]
        self.n_off = len(off_u)
        off_rank = np.full(len(uniq), -1, dtype=np.int64)
        off_rank[off_u] = np.arange(self.n_off)
        e_rows = rflat.reshape(npe, npe, nc)[ii != jj].ravel()
        e_cols = cflat.reshape(npe, npe, nc)[ii != jj].ravel()
        e_pair = np.searchsorted(uniq, e_rows * n + e_cols)
        self.off_plan = make_scatter_plan(off_rank[e_pair], self.n_off)
        # placement: dense slot -> [off-pairs | diag nodes | zero sentinel]
        place = np.full(nb * s * Kh, self.n_off + n, dtype=np.int64)
        place[dense_slot[~isdiag_u]] = off_rank[off_u]
        place[dense_slot[isdiag_u]] = self.n_off + ur[isdiag_u]
        self.place = place.astype(np.int32)

    @property
    def halo_ids(self):
        """Full (nb, Kh) node id per halo slot (sentinel n for padding) —
        diagnostic/reconstruction view; the applies gather only
        :attr:`ext_ids`, own slots come from a reshape of x."""
        own = (np.arange(self.nb)[:, None] * self.s
               + np.arange(self.s)[None, :])
        own = np.where(own < self.n, own, self.n).astype(np.int32)
        if self.halo_chunk == 1:
            ext = self.ext_ids
        else:
            G = self.halo_chunk
            ext = (self.ext_ids[:, :, None].astype(np.int64) * G
                   + np.arange(G)[None, None, :]).reshape(self.nb, -1)
            ext = np.where(ext < self.n, ext, self.n).astype(np.int32)
        return np.concatenate([own, ext], axis=1)

    def tables(self, prefix: str = None):
        """Plan arrays to thread as jit ARGUMENTS (via theta/aux): tens of
        MB at flagship scale — as closure constants they blow the axon
        remote-compile payload limit (HTTP 413)."""
        prefix = prefix or self.prefix
        return {
            prefix + "DiagPull": jnp.asarray(self.diag_plan.pull_table),
            prefix + "OffPull": jnp.asarray(self.off_plan.pull_table),
            prefix + "Place": jnp.asarray(self.place),
            prefix + "Halo": jnp.asarray(self.ext_ids),
        }

    def tables_from_theta(self, theta):
        """This plan's aux-threaded tables out of a theta dict, or None to
        fall back to plan constants (small CPU-test meshes)."""
        if isinstance(theta, dict) and (self.prefix + "Place") in theta:
            return {self.prefix + k: theta[self.prefix + k] for k in (
                "DiagPull", "OffPull", "Place", "Halo")}
        return None

    def _tables_or_const(self, tables):
        if tables is None:
            tables = self.tables()
        p = self.prefix
        return (tables[p + "DiagPull"], tables[p + "OffPull"],
                tables[p + "Place"])

    def assemble(self, entry_values, tables=None):
        """(npe, npe, nc, ...) per-entry values -> (nb, s, Kh, ...).

        Class-split pull-gather: diagonal slice per node, off-diagonal
        slice per unique pair, one placement gather into the dense halo
        layout."""
        npe = self.npe
        diag_pull, off_pull, place = self._tables_or_const(tables)
        tail = entry_values.shape[3:]
        flat = entry_values.reshape((npe * npe, -1) + tail)
        k = jnp.arange(npe)
        diag_flat = flat.reshape((npe, npe) + flat.shape[1:])[k, k].reshape(
            (-1,) + tail
        )
        off_flat = jnp.take(flat, jnp.asarray(self.off_entry_idx), axis=0
                            ).reshape((-1,) + tail)
        diag_vals = pull_accumulate(diag_pull.ravel(), self.n, diag_flat)
        off_vals = pull_accumulate(off_pull.ravel(), self.n_off, off_flat)
        both = jnp.concatenate([off_vals, diag_vals], axis=0)
        pad = [(0, 1)] + [(0, 0)] * (both.ndim - 1)
        both0 = jnp.pad(both, pad)  # zero sentinel row
        if both0.ndim == 1:  # width-2 duplicated rows: fast gather path
            both0 = jnp.stack([both0, both0], axis=-1)
            vals = jnp.take(both0, place, axis=0)[..., 0]
        else:
            vals = jnp.take(both0, place, axis=0)
        out = vals.reshape((self.nb, self.s, self.Kh) + tail)
        if self.shard_ctx is not None:
            # pin the assembled table to the block-sharded layout: the
            # placement gather partitions (indices sharded, per-entry
            # operand replicated — it is O(n), small next to the table)
            import jax as _jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh, axis = self.shard_ctx
            spec = (axis,) + (None,) * (out.ndim - 1)
            out = _jax.lax.with_sharding_constraint(
                out, NamedSharding(mesh, P(*spec))
            )
        return out


def elasticity_entries(mesh_arrays, mu, lam, dtype):
    """(npe, npe, nc, d, d) per-entry elasticity stiffness values (entry
    formulas as ops/ell.py build_ell_elasticity, reference forms
    simulation_tumor_growth.py:110-113)."""
    g, vol = mesh_arrays  # (npe, d, nc), (nc,)
    d = g.shape[1]
    mu = jnp.asarray(mu, dtype)
    lam = jnp.asarray(lam, dtype)
    gg = jnp.sum(g[:, None, :, :] * g[None, :, :, :], axis=2)  # (i, j, nc)
    eye = jnp.eye(d, dtype=dtype)
    term1 = g[None, :, :, None, :] * g[:, None, None, :, :]
    term2 = gg[:, :, None, None, :] * eye[None, None, :, :, None]
    term3 = g[None, :, None, :, :] * g[:, None, :, None, :]
    ent = vol * (mu * (term1 + term2) + lam * term3)  # (i, j, a, b, nc)
    return jnp.moveaxis(ent, -1, 2)  # (i, j, nc, a, b)


def build_bell_elasticity(plan: BellPlan, mesh_arrays, mu, lam, dtype,
                          tables=None):
    """Supernode halo-ELL values of the elasticity stiffness operator,
    laid out (nb, s, d, Kh, d) for the full-lane contraction."""
    W = plan.assemble(
        elasticity_entries(mesh_arrays, mu, lam, dtype), tables
    )  # (nb, s, Kh, d, d)
    return jnp.transpose(W, (0, 1, 3, 2, 4))  # (nb, s, d, Kh, d)


def assemble_fused(plan: BellPlan, ents, tables=None):
    """Assemble SEVERAL operator planes through ONE class-split pull +
    placement gather.

    The placement gather dominates theta-plane assembly (nb*s*Kh dense
    slots, ~5.8M gather rows at 197k tets, ~15 ms each at the measured
    ~0.4 Grow/s) and its row count is independent of the value width —
    row-gathers are flat in width on the v5e (CLAUDE.md perf model).
    Fusing the elasticity/coupling/rd-const/mass builds into one gather of
    concatenated-tail rows cuts the per-simulate assembly cost ~4x.

    ``ents``: list of (npe, npe, nc) + tail entry tensors.  Returns the
    per-plane (nb, s, Kh) + tail tables in order."""
    shapes = [e.shape[3:] for e in ents]
    widths = [int(np.prod(t)) if t else 1 for t in shapes]
    flat = [e.reshape(e.shape[:3] + (w,)) for e, w in zip(ents, widths)]
    cat = flat[0] if len(flat) == 1 else jnp.concatenate(flat, axis=3)
    W = plan.assemble(cat, tables)  # (nb, s, Kh, sum(widths))
    outs, o = [], 0
    for t, w in zip(shapes, widths):
        outs.append(W[..., o:o + w].reshape(W.shape[:3] + t))
        o += w
    return outs


def assemble_scalar_chunked(plan: BellPlan, ent, tables=None,
                            rows_per_chunk: int = None):
    """Memory-bounded scalar-plane assembly for VERY LARGE plans.

    Same math as ``plan.assemble`` for a tail-less entry tensor, but every
    gather stage runs under ``lax.map`` over row chunks with 1-D bodies.
    Rationale: at P2 flagship scale (274k dofs, 7.4M off-diag pairs, 248M
    dense halo slots) the one-shot pull and placement gathers carry small
    trailing dims (multiplicity K, duplicated width 2) that the TPU pads
    to 128 lanes in any materialized layout — the axon AOT planner
    allocates such an intermediate outright (f32[5, 7404096, 6] plans as
    18.9 GB, the round-5 quad-flagship compile OOM).  Chunking bounds
    every transient to O(rows_per_chunk) regardless of fusion decisions;
    the sequential lax.map costs ~0.5-1 s per plane at 248M slots (setup
    or once-per-simulate work, never per CG iteration)."""
    import jax

    npe = plan.npe
    diag_pull, off_pull, place = plan._tables_or_const(tables)
    rc = int(rows_per_chunk or (1 << 19))
    flat = ent.reshape(npe * npe, -1)
    k = jnp.arange(npe)
    diag_flat = flat.reshape(npe, npe, -1)[k, k].reshape(-1)
    off_flat = jnp.take(
        flat, jnp.asarray(plan.off_entry_idx), axis=0
    ).reshape(-1)
    Kd = diag_pull.size // max(plan.n, 1)
    Ko = off_pull.size // max(plan.n_off, 1)
    diag_vals = pull_accumulate(
        diag_pull.ravel(), plan.n, diag_flat,
        chunk_rows=max(1, rc // max(Kd, 1)),
    )
    off_vals = pull_accumulate(
        off_pull.ravel(), plan.n_off, off_flat,
        chunk_rows=max(1, rc // max(Ko, 1)),
    )
    both0 = jnp.pad(jnp.concatenate([off_vals, diag_vals]), (0, 1))
    src = jnp.stack([both0, both0], axis=-1)  # width-2 duplicated rows
    slots = plan.nb * plan.s * plan.Kh
    sent = both0.shape[0] - 1  # the zero sentinel row (== plan default)
    n_chunks = -(-slots // rc)
    pl = jnp.concatenate([
        place.ravel(),
        jnp.full((n_chunks * rc - slots,), sent, place.dtype),
    ]).reshape(n_chunks, rc)

    def body(idx):
        return jnp.take(src, idx, axis=0)[..., 0]

    vals = jax.lax.map(body, pl).reshape(n_chunks * rc)[:slots]
    out = vals.reshape(plan.nb, plan.s, plan.Kh)
    if plan.shard_ctx is not None:
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh, axis = plan.shard_ctx
        out = _jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P(axis, None, None))
        )
    return out


# dense-slot count above which the chunked scalar assembly replaces the
# one-shot gathers (the P1 flagship plan is ~5.8M slots and its fused
# path is measured fast; the P2 flagship plan is 248M slots and OOMs)
_CHUNK_SLOTS = 32_000_000


def assemble_maybe_chunked(plan: BellPlan, ent, tables=None):
    """Scalar-plane assemble that self-selects the memory-bounded path."""
    import os as _os

    thresh = int(_os.environ.get("GLIMS_ASSEMBLE_CHUNK_SLOTS",
                                 str(_CHUNK_SLOTS)))
    if ent.ndim == 3 and plan.nb * plan.s * plan.Kh > thresh:
        return assemble_scalar_chunked(plan, ent, tables)
    return plan.assemble(ent, tables)


def build_bell_coupling_uc(plan: BellPlan, mesh_arrays, mu, lam, coupling,
                           dtype, tables=None):
    """(nb, s, d, Kh) values of the growth-coupling operator C: scalar
    concentration -> vector force, so the elasticity residual evaluates as
    streamed matvecs R = A u + C c - load instead of matrix-free per-cell
    gathers (reference form simulation_tumor_growth.py:110-113, the
    -σ(v):(k c I) term).

    Per cell, the contribution to (node i, comp a) is
    -coupling (2μ + d λ) (vol/(d+1)) g[i, a] · Σ_j c_j — independent of j,
    so ent[i, j, a] = -coupling (2μ + dλ) (vol/(d+1)) g[i, a]."""
    W = plan.assemble(
        coupling_uc_entries(mesh_arrays, mu, lam, coupling, dtype), tables
    )  # (nb, s, Kh, d)
    return jnp.transpose(W, (0, 1, 3, 2))  # (nb, s, d, Kh)


def coupling_uc_entries(mesh_arrays, mu, lam, coupling, dtype):
    """(npe, npe, nc, d) per-entry growth-coupling values (see
    :func:`build_bell_coupling_uc`)."""
    g, vol = mesh_arrays  # (npe, d, nc), (nc,)
    npe, d = g.shape[0], g.shape[1]
    mu = jnp.asarray(mu, dtype)
    lam = jnp.asarray(lam, dtype)
    coupling = jnp.asarray(coupling, dtype)
    kfac = coupling * (2.0 * mu + d * lam) * vol / (d + 1.0)  # (nc,)
    ent = jnp.broadcast_to(
        (-kfac * g)[:, None], (npe, npe, d, g.shape[2])
    )  # (i, j, a, nc)
    return jnp.moveaxis(ent, -1, 2)  # (i, j, nc, a)


def apply_bell_coupling(plan: BellPlan, ext_ids, Wc, c):
    """(n,) concentration -> (n, d) coupling force; Wc (nb, s, d, Kh)."""
    n = c.shape[0]
    nb, s, Kh = plan.nb, plan.s, plan.Kh
    d = Wc.shape[2]
    xh = _halo_scalar(plan, ext_ids, c)
    y = _bmv(plan, Wc.reshape(nb, s * d, Kh), xh)  # (nb, s*d)
    return y.reshape(nb * s, d)[:n]


def apply_bell_coupling_T(plan: BellPlan, ext_ids, WcT, c):
    """Kernel-layout coupling apply; WcT (s*d, Kh, nb) or chunked
    (nb/128, s*d, Kh, 128), c (n,)."""
    from glimslib_tpu.ops.bell_pallas import batched_matvec_T

    n = c.shape[0]
    nb, s = plan.nb, plan.s
    d = (WcT.shape[1] if WcT.ndim == 4 else WcT.shape[0]) // s
    xh = _halo_scalar(plan, ext_ids, c)
    y = batched_matvec_T(WcT, xh.T)  # (s*d, nb)
    return y.T.reshape(nb * s, d)[:n]


def rd_const_entries(mesh_arrays, D, rho, dt, m0, dtype):
    """(npe, npe, nc) entries of M + dt D K - dt rho M (ops/ell.py
    build_ell_rd_const formulas)."""
    g, vol = mesh_arrays
    npe = g.shape[0]
    D = jnp.asarray(D, dtype)
    rho = jnp.asarray(rho, dtype)
    gg = jnp.sum(g[:, None, :, :] * g[None, :, :, :], axis=2)
    eye = jnp.eye(npe, dtype=dtype)[:, :, None]
    M = m0 * (1.0 + eye) * vol
    return M + (dt * D) * (vol * gg) - (dt * rho) * M


def build_bell_rd_const(plan: BellPlan, mesh_arrays, D, rho, dt, m0, dtype,
                        tables=None):
    """(nb, s, Kh) values of M + dt D K - dt rho M."""
    return plan.assemble(
        rd_const_entries(mesh_arrays, D, rho, dt, m0, dtype), tables
    )


def mass_entries(mesh_arrays, m0, dtype):
    """(npe, npe, nc) P1 mass entries m0 (1 + δij) vol."""
    g, vol = mesh_arrays
    npe = g.shape[0]
    eye = jnp.eye(npe, dtype=dtype)[:, :, None]
    return (jnp.asarray(m0, dtype) * (1.0 + eye)) * vol


def build_bell_mass(plan: BellPlan, mesh_arrays, m0, dtype, tables=None):
    """(nb, s, Kh) values of the P1 mass matrix M_ij = ∫ φi φj
    (= m0 (1 + δij) vol per cell) — the c_prev operand of the STREAMED
    rd residual R = W_const c + dtρ/c_max ∫c²φ − M c_prev − load, which
    replaces the per-cell gather+scatter residual evaluation on the
    unstructured path (reference weak form simulation_tumor_growth.py:
    115-120; ~7.3 ms gather eval → ~2 streamed matvecs + the quadratic
    term at 197k tets)."""
    return plan.assemble(mass_entries(mesh_arrays, m0, dtype), tables)


def build_bell_rd_wc(plan: BellPlan, mesh_arrays, cells_T, c, rho, dt, t0,
                     conc_max, dtype, tables=None):
    """(nb, s, Kh) values of the logistic Jacobian correction
    +2 dt rho W(c)/c_max (ops/ell.py build_ell_rd_wc formulas)."""
    g, vol = mesh_arrays
    npe = g.shape[0]
    rho = jnp.asarray(rho, dtype)
    ce = jnp.take(jnp.stack([c, c], axis=-1), cells_T.ravel(), axis=0)[
        :, 0
    ].reshape(npe, -1)  # row-packed gather, (npe, nc)
    S = jnp.sum(ce, axis=0)
    eye = jnp.eye(npe, dtype=dtype)[:, :, None]
    W = (vol * t0) * (
        S + ce[:, None, :] + ce[None, :, :] + eye * (S + 2.0 * ce[:, None, :])
    )
    ent = (2.0 * dt / conc_max) * rho * W
    return plan.assemble(ent, tables)


def build_bell_rd_wc_lumped(plan: BellPlan, mesh_arrays, cells_T, c, rho,
                            dt, t0, conc_max, dtype, tables=None):
    """(n,) LUMPED logistic Jacobian correction: the row sums of
    :func:`build_bell_rd_wc` (Σ_j ∫ c φi φj = ∫ c φi since Σ_j φj = 1).

    Used by the chord (modified-Newton) operator only — the frozen
    Jacobian is already inexact, and replacing its consistent-mass
    logistic term by the lumped diagonal skips the ~56 ms supernode
    halo-ELL assembly per step at 197k tets.  Newton still measures the
    exact residual, so converged states (and the IFT adjoint, which keeps
    the exact Jacobian) are unchanged.

    Row-sum identity per cell: Σ_j (S + cᵢ + cⱼ + δᵢⱼ(S + 2cᵢ))
    = (npe+2)(S + cᵢ), so the per-(node, cell) contribution is
    vol·t0·(npe+2)·(S + cᵢ), accumulated through the per-node diag plan.
    """
    g, vol = mesh_arrays
    npe = g.shape[0]
    rho = jnp.asarray(rho, dtype)
    ce = jnp.take(jnp.stack([c, c], axis=-1), cells_T.ravel(), axis=0)[
        :, 0
    ].reshape(npe, -1)  # row-packed gather, (npe, nc)
    S = jnp.sum(ce, axis=0)
    contrib = (2.0 * dt / conc_max) * rho * (vol * t0) * (npe + 2.0) * (
        S + ce
    )  # (npe, nc)
    diag_pull = (
        tables["_BellDiagPull"] if tables is not None
        else jnp.asarray(plan.diag_plan.pull_table)
    )
    return pull_accumulate(diag_pull.ravel(), plan.n, contrib.ravel())


def _halo_vector(plan: BellPlan, ext_ids, x):
    """(nb, Kh*d) halo operand: own slots by reshape, external by gather
    (chunk rows of x.reshape(-1, G*d) when the plan uses a chunked halo)."""
    n, d = x.shape
    nb, s, G = plan.nb, plan.s, plan.halo_chunk
    xo = jnp.pad(x, ((0, plan.n_pad - n), (0, 0))).reshape(nb, s * d)
    if G == 1:
        xp = jnp.pad(x, ((0, 1), (0, 0)))
        xe = jnp.take(xp, ext_ids.ravel(), axis=0).reshape(
            nb, plan.Khe * d
        )
    else:
        nch = -(-n // G)
        xp = jnp.pad(x, ((0, nch * G - n), (0, 0))).reshape(nch, G * d)
        xp = jnp.pad(xp, ((0, 1), (0, 0)))  # zero sentinel chunk
        xe = jnp.take(xp, ext_ids.ravel(), axis=0).reshape(
            nb, plan.Khe * d
        )
    return jnp.concatenate([xo, xe], axis=1)


def _halo_scalar(plan: BellPlan, ext_ids, x):
    """(nb, Kh) halo operand; width-2 duplicated rows (or (G,)-wide chunk
    rows) keep the external gather on the fast row path."""
    n = x.shape[0]
    nb, s, G = plan.nb, plan.s, plan.halo_chunk
    xo = jnp.pad(x, (0, plan.n_pad - n)).reshape(nb, s)
    if G == 1:
        xp = jnp.pad(jnp.stack([x, x], axis=-1), ((0, 1), (0, 0)))
        xe = jnp.take(xp, ext_ids.ravel(), axis=0)[:, 0].reshape(
            nb, plan.Khe
        )
    else:
        nch = -(-n // G)
        xp = jnp.pad(x, (0, nch * G - n)).reshape(nch, G)
        xp = jnp.pad(xp, ((0, 1), (0, 0)))  # zero sentinel chunk
        xe = jnp.take(xp, ext_ids.ravel(), axis=0).reshape(nb, plan.Khe)
    return jnp.concatenate([xo, xe], axis=1)


def apply_bell_vector(plan: BellPlan, ext_ids, W, x):
    """y[i, a] = halo-gather + dense local contraction; W (nb, s, d, Kh, d),
    x (n, d).  The contraction runs as a streamed Pallas batched matvec on
    TPU f32 (ops/bell_pallas.py — XLA leaves the (nb, s*d, Kh*d) product
    unfused through HBM, ~1.7x the roofline); per-device under block
    sharding (see :func:`_bmv`)."""
    n, d = x.shape
    nb, s, Kh = plan.nb, plan.s, plan.Kh
    xh = _halo_vector(plan, ext_ids, x)
    y = _bmv(plan, W.reshape(nb, s * d, Kh * d), xh)  # (nb, s*d)
    return y.reshape(nb * s, d)[:n]


def apply_bell_scalar(plan: BellPlan, ext_ids, W, x):
    """Scalar halo-ELL matvec; W (nb, s, Kh), x (n,)."""
    n = x.shape[0]
    nb, s = plan.nb, plan.s
    xh = _halo_scalar(plan, ext_ids, x)
    y = _bmv(plan, W, xh)  # (nb, s)
    return y.reshape(nb * s)[:n]


# -- block-axis-on-lanes applies (Pallas fast path, ops/bell_pallas.py) ------
#
# Tables pre-transposed ONCE per simulate to (M, K, nb) with the block
# axis on lanes (models/base.py _augment_theta_with_operators); the
# gathered halo vector is transposed per matvec (2 MB, ~0.05 ms) — the
# contraction then runs as a pure multiply-accumulate at streaming
# bandwidth instead of the ~0.65 ms cross-lane-reduce floor.


def bell_T_available(plan: BellPlan, d: int):
    """True when the block-lanes kernels can run for this plan (TPU f32
    path; callers must also check dtype).  Each table independently uses
    the chunk-contiguous (nb/128, M, K, 128) layout when available (full-
    bandwidth DMA, ops/bell_pallas.py bmv_C) or the (M, K, nb) layout."""
    from glimslib_tpu.ops import bell_pallas as bp

    def ok(m, k):
        return bp.bmv_T_available(plan.nb, m, k) or bp.bmv_C_available(
            plan.nb, m, k
        )

    s, Kh = plan.s, plan.Kh
    return (
        (bp.pallas_enabled() or bp._interpret())
        and ok(s * d, Kh * d)
        and ok(s, Kh)
        and ok(s * d, s * d)
        and ok(s * d, Kh)
    )


def _to_kernel_layout(A3):
    """(nb, M, K) -> the batched_matvec_T kernel layout: chunk-contiguous
    (nb/128, M, K, 128) when the C kernel fits (one contiguous DMA per
    grid block — ~2.5x the effective stream bandwidth of the strided
    (M, K, nb) layout at flagship shapes), else (M, K, nb)."""
    from glimslib_tpu.ops import bell_pallas as bp

    nb, M, K = A3.shape
    if bp.bmv_C_available(nb, M, K):
        return jnp.transpose(A3.reshape(nb // 128, 128, M, K), (0, 2, 3, 1))
    return jnp.transpose(A3, (1, 2, 0))


def transpose_tables_T(plan: BellPlan, W=None, Wrd=None, Binv=None,
                       Minv=None, Wc=None, Mrd=None):
    """One-time (per simulate) relayouts to the batched_matvec_T kernel
    layouts (see :func:`_to_kernel_layout`; applies dispatch on ndim).

    W (nb, s, d, Kh, d) flattens to (nb, s*d, Kh*d); Wrd/Mrd (nb, s, Kh);
    Wc (nb, s, d, Kh) -> (nb, s*d, Kh); Binv/Minv (nb, m, m) (self-blocks
    are symmetric, so the two m axes are interchangeable)."""
    out = {}
    if Mrd is not None:
        out["_BellMrdT"] = _to_kernel_layout(Mrd)
    if W is not None:
        nb, s, d, Kh, _ = W.shape
        out["_BellWelT"] = _to_kernel_layout(W.reshape(nb, s * d, Kh * d))
    if Wc is not None:
        nb, s, d, Kh = Wc.shape
        out["_BellCucT"] = _to_kernel_layout(Wc.reshape(nb, s * d, Kh))
    if Wrd is not None:
        out["_BellWrdCT"] = _to_kernel_layout(Wrd)
    if Binv is not None:
        out["_BinvSNT"] = _to_kernel_layout(Binv)
    if Minv is not None:
        out["_McSNT"] = _to_kernel_layout(Minv)
    return out


def from_kernel_layout(A):
    """Inverse of :func:`_to_kernel_layout`: kernel-layout table (either
    (M, K, nb) or chunked (nb/128, M, K, 128)) -> canonical (nb, M, K).
    Diagnostic/tool helper; not on any hot path."""
    if A.ndim == 4:
        nbc, M, K, L = A.shape
        return jnp.transpose(A, (0, 3, 1, 2)).reshape(nbc * L, M, K)
    return jnp.transpose(A, (2, 0, 1))


def apply_bell_vector_T(plan: BellPlan, ext_ids, WT, x):
    """Block-lanes halo-ELL matvec; WT (s*d, Kh*d, nb), x (n, d)."""
    from glimslib_tpu.ops.bell_pallas import batched_matvec_T

    n, d = x.shape
    nb, s = plan.nb, plan.s
    xh = _halo_vector(plan, ext_ids, x)
    y = batched_matvec_T(WT, xh.T)  # (s*d, nb)
    return y.T.reshape(nb * s, d)[:n]


def apply_bell_scalar_T(plan: BellPlan, ext_ids, WT, x):
    """Block-lanes scalar halo-ELL matvec; WT (s, Kh, nb), x (n,)."""
    from glimslib_tpu.ops.bell_pallas import batched_matvec_T

    n = x.shape[0]
    nb, s = plan.nb, plan.s
    xh = _halo_scalar(plan, ext_ids, x)
    y = batched_matvec_T(WT, xh.T)  # (s, nb)
    return y.T.reshape(nb * s)[:n]


def apply_supernode_jacobi_T(plan: BellPlan, BinvT, r):
    """Kernel-layout supernode dense solve; BinvT (m, m, nb) or chunked
    (nb/128, m, m, 128), r (n, d)/(n,)."""
    from glimslib_tpu.ops.bell_pallas import batched_matvec_T

    m = BinvT.shape[1]
    nb = plan.nb
    shape = r.shape
    rp = jnp.pad(r.reshape(-1), (0, nb * m - r.reshape(-1).shape[0]))
    z = batched_matvec_T(BinvT, rp.reshape(nb, m).T)  # (m, nb)
    return z.T.reshape(-1)[: r.reshape(-1).shape[0]].reshape(shape)


# -- supernode block-Jacobi --------------------------------------------------


def extract_self_blocks_vector(plan: BellPlan, W):
    """Self-block (s*d x s*d) of each supernode from (nb, s, d, Kh, d) —
    the own-first halo layout puts them in the static first-s slots."""
    nb, s, Kh = plan.nb, plan.s, plan.Kh
    d = W.shape[2]
    Wf = W.reshape(nb, s * d, Kh, d)
    return Wf[:, :, :s, :].reshape(nb, s * d, s * d)


def extract_self_blocks_scalar(plan: BellPlan, W):
    """Self-block (s x s) of each supernode from (nb, s, Kh)."""
    return W[:, :, : plan.s]


def supernode_jacobi_inverse(plan: BellPlan, B, mask=None):
    """Invert per-supernode self-blocks; masked dofs get identity rows.

    ``B`` (nb, m, m) with m = s*d (vector) or s (scalar); ``mask`` (n, d)
    or (n,) bool.  Padded tail dofs of the last block also get identity.
    """
    nb, m = B.shape[0], B.shape[1]
    dtype = B.dtype
    pad_dofs = plan.n_pad * (m // plan.s) - plan.n * (m // plan.s)
    flat_mask = jnp.zeros((nb * m,), bool)
    if mask is not None:
        flat_mask = jnp.pad(
            jnp.asarray(mask).reshape(-1), (0, pad_dofs),
            constant_values=True,
        )
    else:
        flat_mask = jnp.pad(
            jnp.zeros((plan.n * (m // plan.s),), bool), (0, pad_dofs),
            constant_values=True,
        )
    fm = flat_mask.reshape(nb, m)
    keep = 1.0 - fm.astype(dtype)
    B = B * keep[:, :, None] * keep[:, None, :]
    eye = jnp.eye(m, dtype=dtype)[None]
    B = B + eye * fm.astype(dtype)[:, :, None]
    if plan.shard_ctx is not None:
        # per-device batched inverse of the local block slab (batched LU
        # does not partition under plain GSPMD propagation)
        mesh, axis = plan.shard_ctx
        from jax.sharding import PartitionSpec as P

        return _shard_map(
            jnp.linalg.inv, mesh=mesh, in_specs=(P(axis),),
            out_specs=P(axis),
        )(B)
    return jnp.linalg.inv(B)


def apply_supernode_jacobi(plan: BellPlan, Binv, r):
    """r (n, d) or (n,) -> per-supernode dense solve (streamed Pallas
    batched matvec on TPU f32, XLA mul+reduce fallback); per-device under
    block sharding (see :func:`_bmv`)."""
    nb, m = Binv.shape[0], Binv.shape[1]
    shape = r.shape
    rp = jnp.pad(r.reshape(-1), (0, nb * m - r.reshape(-1).shape[0]))
    z = _bmv(plan, Binv, rp.reshape(nb, m))  # (nb, m)
    return z.reshape(-1)[: r.reshape(-1).shape[0]].reshape(shape)
