"""Boundary conditions: Dirichlet dof masks and von-Neumann facet kernels.

Rebuild of reference ``helper_classes.py`` ``BoundaryConditions`` (l.618-908).
The same specification dictionaries are accepted
(e.g. test_case_simulation_tumor_growth_2D_uniform.py:41-51):

    dirichlet_bcs = {'clamped': {'bc_value': (0.0, 0.0),
                                 'named_boundary': 'boundary_all',
                                 'subspace_id': 0}}
    von_neumann_bcs = {'flux': {'bc_value': 1.0,
                                'named_boundary': 'boundary_all',
                                'subspace_id': 1}}

with boundaries referenced by ``boundary`` (predicate), ``named_boundary``
(string), or ``subdomain_boundary`` (inter-tissue name) — helper_classes.py:632-723.

Instead of ``fenics.DirichletBC`` objects, Dirichlet conditions compile to a
per-subspace (mask, values) pair used by the solvers for symmetric dof
elimination.  Instead of UFL surface-integral terms
(``implement_von_neumann_bc``, helper_classes.py:861-908), von-Neumann
conditions compile to :class:`~glimslib_tpu.ops.assembly.FacetKernels`
whose residual contributions the models add per step.

Time-dependent values: ``bc_value`` may be a callable ``f(x, t)`` (any
jax-traceable function of coords (n,d) and scalar time) — the analogue of
``Expression.t`` updates (helper_classes.py:839-859) but evaluated *inside*
the jitted step so the time loop stays on device.

Like the reference (l.740-767), von-Neumann BCs apply to exterior facets
only; interior (dS) integrals are not supported.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from glimslib_tpu.core.subdomains import _eval_predicate

logger = logging.getLogger(__name__)


def _facet_kernels(*args, **kw):
    # deferred: core <-> ops would otherwise be a circular import when the
    # ops package is imported first
    from glimslib_tpu.ops.assembly import FacetKernels

    return FacetKernels(*args, **kw)


def _p2_facet_kernels(*args, **kw):
    from glimslib_tpu.ops.p2 import P2FacetKernels

    return P2FacetKernels(*args, **kw)


def _facet_edge_dofs(mesh, facet_vertex_sets: np.ndarray) -> np.ndarray:
    """Edge-midpoint dof ids (offset by n_nodes) of the facets given as
    (nf, d) vertex-node arrays — the P2 dofs a facet carries beyond its
    vertices."""
    if len(facet_vertex_sets) == 0:
        return np.zeros(0, dtype=np.int64)
    d = mesh.dim
    if d == 2:
        pairs = facet_vertex_sets  # a 2D facet is itself one edge
    else:
        pairs = np.concatenate(
            [
                facet_vertex_sets[:, [0, 1]],
                facet_vertex_sets[:, [0, 2]],
                facet_vertex_sets[:, [1, 2]],
            ],
            axis=0,
        )
    eids = np.unique(mesh.edge_ids_for_pairs(pairs))
    return mesh.n_nodes + eids.astype(np.int64)


class DirichletBC:
    """Compiled Dirichlet condition on one subspace."""

    def __init__(self, subspace_id, nodes, value, coords, value_size, dtype=np.float64):
        self.subspace_id = subspace_id
        self.nodes = np.asarray(nodes, dtype=np.int64)
        self.value = value  # constant array or callable(x, t)
        self.coords = coords  # (n_bc_nodes, dim)
        self.value_size = value_size
        self.dtype = dtype

    def values_at(self, t=0.0):
        n = len(self.nodes)
        shape = (n, self.value_size) if self.value_size > 1 else (n,)
        if callable(self.value):
            v = self.value(self.coords, t)
            return jnp.broadcast_to(jnp.asarray(v), shape)
        v = np.asarray(self.value, dtype=self.dtype)
        if v.ndim == 0:
            return jnp.broadcast_to(jnp.asarray(v), shape)
        if self.value_size > 1 and v.shape == (self.value_size,):
            return jnp.broadcast_to(jnp.asarray(v), shape)
        return jnp.asarray(v)

    @property
    def is_time_dependent(self):
        return callable(self.value)


class BoundaryConditions:
    """Compiles BC spec dicts into masks/kernels over a FunctionSpace+SubDomains."""

    def __init__(self, functionspace, subdomains, dtype=np.float64):
        self._functionspace = functionspace
        self._subdomains = subdomains
        self.dtype = dtype
        self.dirichlet_bcs: List[DirichletBC] = []
        self.dirichlet_bcs_dict = {}
        self.von_neumann_bcs: Dict[str, dict] = {}
        self.von_neumann_bcs_dict = {}

    # -- Dirichlet (helper_classes.py:632-723) ------------------------------

    def setup_dirichlet_boundary_conditions(self, dirichlet_bcs=None):
        dirichlet_bcs = dirichlet_bcs or {}
        self.dirichlet_bcs_dict = dirichlet_bcs
        for bc_name, bc_dict in dirichlet_bcs.items():
            bc = self._construct_dirichlet_bc(bc_dict)
            if bc is not None:
                self.dirichlet_bcs.append(bc)
            else:
                logger.warning("Dirichlet BC '%s' incomplete -- skipping", bc_name)

    def _boundary_nodes_for(self, bc_dict) -> Optional[np.ndarray]:
        m = self._subdomains.mesh
        if "boundary" in bc_dict:
            pred = bc_dict["boundary"]
            bn = m.boundary_nodes
            ok = _eval_predicate(pred, m.points[bn], True)
            return bn[ok]
        if "subdomain_boundary" in bc_dict:
            name = bc_dict["subdomain_boundary"]
            if name in self._subdomains.subdomain_boundaries_id_dict:
                return self._subdomains.subdomain_boundary_nodes(name)
            return None
        if "named_boundary" in bc_dict:
            name = bc_dict["named_boundary"]
            bid = self._subdomains.named_boundaries_id_dict.get(name)
            if bid is None:
                return None
            fidx = self._subdomains.named_boundary_facets(name)
            return np.unique(m.boundary_facet_nodes[fidx].ravel())
        return None

    def _boundary_facet_vertex_sets_for(self, bc_dict) -> Optional[np.ndarray]:
        """Facets covered by the BC spec, as (nf, d) vertex-node arrays.

        Used to locate P2 edge dofs (topological semantics, like
        ``fenics.DirichletBC`` 'topological' method: a facet belongs to the
        BC when all its vertices do)."""
        m = self._subdomains.mesh
        if "boundary" in bc_dict:
            pred = bc_dict["boundary"]
            ok = np.zeros(m.n_nodes, dtype=bool)
            bn = m.boundary_nodes
            ok[bn[_eval_predicate(pred, m.points[bn], True)]] = True
            sel = ok[m.boundary_facet_nodes].all(axis=1)
            return m.boundary_facet_nodes[sel]
        if "subdomain_boundary" in bc_dict:
            name = bc_dict["subdomain_boundary"]
            if name in self._subdomains.subdomain_boundaries_id_dict:
                return self._subdomains.subdomain_boundary_facet_nodes(name)
            return None
        if "named_boundary" in bc_dict:
            name = bc_dict["named_boundary"]
            if self._subdomains.named_boundaries_id_dict.get(name) is None:
                return None
            fidx = self._subdomains.named_boundary_facets(name)
            return m.boundary_facet_nodes[fidx]
        return None

    def _construct_dirichlet_bc(self, bc_dict) -> Optional[DirichletBC]:
        if "bc_value" not in bc_dict:
            logger.error("Dirichlet BC dict missing 'bc_value'")
            return None
        subspace_id = bc_dict.get("subspace_id")
        if self._functionspace.has_subspaces and subspace_id is None:
            logger.error("Dirichlet BC dict missing 'subspace_id'")
            return None
        subspace_id = subspace_id or 0
        nodes = self._boundary_nodes_for(bc_dict)
        if nodes is None:
            return None
        ss = self._functionspace.subspaces.get_subspace(subspace_id)
        if ss.degree == 2:
            # constrain the facet edge-midpoint dofs too (fenics.DirichletBC
            # topological semantics over the full P2 dof set), and map
            # vertex-node ids through the shared interleaved P2 dof layout
            # (ops/p2.py p2_dof_layout)
            from glimslib_tpu.ops.p2 import p2_dof_layout

            m = self._subdomains.mesh
            _, rank, _ = p2_dof_layout(m)
            nodes = rank[np.asarray(nodes, np.int64)]
            fvs = self._boundary_facet_vertex_sets_for(bc_dict)
            if fvs is not None and len(fvs):
                nodes = np.concatenate(
                    [nodes, rank[_facet_edge_dofs(m, fvs)]]
                )
        coords = self._functionspace.dof_coordinates(subspace_id)[nodes]
        return DirichletBC(
            subspace_id, nodes, bc_dict["bc_value"], coords, ss.value_size, self.dtype
        )

    def dirichlet_mask_and_values(self, subspace_id: int, t=0.0):
        """(mask, values) over the subspace dof array; both jnp, shaped like
        the field.  Empty -> (zeros mask, zeros)."""
        ss = self._functionspace.subspaces.get_subspace(subspace_id)
        shape = ss.shape
        mask = np.zeros(shape, dtype=bool)
        vals = jnp.zeros(shape)
        for bc in self.dirichlet_bcs:
            if bc.subspace_id != subspace_id:
                continue
            mask[bc.nodes] = True
            vals = vals.at[bc.nodes].set(bc.values_at(t))
        return jnp.asarray(mask), vals

    @property
    def has_time_dependent_dirichlet(self):
        return any(bc.is_time_dependent for bc in self.dirichlet_bcs)

    # -- von Neumann (helper_classes.py:725-908) ----------------------------

    def setup_von_neumann_boundary_conditions(self, von_neumann_bcs=None):
        von_neumann_bcs = von_neumann_bcs or {}
        self.von_neumann_bcs_dict = von_neumann_bcs
        m = self._subdomains.mesh
        n_nodes = m.n_nodes
        for bc_name, bc_dict in von_neumann_bcs.items():
            if "bc_value" not in bc_dict:
                logger.error("von Neumann BC '%s' missing 'bc_value'", bc_name)
                continue
            subspace_id = bc_dict.get("subspace_id")
            if self._functionspace.has_subspaces and subspace_id is None:
                logger.error("von Neumann BC '%s' missing 'subspace_id'", bc_name)
                continue
            fidx = None
            interior_nodes = interior_cells = None
            if "named_boundary" in bc_dict:
                try:
                    fidx = self._subdomains.named_boundary_facets(
                        bc_dict["named_boundary"]
                    )
                except KeyError:
                    fidx = None
            elif "subdomain_boundary" in bc_dict:
                name = bc_dict["subdomain_boundary"]
                if bc_dict.get("measure", "ds") == "dS":
                    # Interior-facet 'dS' integration — EXCEEDS the
                    # reference, which binds subdomain_boundary BCs to the
                    # exterior 'ds' measure and documents that they
                    # therefore contribute zero (helper_classes.py:747-767).
                    # Opt-in via measure='dS': the surface integral runs
                    # over the actual inter-tissue facets (φ is continuous
                    # across them, so the flux/traction kernels apply
                    # unchanged); per-facet coefficients come from the
                    # lower-id adjacent cell.
                    ss_ = self._functionspace.subspaces.get_subspace(
                        subspace_id or 0
                    )
                    if ss_.degree == 2:
                        raise NotImplementedError(
                            "measure='dS' von Neumann BCs support P1 "
                            "subspaces only"
                        )
                    if name not in self._subdomains.subdomain_boundaries_id_dict:
                        logger.warning(
                            "von Neumann BC '%s': unknown subdomain "
                            "boundary '%s' -- skipping", bc_name, name,
                        )
                        continue
                    interior_nodes = (
                        self._subdomains.subdomain_boundary_facet_nodes(name)
                    )
                    interior_cells = (
                        self._subdomains.subdomain_boundary_facet_cells(name)
                    )

                    def factory(dtype, m=m, fn=interior_nodes, nn=n_nodes):
                        return _facet_kernels(
                            m, None, nn, dtype=dtype, facet_nodes=fn
                        )

                    self.von_neumann_bcs[bc_name] = {
                        "bc_value": bc_dict["bc_value"],
                        "kernels": factory(self.dtype),
                        "kernel_factory": factory,
                        "subspace_id": subspace_id,
                        "facet_idx": np.arange(len(interior_nodes)),
                        "facet_cells": interior_cells[:, 0],
                    }
                    continue
                # Reference semantics (helper_classes.py:819-825): the BC is
                # bound to the exterior-facet 'ds' measure restricted to the
                # inter-tissue marker.  Inter-tissue facets are interior by
                # construction, so the integral runs over the (empty)
                # intersection with the exterior boundary and contributes
                # zero — the limitation the reference documents at
                # helper_classes.py:747-756.
                if name not in self._subdomains.subdomain_boundaries_id_dict:
                    fidx = None
                else:
                    fidx = self._subdomains.subdomain_boundary_exterior_facets(
                        name
                    )
                    if len(fidx) == 0:
                        logger.warning(
                            "von Neumann BC '%s': subdomain boundary '%s' "
                            "marks interior facets only; the exterior 'ds' "
                            "measure integrates over none of them, so this "
                            "BC contributes zero (reference "
                            "helper_classes.py:747-767 semantics). Pass "
                            "measure='dS' to integrate over the interior "
                            "facets themselves (exceeds the reference), or "
                            "use tissue-wise coefficients (D=0) to isolate "
                            "subdomains.",
                            bc_name, name,
                        )
            if fidx is None:
                logger.warning("von Neumann BC '%s' incomplete -- skipping", bc_name)
                continue
            ss = self._functionspace.subspaces.get_subspace(subspace_id or 0)
            if ss.degree == 2:
                if ss.value_size != 1:
                    raise NotImplementedError(
                        "von Neumann BCs on degree-2 vector subspaces are "
                        "not supported (reference has no such case)"
                    )

                def factory(dtype, m=m, fidx=fidx, nd=ss.n_dofs):
                    return _p2_facet_kernels(m, fidx, nd, dtype=dtype)
            else:

                def factory(dtype, m=m, fidx=fidx, nn=n_nodes):
                    return _facet_kernels(m, fidx, nn, dtype=dtype)

            self.von_neumann_bcs[bc_name] = {
                "bc_value": bc_dict["bc_value"],
                "kernels": factory(self.dtype),
                "kernel_factory": factory,
                "subspace_id": subspace_id,
                "facet_idx": fidx,
                "facet_cells": m.boundary_facet_cell[fidx],
            }

    def von_neumann_kernels(self, bc, hi=False):
        """Facet kernels of one vN BC entry; ``hi=True`` returns (and caches)
        an f64-table rebuild for mixed-precision refinement defect residuals
        (advisor r2: hi residuals must not reuse working-dtype facet
        tables)."""
        if not hi:
            return bc["kernels"]
        if "kernels_hi" not in bc:
            import jax.numpy as jnp

            bc["kernels_hi"] = bc["kernel_factory"](jnp.float64)
        return bc["kernels_hi"]

    def von_neumann_residual(self, subspace_id: int, t=0.0, scale=1.0,
                             hi=False):
        """Sum of surface-integral contributions ∫ q φ_i ds (scalar subspace)
        or ∫ t·v ds (vector subspace) for all BCs on ``subspace_id``; returns
        None when there are none.  ``scale`` multiplies the value (used for
        the dt·D factor the reference applies at
        simulation_tumor_growth.py:120).  ``hi=True`` evaluates with f64
        facet tables (mixed-precision refinement defect residuals)."""
        out = None
        for name, bc in self.von_neumann_bcs.items():
            if bc["subspace_id"] != subspace_id:
                continue
            kern = self.von_neumann_kernels(bc, hi=hi)
            val = bc["bc_value"]
            ss = self._functionspace.subspaces.get_subspace(subspace_id)
            if callable(val):
                # evaluate at the kernel's value points: facet nodes for P1,
                # facet quadrature points for P2 — coords (nf, k, dim)
                coords = kern.value_coords
                v = val(coords.reshape(-1, coords.shape[-1]), t)
                if ss.value_size == 1:
                    v = jnp.reshape(v, coords.shape[:2])
                else:
                    v = jnp.reshape(v, coords.shape[:2] + (ss.value_size,))
            else:
                v = jnp.asarray(val)
            if ss.value_size == 1:
                term = kern.scalar_flux_residual(v) * scale
            else:
                term = kern.traction_residual(v) * scale
            out = term if out is None else out + term
        return out

    def time_update_bcs(self, time, kind="dirichlet"):
        """Reference API compatibility (helper_classes.py:839-859): values
        are callables evaluated at solve time, so this is a no-op."""
