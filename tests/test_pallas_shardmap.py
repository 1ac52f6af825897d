"""Interpret-mode Pallas under shard_map (VERDICT r4 #8).

On real multi-chip TPUs, ``use_sharding(mode='bell')`` runs the
per-device supernode contractions as Pallas kernels inside ``shard_map``
(ops/bell.py ``_bmv`` -> ops/bell_pallas.batched_matvec).  This
environment has no multi-chip hardware, so these tests execute the SAME
shard_map-wrapped kernels in Pallas interpret mode on the 8-device CPU
mesh and check equivalence against the XLA fallback path — de-risking
the first real multi-chip run.  Kill-switch on hardware: GLIMS_PALLAS=0
falls every contraction back to the XLA mul+reduce inside the same
shard_map (documented in docs/numerics.md), so a bad first run can
bisect kernel-vs-sharding cleanly.

Reference analogue: distributed assembly/solve under mpirun
(reference README.md:142-183).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import PartitionSpec as P

from glimslib_tpu.core.mesh import Mesh, box_mesh
from glimslib_tpu.ops import bell
from glimslib_tpu.ops.bell import _shard_map
from glimslib_tpu.ops.bell_pallas import batched_matvec, _pick_batch_group
from glimslib_tpu.parallel.shard import make_device_mesh

NDEV = 8


def test_batched_matvec_under_shard_map_interpret(monkeypatch):
    """The grouped batched-matvec kernel, wrapped in shard_map exactly as
    ops/bell.py _bmv does, must reproduce the XLA mul+reduce reference
    when each device runs the Pallas kernel (interpret mode) on its own
    block slab."""
    B, M, K = 128, 24, 48
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((B, M, K)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    # per-device slab must actually hit the kernel, not the g=0 fallback
    assert _pick_batch_group(B // NDEV, M, K) > 0

    want = np.asarray(jnp.sum(A * x[:, None, :], axis=2))

    monkeypatch.setenv("GLIMS_PALLAS_INTERPRET", "1")
    dmesh = make_device_mesh(NDEV)
    fn = _shard_map(
        batched_matvec, mesh=dmesh,
        in_specs=(P("mesh_x"), P("mesh_x")), out_specs=P("mesh_x"),
    )
    got = np.asarray(jax.jit(fn)(A, x))
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()


@pytest.fixture(scope="module")
def plan128():
    """A BellPlan whose block count pads to exactly one lane tile (128):
    9x9x9 box -> 1000 nodes, s=8 -> nb_real=125 -> nb=128, so the
    8-device mesh gets 16 blocks each — the same divisibility the bell
    gate requires at flagship scale."""
    mesh = box_mesh((0, 0, 0), (1, 1, 1), 9, 9, 9)
    mesh = Mesh.from_arrays(mesh.points, mesh.cells).reordered_morton()
    plan = bell.BellPlan(mesh, s=8)
    assert plan.nb == 128 and plan.nb % NDEV == 0
    from glimslib_tpu.ops.assembly import P1Kernels

    k = P1Kernels(mesh)
    mids = mesh.cell_midpoints
    mu = jnp.asarray(1.0 + mids[:, 0])
    lam = jnp.asarray(2.0 + mids[:, 1])
    W = bell.build_bell_elasticity(plan, (k.grads_T, k.vol), mu, lam,
                                   k.dtype)
    return mesh, plan, W


def test_bell_apply_shardmap_interpret(plan128, monkeypatch):
    """apply_bell_vector with plan.shard_ctx set (per-device Pallas via
    interpret) == the single-device XLA apply."""
    mesh, plan, W = plan128
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((mesh.n_nodes, 3)), jnp.float32)
    Wf = W.astype(jnp.float32)
    ext = jnp.asarray(plan.ext_ids)

    plan.shard_ctx = None
    want = np.asarray(bell.apply_bell_vector(plan, ext, Wf, u))

    monkeypatch.setenv("GLIMS_PALLAS_INTERPRET", "1")
    dmesh = make_device_mesh(NDEV)
    plan.shard_ctx = (dmesh, "mesh_x")
    try:
        assert _pick_batch_group(plan.nb // NDEV, plan.s * 3,
                                 plan.Kh * 3) > 0
        got = np.asarray(bell.apply_bell_vector(plan, ext, Wf, u))
    finally:
        plan.shard_ctx = None
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


def test_supernode_jacobi_shardmap_interpret(plan128, monkeypatch):
    """apply_supernode_jacobi (the per-CG-iteration preconditioner) under
    block sharding with per-device Pallas (interpret) == XLA."""
    mesh, plan, W = plan128
    rng = np.random.default_rng(2)
    B = bell.extract_self_blocks_vector(plan, W)
    Binv = np.asarray(bell.supernode_jacobi_inverse(plan, B)).astype(
        np.float32
    )
    Binv = jnp.asarray(Binv)
    r = jnp.asarray(rng.standard_normal((mesh.n_nodes, 3)), jnp.float32)

    plan.shard_ctx = None
    want = np.asarray(bell.apply_supernode_jacobi(plan, Binv, r))

    monkeypatch.setenv("GLIMS_PALLAS_INTERPRET", "1")
    dmesh = make_device_mesh(NDEV)
    plan.shard_ctx = (dmesh, "mesh_x")
    try:
        got = np.asarray(bell.apply_supernode_jacobi(plan, Binv, r))
    finally:
        plan.shard_ctx = None
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()
