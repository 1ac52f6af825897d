"""GSPMD node-sharded stencil execution == single-device results."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glimslib_tpu.parallel.gspmd import shard_simulate
from glimslib_tpu.parallel.shard import make_device_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)


def _brain(n):
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _brain_sim

    return _brain_sim(n=n, dims=3)


def test_gspmd_matches_single_device():
    sim = _brain(7)  # 8^3 = 512 nodes, divisible by 8
    assert sim.mesh.n_nodes % len(jax.devices()) == 0
    theta = sim.make_theta(sim.params.as_dict())
    iv = sim.params.create_initial_value_function()
    u0 = jnp.asarray(iv[0])
    c0 = jnp.asarray(iv[1])

    ref = jax.jit(sim.build_simulate_fn(2, 1.0))(theta, u0, c0)
    dmesh = make_device_mesh()
    f, prepare = shard_simulate(sim, 2, 1.0, dmesh)
    out = f(*prepare(theta, u0, c0))
    assert bool(np.asarray(out[2]).all())
    for a, b in zip(ref[:2], out[:2]):
        assert float(jnp.abs(a - b).max()) < 1e-12


def test_gspmd_requires_divisible():
    sim = _brain(8)  # 9^3 = 729 nodes, not divisible by 8
    dmesh = make_device_mesh()
    if sim.mesh.n_nodes % dmesh.devices.size == 0:
        pytest.skip("node count happens to divide")
    with pytest.raises(ValueError, match="divisible"):
        shard_simulate(sim, 2, 1.0, dmesh)


def _brain_padded(n, pad_to):
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _brain_sim

    return _brain_sim(n=n, dims=3, pad_to=pad_to)


def test_gspmd_padded_nondivisible_matches_single_device():
    """Non-divisible node count (343) runs node-sharded after pad_mesh_nodes
    and matches the unpadded single-device trajectory on the real nodes."""
    n_dev = len(jax.devices())
    ref_sim = _brain(6)  # 7^3 = 343 nodes
    n_real = ref_sim.mesh.n_nodes
    assert n_real % n_dev != 0, "choose n so the node count does not divide"
    theta = ref_sim.make_theta(ref_sim.params.as_dict())
    iv = ref_sim.params.create_initial_value_function()
    ref = jax.jit(ref_sim.build_simulate_fn(2, 1.0))(
        theta, jnp.asarray(iv[0]), jnp.asarray(iv[1])
    )

    sim = _brain_padded(6, pad_to=n_dev)
    assert sim.mesh.n_nodes % n_dev == 0 and sim.mesh.n_nodes > n_real
    theta_p = sim.make_theta(sim.params.as_dict())
    iv_p = sim.params.create_initial_value_function()
    dmesh = make_device_mesh()
    f, prepare = shard_simulate(sim, 2, 1.0, dmesh)
    out = f(*prepare(theta_p, jnp.asarray(iv_p[0]), jnp.asarray(iv_p[1])))
    assert bool(np.asarray(out[2]).all())
    # trajectories agree on the real nodes to machine precision
    assert float(jnp.abs(out[0][:, :n_real] - ref[0]).max()) < 1e-12
    assert float(jnp.abs(out[1][:, :n_real] - ref[1]).max()) < 1e-12
    # padding dofs stay exactly zero
    assert float(jnp.abs(out[1][:, n_real:]).max()) == 0.0
    # outputs are genuinely node-sharded, N/devices per device
    shard_n = {s.data.shape[1] for s in out[0].addressable_shards}
    assert shard_n == {sim.mesh.n_nodes // n_dev}


def test_gspmd_memory_scales_with_devices():
    """Per-device hot-loop memory scales ~N/devices: no replicated node
    vectors (VERDICT r1 done-criterion for the multichip path)."""
    n_dev = len(jax.devices())
    if n_dev < 8:
        pytest.skip("needs the 8-device virtual mesh")
    sim = _brain_padded(16, pad_to=n_dev)  # 17^3 = 4913 -> 4920 nodes

    theta = sim.make_theta(sim.params.as_dict())
    iv = sim.params.create_initial_value_function()
    u0 = jnp.asarray(iv[0])
    c0 = jnp.asarray(iv[1])
    args = (theta, u0, c0)
    shapes = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)), args
    )

    # single-device compile of the same padded problem
    single = jax.jit(sim.build_simulate_fn(2, 1.0))
    mem1 = single.lower(*shapes).compile().memory_analysis()

    dmesh = make_device_mesh()
    f, _ = shard_simulate(sim, 2, 1.0, dmesh)
    mem8 = f.lower(*shapes).compile().memory_analysis()

    tot1 = mem1.temp_size_in_bytes + mem1.output_size_in_bytes
    tot8 = mem8.temp_size_in_bytes + mem8.output_size_in_bytes
    # perfect scaling would be 1/8; allow overhead for halos, replicated
    # scalars and collective buffers (measured 0.264 at this size)
    assert tot8 < 0.35 * tot1, (
        f"sharded per-device memory {tot8} not < 0.35 x single-device {tot1}"
    )


def test_use_sharding_auto_picks_nodes_mode():
    """use_sharding() on a (padded) lattice mesh routes through the
    node-sharded stencil path and run() works end-to-end."""
    n_dev = len(jax.devices())
    sim = _brain_padded(6, pad_to=n_dev)
    dmesh = make_device_mesh()
    sim.use_sharding(dmesh)
    assert sim.sharding_mode == "nodes"
    # the stencil fast path must stay enabled (kernels NOT swapped)
    assert type(sim.kernels).__name__ == "P1Kernels"
    rdj, elop, elpre, _, _ = sim._stencil_builders()
    assert rdj is not None and elop is not None

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        sol = sim.run(keep_nth=1, save_method=None, plot=False, output_dir=d)
    ref_sim = _brain(6)
    with tempfile.TemporaryDirectory() as d:
        ref = ref_sim.run(keep_nth=1, save_method=None, plot=False, output_dir=d)
    n_real = ref_sim.mesh.n_nodes
    assert np.abs(np.asarray(sol[1])[:n_real] - np.asarray(ref[1])).max() < 1e-12
    assert np.abs(np.asarray(sol[0])[:n_real] - np.asarray(ref[0])).max() < 1e-12
