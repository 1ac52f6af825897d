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
