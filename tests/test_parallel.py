"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spiking_neural_networks_tpu as snn
from spiking_neural_networks_tpu.parallel.sharding import (
    make_mesh, make_sharded_training_step, batched_state,
    shard_batched_inputs, _batched_electrical_gather)


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def _setup(batch, n, seed=0):
    model = snn.Izhikevich()
    state = batched_state(model, batch, n, gap_conductance=10.0)
    rng = np.random.default_rng(seed)
    state["v"] = jnp.asarray(rng.uniform(-65, 30, (batch, n)), jnp.float32)
    mask = jnp.asarray(rng.random((batch, n, n)) < 0.4)
    weights = jnp.asarray(rng.uniform(0.5, 1.5, (batch, n, n)),
                          jnp.float32) * mask
    return model, state, mask, weights


def test_mesh_shape(mesh):
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("dp", "tp")


def test_sharded_step_matches_unsharded(mesh):
    """The (dp, tp)-sharded training step computes exactly what the
    unsharded batched program computes."""
    batch, n = 4, 64
    model, state, mask, weights = _setup(batch, n)

    # unsharded single-device run
    def plain_step(state, weights, mask, clock, pparams):
        elec = _batched_electrical_gather(state["v"], state["gap_conductance"],
                                          weights, mask)
        state, spikes = model.step(state, elec, skip_nt=True)
        state["last_firing_time"] = jnp.where(spikes, clock,
                                              state["last_firing_time"])
        return state, spikes

    stdp_params = {k: jnp.float32(v) for k, v in snn.STDP().params.items()}
    ref_state = jax.tree.map(lambda x: x.copy(), state)
    ref_w = weights.copy()
    for clock in range(5):
        ref_state, ref_spikes = plain_step(ref_state, ref_w, mask,
                                           jnp.int32(clock), stdp_params)
        lft = ref_state["last_firing_time"]
        from spiking_neural_networks_tpu.models.base import NEVER
        both = (lft[:, :, None] != NEVER) & (lft[:, None, :] != NEVER)
        diff = jnp.abs((lft[:, :, None] - lft[:, None, :]).astype(jnp.float32)) * 0.1
        plus = 2.0 * jnp.exp(-diff / 4.5)
        minus = -2.0 * jnp.exp(-diff / 4.5)
        dw = jnp.where(lft[:, :, None] < lft[:, None, :], plus,
                       jnp.where(lft[:, :, None] > lft[:, None, :], minus, 0.0))
        dw = jnp.where(both, dw, 0.0) * (
            ref_spikes[:, :, None].astype(jnp.float32)
            + ref_spikes[:, None, :].astype(jnp.float32))
        ref_w = jnp.where(mask, ref_w + dw, ref_w)

    # sharded run
    sstate, sweights, smask = shard_batched_inputs(mesh, state, weights, mask)
    step, stdp = make_sharded_training_step(mesh, model)
    for clock in range(5):
        sstate, sweights, spikes = step(sstate, sweights, smask,
                                        jnp.int32(clock), stdp_params)

    np.testing.assert_allclose(np.asarray(sstate["v"]),
                               np.asarray(ref_state["v"]), rtol=1e-5,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(sweights), np.asarray(ref_w),
                               rtol=1e-5, atol=1e-4)


def test_dryrun_multichip_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    if jax.device_count("cpu") < 8:
        pytest.skip("needs 8 cpu devices")
    g.dryrun_multichip(8)
