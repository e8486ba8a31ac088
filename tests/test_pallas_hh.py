"""Fused multi-step HH chemical kernel (ops/pallas_hh.py) vs the XLA path.

CPU interpret-mode equivalence: same semantics class as the bench's
"HH with ion channels + receptor kinetics + STDP" BASELINE config.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import spiking_neural_networks_tpu as snn
from spiking_neural_networks_tpu.ops import pallas_hh


def _lattice(rows=16, cols=16, plastic=True, electrical=True,
             nt="destexhe", rec="destexhe", seed=9):
    lat = snn.Lattice(snn.HodgkinHuxley(nt_kinetics=nt, rec_kinetics=rec))
    lat.populate(rows, cols, gap_conductance=10.0)
    s = lat.state
    for t in ("AMPA", "NMDA", "GABA"):
        s = lat.model.insert_receptor(s, t)
        s = lat.model.insert_neurotransmitter(s, t)
    lat.state = s
    lat.connect_stencil(radius=2.0, keep_prob=0.8, seed=11)
    lat.electrical_synapse = electrical
    lat.chemical_synapse = True
    lat.do_plasticity = plastic
    if plastic:
        lat.plasticity = snn.STDP()
    n = rows * cols
    # equilibrium gates at rest + depolarized voltages: the population
    # fires within ~100 steps (gates at 0 never reach threshold)
    v0 = np.random.default_rng(seed).uniform(-65, -20, n)
    lat.apply(lambda st: {
        **st, "v": jnp.asarray(v0, jnp.float32),
        "na$m_state": jnp.full(n, 0.05, jnp.float32),
        "na$h_state": jnp.full(n, 0.6, jnp.float32),
        "k$n_state": jnp.full(n, 0.32, jnp.float32)})
    return lat


CHECK_KEYS = ("v", "na$m_state", "na$h_state", "k$n_state", "nt$t",
              "rec$r", "rec$current", "na$current", "k$current",
              "kleak$current")


def _assert_match(a, b, plastic, rtol=1e-5, atol=1e-5):
    for k in CHECK_KEYS:
        np.testing.assert_allclose(np.asarray(b.state[k]),
                                   np.asarray(a.state[k]),
                                   rtol=rtol, atol=atol, err_msg=k)
    np.testing.assert_array_equal(np.asarray(b.state["was_increasing"]),
                                  np.asarray(a.state["was_increasing"]))
    np.testing.assert_array_equal(np.asarray(b.state["last_firing_time"]),
                                  np.asarray(a.state["last_firing_time"]))
    if plastic:
        np.testing.assert_allclose(np.asarray(b.graph.weights),
                                   np.asarray(a.graph.weights),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("plastic", [True, False])
def test_fused_hh_matches_xla(plastic):
    """The bench HH+STDP config (destexhe kinetics, electrical + chemical,
    radius-2 stencil) through the fused kernel must match the XLA path."""
    def run(use_pallas):
        lat = _lattice(plastic=plastic)
        assert pallas_hh.supports(lat.model, lat.graph,
                                  lat.chemical_synapse, lat.do_plasticity,
                                  lat.plasticity)
        lat.use_pallas = use_pallas
        lat.run_lattice(100)
        return lat

    a, b = run(False), run(True)
    _assert_match(a, b, plastic)
    assert (np.asarray(a.state["last_firing_time"]) >= 0).any()


def test_fused_hh_remainder_and_repeat():
    """Iteration counts that are not a multiple of K exercise the remainder
    launch; repeated runs continue from carried state."""
    def run(use_pallas):
        lat = _lattice(plastic=True)
        lat.use_pallas = use_pallas
        lat.run_lattice(37)
        lat.run_lattice(19)
        return lat

    a, b = run(False), run(True)
    # mid-upstroke float-order drift through the HH exponentials reaches
    # ~2e-4 at this step count (verified identical for split and unsplit
    # runs; spike times stay exactly equal)
    _assert_match(a, b, True, rtol=5e-3, atol=5e-3)
    assert a.internal_clock == 56


def test_fused_hh_approximate_kinetics():
    """Approximate NT/receptor kinetics (spike-flag-driven release, r = t)."""
    def run(use_pallas):
        lat = _lattice(plastic=False, nt="approximate", rec="approximate")
        lat.use_pallas = use_pallas
        lat.run_lattice(80)
        return lat

    a, b = run(False), run(True)
    _assert_match(a, b, False)


def test_fused_hh_chemical_only():
    """electrical_synapse=False: gap-junction gather must stay off."""
    def run(use_pallas):
        lat = _lattice(plastic=False, electrical=False)
        lat.use_pallas = use_pallas
        lat.run_lattice(60)
        return lat

    a, b = run(False), run(True)
    _assert_match(a, b, False)


def test_fused_hh_histories_fall_back():
    """Grid histories force the XLA path (the fused kernel records none);
    results must be identical to use_pallas=False."""
    def run(use_pallas):
        lat = _lattice(plastic=False)
        lat.use_pallas = use_pallas
        lat.update_grid_history = True
        lat.run_lattice(30)
        return np.stack(lat.grid_history.history)

    np.testing.assert_array_equal(run(True), run(False))
