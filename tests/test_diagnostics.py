"""`snn.why_not_fused` — the fused-path engagement explainer
(diagnostics.py).  Contract: empty list exactly when the corresponding
gate would engage a fused kernel; otherwise at least one reason naming
the blocking condition."""

import numpy as np
import jax.numpy as jnp
import pytest

import spiking_neural_networks_tpu as snn


def _lattice(rows=8, cols=8, radius=1.5):
    lat = snn.Lattice(snn.Izhikevich())
    lat.populate(rows, cols, gap_conductance=10.0)
    lat.connect_stencil(radius=radius, keep_prob=0.9, seed=1)
    return lat


def test_plain_electrical_lattice_fuses():
    assert snn.why_not_fused(_lattice()) == []


def test_stdp_lattice_fuses():
    lat = _lattice()
    lat.do_plasticity = True
    assert snn.why_not_fused(lat) == []


def test_bcm_plasticity_reason():
    lat = _lattice()
    lat.do_plasticity = True
    lat.plasticity = snn.BCM()
    reasons = snn.why_not_fused(lat)
    assert any("BCM" in r for r in reasons), reasons


def test_graph_history_plain_still_fuses_per_step():
    # plain electrical Izhikevich keeps the per-step kernel form even
    # while recording weight histories
    lat = _lattice()
    lat.update_graph_history = True
    assert snn.why_not_fused(lat) == []


def test_graph_history_blocks_stdp_class():
    lat = _lattice()
    lat.do_plasticity = True
    lat.update_graph_history = True
    reasons = snn.why_not_fused(lat)
    assert any("graph" in r and "history" in r for r in reasons), reasons


def test_dense_graph_reason():
    lat = snn.Lattice(snn.Izhikevich())
    lat.populate(4, 4, gap_conductance=10.0)
    rng = np.random.default_rng(0)
    lat.connect(lambda x, y: x != y and rng.random() < 0.5)
    assert isinstance(lat.graph, snn.DenseGraph)
    reasons = snn.why_not_fused(lat)
    assert any("StencilGraph" in r for r in reasons), reasons


def test_wide_stdp_cols_reason():
    lat = _lattice(4, 192)
    lat.do_plasticity = True
    reasons = snn.why_not_fused(lat)
    assert any("128" in r for r in reasons), reasons


def test_reward_lattice_fuses_and_wide_declines():
    rlat = snn.RewardModulatedLattice(snn.Izhikevich())
    rlat.populate(8, 8, gap_conductance=10.0)
    rlat.connect_stencil(radius=1.5, keep_prob=0.9, seed=2)
    assert snn.why_not_fused(rlat) == []
    wide = snn.RewardModulatedLattice(snn.Izhikevich())
    wide.populate(4, 192, gap_conductance=10.0)
    wide.connect_stencil(radius=1.5, keep_prob=0.9, seed=2)
    reasons = snn.why_not_fused(wide)
    assert any("128" in r for r in reasons), reasons


def test_sharded_plain_fuses_sharded_stdp_declines():
    import jax
    from spiking_neural_networks_tpu.parallel import (make_lattice_mesh,
                                                      shard_lattice)
    mesh = make_lattice_mesh(8, devices=jax.devices("cpu"))
    lat = _lattice(32, 32)
    shard_lattice(lat, mesh)
    assert snn.why_not_fused(lat) == []
    plast = _lattice(32, 32)
    plast.do_plasticity = True
    shard_lattice(plast, mesh)
    reasons = snn.why_not_fused(plast)
    assert any("sharded" in r.lower() for r in reasons), reasons


def test_hh_chemical_fuses_generic_history_declines():
    hh = snn.Lattice(snn.HodgkinHuxley())
    hh.populate(8, 8, gap_conductance=10.0)
    hh.connect_stencil(radius=1.5, keep_prob=0.9, seed=3)
    hh.state = hh.model.insert_receptor(hh.state, "AMPA")
    hh.state = hh.model.insert_neurotransmitter(hh.state, "AMPA")
    hh.electrical_synapse = False
    hh.chemical_synapse = True
    assert snn.why_not_fused(hh) == []

    # a generic-kernel model (non-Izhikevich elementwise) with a grid
    # history: the documented select-chain store exclusion
    ml = snn.Lattice(snn.MorrisLecar())
    ml.populate(8, 8, gap_conductance=10.0)
    ml.connect_stencil(radius=1.5, keep_prob=0.9, seed=4)
    ml.update_grid_history = True
    reasons = snn.why_not_fused(ml)
    assert any("histor" in r for r in reasons), reasons


def test_engagement_matches_explanation():
    """The explainer's verdict must agree with an actual run's
    _last_run_fused for a matrix of small configs."""
    def run_and_check(lat):
        verdict = snn.why_not_fused(lat)
        lat.use_pallas = True
        lat.run_lattice(3)
        engaged = bool(lat._last_run_fused)
        assert engaged == (verdict == []), (verdict, lat._last_run_fused)

    run_and_check(_lattice())
    plast = _lattice()
    plast.do_plasticity = True
    run_and_check(plast)
    gh = _lattice()
    gh.update_graph_history = True
    run_and_check(gh)
    stdp_gh = _lattice()
    stdp_gh.do_plasticity = True
    stdp_gh.update_graph_history = True
    run_and_check(stdp_gh)


def test_unknown_type_raises():
    with pytest.raises(TypeError):
        snn.why_not_fused(object())
