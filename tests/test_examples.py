"""Smoke tests for the `examples/` ports of `backend/examples/` —
the four round-5 additions (bcm, interacting_pools, lsm_architecture,
morris_lecar) run their `main()` at reduced iteration counts and the
outputs are sanity-checked."""

import importlib.util
import os

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), os.pardir, "examples")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(EXAMPLES, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_morris_lecar_example(tmp_path):
    csv = tmp_path / "ml.csv"
    v = _load("morris_lecar").main(iterations=800, csv_path=str(csv))
    assert v.shape == (800,)
    # 100 uA/cm^2 puts the model on its limit cycle: wide voltage swing
    assert v.max() - v.min() > 50.0
    assert csv.read_text().count("\n") == 801


def test_interacting_pools_example():
    traces = _load("interacting_pools").main(iterations=500)
    assert set(traces) == {"inh", "exc"}
    for t in traces.values():
        assert t.shape == (500,)
        assert np.isfinite(t).all()
    # the pools interact: averages move away from the initial mixed value
    assert abs(traces["exc"][-1] - traces["exc"][0]) > 0.5


def test_bcm_example(tmp_path):
    csv, wtxt = tmp_path / "v.csv", tmp_path / "w.txt"
    weights = _load("bcm").main(iterations=500, csv_path=str(csv),
                                weights_path=str(wtxt))
    assert len(weights) == 500
    w = np.asarray(weights[-1])
    assert np.isfinite(w).all() and w.max() >= 1.0  # gaussian init in [1, 2]
    assert csv.read_text().startswith("presynaptic_voltage_0,")
    assert wtxt.read_text().count("-----") == 500


@pytest.mark.slow
def test_lsm_architecture_example():
    env = _load("lsm_architecture").main(iterations=900, period=300)
    dop = np.asarray(env.state.dopamine_history)
    assert dop.shape == (900,)
    # reward pulses at 300/600 raise dopamine above its decay baseline
    assert dop.max() > 0.5
    readout = env.agent.get_reward_modulated_lattice(2)
    assert len(readout.graph_history) == 900
    assert np.stack(readout.grid_history.history).shape == (900, 4, 2)
