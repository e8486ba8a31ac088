"""Smoke tests for the experiment pipelines (VERDICT r2 items 1-3).

Each new/deep-ported pipeline must run end-to-end at a reduced size on the
CPU mesh, write its output JSON, and produce a sane headline metric.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "experiments"))

ARGS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "experiments")


def _out(name):
    from pipeline_setup import output_path
    return output_path(name)


@pytest.mark.slow
def test_isolated_liquid_pipeline_smoke():
    import isolated_liquid_pipeline as ilp
    out = ilp.main(["prog", os.path.join(
        ARGS_DIR, "isolated_liquid_args", "smoke.toml")])
    assert len(out) == 2          # two clearance values x one trial
    for key, value in out.items():
        assert "glutamate_clearance" in key
        assert isinstance(value["return_to_baseline"], (int, np.integer))
        assert "first_snr" in value
        assert len(value["voltages"]) == 2 * 400 + 200
    assert os.path.exists(_out("isolated_liquid_smoke.json"))


@pytest.mark.slow
def test_hd_dopaminergic_smoke():
    import hd_electrochemical_model_dopaminergic as hdd
    out = hdd.main(iterations=300, out_file="hd_dopa_test.json")
    assert len(out["peaks"]) == hdd.N
    assert sum(len(p) for p in out["peaks"]) > 0
    assert os.path.exists(_out("hd_dopa_test.json"))


@pytest.mark.slow
def test_hd_no_turning_holds_angle():
    import hd_electrochemical_model_no_turning as hnt
    out = hnt.main(angle=15, iterations=800, cue_iterations=800)
    assert out["cued_theta"] is not None
    assert out["held_theta"] is not None
    # the ring must hold the cued angle after release (no turning input)
    assert out["drift"] < 3.0, out


@pytest.mark.slow
def test_hd_with_basin_captures_bump():
    import hd_with_basin as hwb
    out = hwb.main(basin=45, cue_angle=20, iterations=1500,
                   cue_iterations=800)
    assert out["final_theta"] is not None
    assert out["dist_to_basin_end"] < 5.0, out


@pytest.mark.slow
def test_grid_cell_electrochemical_bump():
    import grid_cell_electrochemical as gce
    out = gce.main(iterations=1000)
    assert out["total_spikes"] > 0
    assert out["toroidal_distance"] <= 4.0, out


@pytest.mark.slow
def test_training_liquid_classifies_digits():
    import training_liquid_pipeline as tlp
    p = dict(tlp.DEFAULTS)
    p.update(digits=[0, 1], train_per_class=6, test_per_class=4,
             stdp_exposure_per_class=3, steps_per_sample=80,
             filename="training_liquid_test.json")
    out = tlp.run(p)
    for cond in ("without_stdp", "with_stdp"):
        acc = out[cond]["test_accuracy"]
        assert 0.0 <= acc <= 1.0
    # the liquid readout must beat chance on the easy 0-vs-1 split
    assert out["without_stdp"]["test_accuracy"] > 0.5


@pytest.mark.slow
def test_heuristic_parameter_search_converges():
    import heuristic_parameter_search as hps
    out = hps.main(target=20.0, search_iterations=6)
    assert out["n_evaluations"] == 4 + 6
    assert abs(out["best_score"] - 20.0) <= 10.0, out["best_score"]
    assert set(out["best_params"]) == {"drive_rate", "drive_weight"}


@pytest.mark.slow
def test_tolman_eichenbaum_binds_observations():
    import tolman_eichenbaum as te
    out = te.main(n_pos=8, n_obj=3, walk_steps=24, steps_per_visit=40,
                  seed=1)
    chance = out["chance"]
    for k in ("env0_accuracy", "env1_accuracy"):
        assert 0.0 <= out[k] <= 1.0
    # bindings must beat chance in at least one environment (spiking
    # dynamics are noisy at this scale; the full run beats it in both)
    assert max(out["env0_accuracy"], out["env1_accuracy"]) > chance
