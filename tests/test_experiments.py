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
def test_bayesian_rate_based_d1_replay():
    """The full-depth rate-based pipeline recalls the main pattern through
    the d1 path using a reference-style TOML (grid keys + SNR present)."""
    import bayesian_inference_rate_based as b
    out = b.main(["prog", os.path.join(
        ARGS_DIR, "bayesian_inf_args", "smoke.toml")])
    assert len(out) == 1
    (key, value), = out.items()
    assert key.startswith("trial: 0, pattern1:")
    # the attractor settles on the cued pattern or (d1-biased) the prior
    assert value["first_acc"] or value["bayesian_first_acc"], value
    assert "first_snr" in value


@pytest.mark.slow
def test_bayesian_rate_based_mbm_d2_inh():
    """memory_biases_memory + d2 + d_acts_on_inh: the dopaminergic
    intermediate routes the prior memory onto the inhibitory pool."""
    import bayesian_inference_rate_based as b
    out = b.main(["prog", os.path.join(
        ARGS_DIR, "bayesian_inf_args", "smoke_mbm_d2.toml")])
    (key, value), = out.items()
    assert "first_acc" in value
    assert "memory_biases_memory_first_acc" in value


def test_bayesian_rate_based_accepts_reference_tomls():
    """The reference's committed bayesian_inf_args configs parse and
    fill_defaults without modification (acceptance replay, parse only —
    the full 20-trial sweeps are hours of CPU time)."""
    import bayesian_inference_rate_based as b
    from pipeline_setup import parse_toml
    for name in ("d1_distortion.toml", "d2_inh_vary_glu_gaba_cc.toml"):
        with open(os.path.join(ARGS_DIR, "bayesian_inf_args", name),
                  "rb") as f:
            parsed = parse_toml(f)
        b.fill_defaults(parsed)
        assert parsed["simulation_parameters"]["filename"]
        assert all(k in b.FIELDS for k in parsed["variables"])


@pytest.mark.slow
def test_schizophrenia_pipeline_nmda_sweep():
    """Two-phase working-memory protocol with per-type clearances; healthy
    NMDA recalls the cued pattern, hypofunctional NMDA degrades it."""
    import schizophrenia_simulation as sc
    out = sc.main(["prog", os.path.join(
        ARGS_DIR, "schizophrenia_pipeline_args", "smoke.toml")])
    assert len(out) == 2
    by_g = {}
    for key, value in out.items():
        g = float(key.split("nmda_g: ")[1].split(",")[0])
        by_g[g] = value
    assert by_g[0.6]["first_acc"] is True
    assert "first_snr" in by_g[0.6] and "second_snr" in by_g[0.6]


def test_schizophrenia_accepts_reference_toml():
    import schizophrenia_simulation as sc
    from pipeline_setup import parse_toml
    with open(os.path.join(ARGS_DIR, "schizophrenia_pipeline_args",
                           "grti_with_recall_cue.toml"), "rb") as f:
        parsed = parse_toml(f)
    sc.fill_defaults(parsed)
    assert parsed["simulation_parameters"]["use_glutamate_clearance"]
    assert parsed["variables"]["nmda_clearance"] == \
        parsed["variables"]["ampa_clearance"]
    assert len(parsed["variables"]["nmda_clearance"]) == 10


@pytest.mark.slow
def test_noisy_rate_spike_train_setup():
    from pipeline_setup import get_noisy_rate_spike_train_setup_function
    rng = np.random.default_rng(0)
    setup = get_noisy_rate_spike_train_setup_function(0.5, 10.0, rng=rng)

    class N:
        rate = None
        step = 0.0

    rates = []
    for _ in range(200):
        n = N()
        setup(n)
        rates.append(n.rate)
    on = [r for r in rates if r == 10.0]
    assert 0.3 < len(on) / len(rates) < 0.7


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


def test_find_peaks_matches_scalar_scan():
    """The vectorized find_peaks must match the original two-pointer
    plateau-aware scan exactly (fuzzed over tie-heavy series)."""
    from pipeline_setup import find_peaks

    def scalar(series):
        x = np.asarray(series, np.float64)
        peaks = []
        i = 1
        while i < len(x) - 1:
            if x[i - 1] < x[i]:
                j = i
                while j < len(x) - 1 and x[j + 1] == x[j]:
                    j += 1
                if j < len(x) - 1 and x[j + 1] < x[i]:
                    peaks.append((i + j) // 2)
                i = j + 1
            else:
                i += 1
        return np.asarray(peaks, np.int64)

    rng = np.random.default_rng(3)
    cases = [rng.integers(-3, 4, int(n)).astype(float)
             for n in rng.integers(0, 50, 120)]
    cases += [np.array([]), np.array([1.0]),
              np.array([0, 1, 1, 1, 0], float),
              np.array([0, 1, 1, 1, 2, 0], float),
              np.array([0, 1, 2, 2, 2], float)]
    for x in cases:
        np.testing.assert_array_equal(find_peaks(x), scalar(x))


# ---------------------------------------------------------------------------
# Reference TOML arg-grid carriage (VERDICT r3 item 4): every committed
# config in the reference's arg dirs must exist in experiments/ and parse;
# new reference configs cannot silently drop because the test ENUMERATES
# the reference dirs.
# ---------------------------------------------------------------------------

REFERENCE = "/root/reference"

# junk placeholders committed in the reference tree (comment-only, empty,
# or a stray zip archive) — nothing to carry
_REFERENCE_JUNK = {
    ("interface/experiments/isolated_liquid_args", "glu_gaba_clearance.toml"),
    ("interface/experiments/isolated_liquid_args", "gmax_variation.toml"),
    ("interface/experiments/isolated_liquid_args", "test.toml"),
}

# reference dir (relative to /root/reference) -> repo dir (rel. experiments/)
_ARG_DIR_MAP = {
    "interface_gpu/experiments/bayesian_inf_args": "bayesian_inf_args",
    "interface/experiments/bayesian_inf_args": "bayesian_inf_args/legacy",
    "interface/experiments/schizophrenia_pipeline_args":
        "schizophrenia_pipeline_args",
    "interface/experiments/isolated_liquid_args": "isolated_liquid_args",
    "interface/experiments/dopamine_liquid_args": "dopamine_liquid_args",
    "interface/experiments/manifold_args": "manifold_args",
    "interface/experiments/liquid_custom_manifold_args":
        "liquid_custom_manifold_args",
}


def _reference_tomls():
    cases = []
    for ref_dir, repo_dir in _ARG_DIR_MAP.items():
        full = os.path.join(REFERENCE, ref_dir)
        if not os.path.isdir(full):
            continue
        for name in sorted(os.listdir(full)):
            if name.endswith(".toml") and (ref_dir, name) not in _REFERENCE_JUNK:
                cases.append((ref_dir, repo_dir, name))
    return cases


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference tree not mounted")
@pytest.mark.parametrize("ref_dir,repo_dir,name", _reference_tomls(),
                         ids=lambda v: v if isinstance(v, str) else None)
def test_reference_arg_grid_carried(ref_dir, repo_dir, name):
    from pipeline_setup import parse_toml
    repo_path = os.path.join(ARGS_DIR, repo_dir, name)
    assert os.path.exists(repo_path), \
        f"reference config {ref_dir}/{name} not carried in experiments/"
    with open(repo_path, "rb") as f:
        parsed = parse_toml(f)
    # family-specific defaults acceptance
    if "bayesian_inf_args" in repo_dir:
        import bayesian_inference_rate_based as b
        b.fill_defaults(parsed)
        assert all(k in b.FIELDS for k in parsed["variables"])
    elif repo_dir == "schizophrenia_pipeline_args":
        import schizophrenia_simulation as sc
        sc.fill_defaults(parsed)
    elif repo_dir == "isolated_liquid_args":
        import isolated_liquid_pipeline as ilp
        ilp.fill_defaults(parsed)
    elif repo_dir == "dopamine_liquid_args":
        import dopamine_liquid_interaction as dli
        dli.fill_defaults(parsed)
        assert parsed["simulation_parameters"]["trials"] > 0
    # manifold/liquid_custom_manifold configs are consumed by the manifold
    # generation scripts (kwargs-driven); parsing is the acceptance here
    assert isinstance(parsed, dict) and parsed


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference tree not mounted")
def test_reference_liquid_mnist_config_carried():
    src = os.path.join(REFERENCE,
                       "interface/experiments/liquid_mnist_args/test.toml")
    if not os.path.exists(src):
        pytest.skip("no reference mnist config")
    assert os.path.exists(os.path.join(ARGS_DIR, "liquid_mnist_args",
                                       "reference_test.toml"))


@pytest.mark.slow
def test_dopamine_liquid_reference_grid_point():
    """Replay ONE grid point of a reference dopamine_liquid config at smoke
    scale (shrunk phases/trials; the committed grids are hours of CPU)."""
    import dopamine_liquid_interaction as dli
    from pipeline_setup import parse_toml
    with open(os.path.join(ARGS_DIR, "dopamine_liquid_args",
                           "d2_inh_glu_clearance.toml"), "rb") as f:
        parsed = parse_toml(f)
    dli.fill_defaults(parsed)
    sp = dict(parsed["simulation_parameters"])
    sp.update(off_phase=300, on_phase=150, settling_period=100, trials=1,
              exc_n=5, inh_n=3)
    cs = {k: v[0] for k, v in parsed["variables"].items()}
    out = dli._run_grid_point(sp, cs, np.random.default_rng(0))
    assert len(out["voltages"]) == 2 * 300 + 150
    assert isinstance(out["return_to_baseline"], (int, np.integer))
    if sp["measure_snr"]:
        assert "first_snr" in out


@pytest.mark.slow
def test_hd_electrical_model_holds_bump():
    """hd_attractor.py (port of interface_gpu/experiments/hd_model.py):
    the electrical HD ring forms an activity bump."""
    import hd_attractor as hda
    positions = hda.main(direction=0, iterations=900)
    assert len(positions) == 6
    assert any(p is not None for p in positions[2:])


@pytest.mark.slow
def test_grid_cell_electrical_model_pins_bump():
    """grid_cell_model.py (port of interface_gpu/experiments/
    grid_cell_electrical_model.py): setters pin the toroidal bump."""
    import grid_cell_model as gcm
    center, dist = gcm.main(iterations=900, target=(5, 12))
    assert dist <= 5.0, (center, dist)


@pytest.mark.slow
def test_liquid_custom_manifold_reference_grid_point():
    """Replay one grid point of the carried input_table_test.toml (the
    reference's liquid_custom_manifold protocol) at smoke scale."""
    import liquid_manifold_generation as lmg
    from pipeline_setup import parse_toml
    with open(os.path.join(ARGS_DIR, "liquid_custom_manifold_args",
                           "input_table_test.toml"), "rb") as f:
        parsed = parse_toml(f)
    lmg.fill_defaults(parsed)
    sp = dict(parsed["simulation_parameters"])
    sp.update(off_phase=250, on_phase=120, settling_period=80,
              exc_n=5, inh_n=3, trials=1)
    cs = {k: (v[0] if isinstance(v, list) else v)
          for k, v in parsed["variables"].items()}
    # shrink the 7x7 input table to the 5x5 smoke lattice
    cs["input_table"] = [row[:5] for row in cs["input_table"][:5]]
    out = lmg._run_custom_point(sp, cs, np.random.default_rng(0))
    assert len(out["voltages"]) == 2 * 250 + 120
    assert "first_snr" in out          # config sets measure_snr = true
    assert "peaks" in out              # config sets peaks_on = true


@pytest.mark.slow
def test_liquid_manifold_digits_smoke(tmp_path):
    """liquid_manifold_digits.py (port of the reference's plain
    interface/experiments/liquid_manifold_generation.py) runs two digits
    end-to-end and keys outputs by (digit, class)."""
    import liquid_manifold_digits as lmd
    toml = tmp_path / "smoke.toml"
    toml.write_text(
        '[simulation_parameters]\n'
        'filename = "liquid_manifold_digits_smoke.json"\n'
        'off_phase = 200\non_phase = 120\nexc_n = 5\n'
        '[variables]\npercentage_sample = 0.02\n')
    out = lmd.main(["prog", str(toml)], max_digits=2)
    assert len(out) == 2
    for key, value in out.items():
        assert "|" in key
        assert len(value["voltages"]) == 2 * 200 + 120
        assert len(value["firing_rates"]) == 25
    assert os.path.exists(_out("liquid_manifold_digits_smoke.json"))


@pytest.mark.slow
def test_attractor_manifold_plot_pipeline(tmp_path):
    """attractor_manifold.py emits the reference's firing-data JSON format
    and attractor_manifold_plot.py (port of the reference's offline
    interface/experiments/attractor_manifold_plot.py) renders both the
    all-data and bounded manifold plots from it."""
    import attractor_manifold as am
    import attractor_manifold_plot as amp

    firing = tmp_path / "firing.json"
    am.main(exc_n=5, inh_n=2, num_patterns=2, trials=2, iterations=300,
            filename=str(tmp_path / "manifold.json"),
            firing_data_filename=str(firing))
    data = json.loads(firing.read_text())
    assert "patterns" in data and len(data) == 2 * 2 + 1
    key = next(k for k in data if k != "patterns")
    assert amp.KEY_RE.search(key)
    assert len(data[key]["firing_rates"]) == 25
    # peak-based counting (reference semantics) must see real spikes —
    # a v_th rising-edge count degenerates to ~0 on the chemical path
    assert sum(sum(v["firing_rates"]) for k, v in data.items()
               if k != "patterns") > 0

    toml = tmp_path / "plot_args.toml"
    toml.write_text(
        '[plot_args]\n'
        f'firing_data = "{firing}"\n'
        'colors = ["red", "blue"]\n'
        'plot_all_data = true\n'
        'plot_high_accuracy_only_bounded_data = true\n'
        'bounding_percent = 5.0\n'
        f'save_all_data_plot = "{tmp_path / "all.png"}"\n'
        f'save_bounded_plot = "{tmp_path / "bounded.png"}"\n'
        '[reducer_args]\n'
        f'reducer_all_data = "{tmp_path / "reducer.pkl"}"\n')
    amp.main(str(toml), show=False)
    assert (tmp_path / "all.png").exists()
    assert (tmp_path / "reducer.pkl").exists()

    # the persisted reducer reprojects new points into the same space
    import pickle
    with open(tmp_path / "reducer.pkl", "rb") as f:
        reducer = pickle.load(f)
    rates = np.stack([np.asarray(v["firing_rates"], np.float64)
                      for k, v in data.items() if k != "patterns"])
    emb = reducer.transform(amp.standardize(rates))
    assert emb.shape == (4, 3)


@pytest.mark.slow
def test_hd_electrochemical_plain_smoke():
    """hd_electrochemical_model.py (plain variant, no dopamine) runs and
    produces ring peaks + a center-of-mass path."""
    import hd_electrochemical_model as hde
    import hd_electrochemical_model_dopaminergic as hdd
    out = hde.main(iterations=300, out_file="hd_plain_test.json")
    assert len(out["peaks"]) == hdd.N
    assert sum(len(p) for p in out["peaks"]) > 0
    assert len(out["thetas"]) == 3
    assert os.path.exists(_out("hd_plain_test.json"))
