"""Schizophrenia receptor-efficacy simulation: NMDA hypofunction vs memory
maintenance.

Port of the reference's working-memory pipeline
(`/root/reference/interface/experiments/schizophrenia_simulation_pipeline.py`):
a Hopfield-memory excitatory/inhibitory network recalls a cued pattern while
NMDA conductance (`nmda_g`) is scaled down across conditions — the
schizophrenia receptor-hypofunction model.  Reports recall accuracy per
`nmda_g` level.

Run: python experiments/schizophrenia_simulation.py [args.toml]
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from pipeline_setup import (
    output_path,
    output_path,parse_toml, get_weights, generate_patterns,
                            generate_setup_neuron,
                            get_spike_train_setup_function,
                            find_peaks_above_threshold, determine_accuracy)

import spiking_neural_networks_tpu.lixirnet as ln

DEFAULTS = dict(
    filename="schizophrenia_simulation_output.json",
    iterations=1500, trials=2, exc_n=7, num_patterns=2, p_on=0.5,
    correlation_threshold=10.0, weights_scalar=2.0, a=0.5, b=0.5, dt=1.0,
    distortion=0.15, main_firing_rate=0.01, spike_train_to_exc=5.0,
    peak_threshold=-55.0, measure_window=0, c_m=25.0,
    glutamate_clearance=0.001,
    nmda_g_levels=(0.6, 0.3, 0.1, 0.0),   # receptor-efficacy sweep
    seed=0)


def run_condition(p, nmda_g, patterns, pattern_index, rng):
    exc_n = p["exc_n"]
    num = exc_n * exc_n
    w = get_weights(num, patterns, a=p["a"], b=p["b"],
                    scalar=p["weights_scalar"] / p["num_patterns"])

    glu_neuro = ln.BoundedNeurotransmitterKinetics(
        clearance_constant=p["glutamate_clearance"])
    nts = {ln.DopaGluGABANeurotransmitterType.Glutamate: glu_neuro}
    glu = ln.GlutamateReceptor(g_nmda=nmda_g,
                               ampa_r=ln.BoundedReceptorKinetics(r_max=10),
                               nmda_r=ln.BoundedReceptorKinetics(r_max=10))
    receptors = ln.DopaGluGABA()
    receptors.insert(ln.DopaGluGABANeurotransmitterType.Glutamate, glu)

    neuron = ln.IzhikevichNeuron()
    neuron.set_synaptic_neurotransmitters(nts)
    neuron.set_receptors(receptors)
    poisson = ln.PoissonNeuron()
    poisson.set_synaptic_neurotransmitters(nts)

    exc = ln.IzhikevichNeuronLattice(0)
    exc.populate(neuron, exc_n, exc_n)
    exc.apply(generate_setup_neuron(c_m=p["c_m"], rng=rng))
    idx = exc.position_to_index
    exc.connect(lambda x, y: bool(w[idx[x]][idx[y]] != 0),
                lambda x, y: float(w[idx[x]][idx[y]]))
    exc.update_grid_history = True

    cue = ln.PoissonLattice(1)
    cue.populate(poisson, exc_n, exc_n)

    net = ln.IzhikevichNeuronNetwork.generate_network([exc], [cue])
    net.connect(1, 0, lambda x, y: x == y,
                lambda x, y: p["spike_train_to_exc"])
    net.set_dt(p["dt"])
    net.electrical_synapse = False
    net.chemical_synapse = True
    net.apply_spike_train_lattice_given_position(
        1, get_spike_train_setup_function(
            patterns, pattern_index, p["distortion"],
            p["main_firing_rate"], exc_n, rng=rng))

    net.run_lattices(p["iterations"])
    hist = np.stack(net.get_lattice(0).history)
    peaks = [find_peaks_above_threshold(hist[:, i // exc_n, i % exc_n],
                                        p["peak_threshold"])
             for i in range(num)]
    acc = determine_accuracy(patterns, pattern_index, p["num_patterns"],
                             p["measure_window"], peaks, exc_n,
                             use_correlation_as_accuracy=True)
    total = sum(len(pk) for pk in peaks)
    return bool(acc), total


def main():
    p = dict(DEFAULTS)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "rb") as f:
            parsed = parse_toml(f)
        p.update(parsed.get("simulation_parameters", {}))

    rng = np.random.default_rng(p["seed"])
    results = {}
    for nmda_g in p["nmda_g_levels"]:
        accs, spikes = [], []
        for trial in range(p["trials"]):
            patterns = generate_patterns(p["exc_n"] ** 2, p["p_on"],
                                         p["num_patterns"],
                                         p["correlation_threshold"], rng=rng)
            pattern_index = int(rng.integers(0, p["num_patterns"]))
            acc, total = run_condition(p, nmda_g, patterns, pattern_index, rng)
            accs.append(acc)
            spikes.append(total)
        results[str(nmda_g)] = dict(
            accuracy=sum(accs) / len(accs),
            mean_spikes=float(np.mean(spikes)))
        print(f"nmda_g={nmda_g}: accuracy={results[str(nmda_g)]['accuracy']}"
              f" mean_spikes={results[str(nmda_g)]['mean_spikes']:.0f}",
              flush=True)

    with open(output_path(p["filename"]), "w") as f:
        json.dump(dict(parameters={k: list(v) if isinstance(v, tuple) else v
                                   for k, v in p.items()},
                       results=results), f, indent=1)


if __name__ == "__main__":
    main()
