"""Rate-based Bayesian inference: memory biases memory.

Port of the reference's
`/root/reference/interface_gpu/experiments/bayesian_inference_pipeline_rate_based.py`:
like the Poisson pipeline, an excitatory Hopfield lattice with an inhibitory
pool recalls a distorted pattern — but the cues are **rate spike trains**
(on-pattern cells fire every `rate` ms, off-pattern cells are silent), and
the Bayesian prior is a **second Hopfield memory lattice** whose recalled
activity feeds glutamate into the main group (`memory_biases_memory`),
instead of a dopamine cue.

Run:  python experiments/bayesian_inference_rate_based.py [args.toml]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from pipeline_setup import (
    output_path,
    output_path,parse_toml, get_weights, weights_ie,
                            generate_patterns, generate_setup_neuron,
                            get_rate_spike_train_setup_function,
                            find_peaks_above_threshold, determine_accuracy)

import spiking_neural_networks_tpu.lixirnet as ln

DEFAULTS = {
    "simulation_parameters": dict(
        filename="bayesian_rate_based_output.json", iterations=1500,
        trials=2, exc_n=7, inh_n=3, num_patterns=2, p_on=0.5,
        correlation_threshold=10.0, weights_scalar=2.0,
        inh_weights_scalar=0.5, a=0.5, b=0.5, dt=1.0, distortion=0.15,
        bayesian_distortion=0.0, main_firing_rate=50.0,
        bayesian_firing_rate=50.0, spike_train_to_exc=5.0,
        bayesian_to_exc=3.0, memory_to_main=1.0, exc_to_inh=1.0,
        prob_of_exc_to_inh=0.5, peak_threshold=-55.0, measure_window=0,
        c_m=25.0, glutamate_clearance=0.001, gabaa_clearance=0.001,
        memory_biases_memory=True, seed=0),
}


def _hopfield_group(base_id, w, exc_neuron, setup_neuron, exc_n):
    lat = ln.IzhikevichNeuronLattice(base_id)
    lat.populate(exc_neuron, exc_n, exc_n)
    lat.apply(setup_neuron)
    pos_to_idx = lat.position_to_index
    lat.connect(lambda x, y: bool(w[pos_to_idx[x]][pos_to_idx[y]] != 0),
                lambda x, y: float(w[pos_to_idx[x]][pos_to_idx[y]]))
    lat.update_grid_history = True
    return lat


def run_trial(p, patterns, bayes_patterns, pattern_index, rng):
    exc_n, inh_n = p["exc_n"], p["inh_n"]
    num = exc_n * exc_n

    w = get_weights(num, patterns, a=p["a"], b=p["b"],
                    scalar=p["weights_scalar"] / p["num_patterns"])
    w2 = get_weights(num, bayes_patterns, a=p["a"], b=p["b"],
                     scalar=p["weights_scalar"] / p["num_patterns"])
    w_ie = weights_ie(inh_n, p["inh_weights_scalar"], patterns,
                      p["num_patterns"])

    glu_neuro = ln.BoundedNeurotransmitterKinetics(
        clearance_constant=p["glutamate_clearance"])
    gaba_neuro = ln.BoundedNeurotransmitterKinetics(
        clearance_constant=p["gabaa_clearance"])
    exc_nts = {ln.DopaGluGABANeurotransmitterType.Glutamate: glu_neuro}
    inh_nts = {ln.DopaGluGABANeurotransmitterType.GABA: gaba_neuro}

    glu = ln.GlutamateReceptor(ampa_r=ln.BoundedReceptorKinetics(r_max=10),
                               nmda_r=ln.BoundedReceptorKinetics(r_max=10))
    receptors = ln.DopaGluGABA()
    receptors.insert(ln.DopaGluGABANeurotransmitterType.Glutamate, glu)
    receptors.insert(ln.DopaGluGABANeurotransmitterType.GABA,
                     ln.GABAReceptor())

    exc_neuron = ln.IzhikevichNeuron()
    exc_neuron.set_synaptic_neurotransmitters(exc_nts)
    exc_neuron.set_receptors(receptors)
    inh_neuron = ln.IzhikevichNeuron()
    inh_neuron.set_synaptic_neurotransmitters(inh_nts)
    inh_neuron.set_receptors(receptors)
    rate_train = ln.RateSpikeTrain()
    rate_train.set_synaptic_neurotransmitters(exc_nts)

    setup_neuron = generate_setup_neuron(c_m=p["c_m"], rng=rng)

    inh_lattice = ln.IzhikevichNeuronLattice(0)
    inh_lattice.populate(inh_neuron, inh_n, inh_n)
    inh_lattice.apply(setup_neuron)

    exc_lattice = _hopfield_group(1, w, exc_neuron, setup_neuron, exc_n)
    # the Bayesian prior: an independent Hopfield memory
    bayes_lattice = _hopfield_group(4, w2, exc_neuron, setup_neuron, exc_n)

    main_cue = ln.RateSpikeTrainLattice(2)
    main_cue.populate(rate_train, exc_n, exc_n)
    bayes_cue = ln.RateSpikeTrainLattice(3)
    bayes_cue.populate(rate_train, exc_n, exc_n)

    network = ln.IzhikevichNeuronNetwork()
    network.add_lattice(inh_lattice)
    network.add_lattice(exc_lattice)
    network.add_lattice(bayes_lattice)
    network.add_spike_train_lattice(main_cue)
    network.add_spike_train_lattice(bayes_cue)

    network.connect(0, 1, lambda x, y: True,
                    lambda x, y: float(w_ie[y[0] % inh_n, y[1] % inh_n]))
    network.connect(1, 0,
                    lambda x, y: rng.uniform() <= p["prob_of_exc_to_inh"],
                    lambda x, y: p["exc_to_inh"])
    network.connect(2, 1, lambda x, y: x == y,
                    lambda x, y: p["spike_train_to_exc"])
    network.connect(3, 4, lambda x, y: x == y,
                    lambda x, y: p["bayesian_to_exc"])
    if p["memory_biases_memory"]:
        # recalled prior activity biases the main memory one-to-one
        network.connect(4, 1, lambda x, y: x == y,
                        lambda x, y: p["memory_to_main"])
    network.set_dt(p["dt"])
    network.electrical_synapse = False
    network.chemical_synapse = True

    # main cue: distorted target pattern as on/off firing rates
    network.apply_spike_train_lattice_given_position(
        2, get_rate_spike_train_setup_function(
            patterns, pattern_index, p["distortion"],
            p["main_firing_rate"], exc_n, rng=rng))
    # prior cue: the (less distorted) pattern stored in the prior memory
    network.apply_spike_train_lattice_given_position(
        3, get_rate_spike_train_setup_function(
            bayes_patterns, pattern_index, p["bayesian_distortion"],
            p["bayesian_firing_rate"], exc_n, rng=rng))

    network.run_lattices(p["iterations"])

    out = {}
    for name, lat_id, pats in (("main", 1, patterns),
                               ("bayesian", 4, bayes_patterns)):
        hist = np.stack(network.get_lattice(lat_id).history)
        peaks = [find_peaks_above_threshold(hist[:, i // exc_n, i % exc_n],
                                            p["peak_threshold"])
                 for i in range(num)]
        out[name] = determine_accuracy(
            pats, pattern_index, p["num_patterns"], p["measure_window"],
            peaks, exc_n, use_correlation_as_accuracy=True)
    return out


def main():
    p = dict(DEFAULTS["simulation_parameters"])
    if len(sys.argv) > 1:
        with open(sys.argv[1], "rb") as f:
            parsed = parse_toml(f)
        p.update(parsed.get("simulation_parameters", {}))

    rng = np.random.default_rng(p["seed"])
    num = p["exc_n"] * p["exc_n"]
    results = []
    t0 = time.time()
    for trial in range(p["trials"]):
        patterns = generate_patterns(num, p["p_on"], p["num_patterns"],
                                     p["correlation_threshold"], rng=rng)
        bayes_patterns = generate_patterns(num, p["p_on"], p["num_patterns"],
                                           p["correlation_threshold"],
                                           rng=rng)
        accs = run_trial(p, patterns, bayes_patterns,
                         trial % p["num_patterns"], rng)
        print(f"trial {trial}: main acc {accs['main']:.3f}, "
              f"prior acc {accs['bayesian']:.3f}")
        results.append(accs)

    summary = {
        "main_accuracy": float(np.mean([r["main"] for r in results])),
        "bayesian_accuracy": float(np.mean([r["bayesian"] for r in results])),
        "seconds": time.time() - t0,
    }
    print(json.dumps(summary))
    with open(output_path(p["filename"]), "w") as f:
        json.dump({"results": results, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
