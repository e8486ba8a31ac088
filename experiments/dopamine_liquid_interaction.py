"""Dopaminergic neuromodulation of liquid stability.

Port of `/root/reference/interface/experiments/dopamine_liquid_interaction.py`:
a recurrent excitatory liquid (chemical glutamate synapses, echo-state
weight scaling) receives a disturbing Poisson group and a tonic dopamine
group.  The disturbance follows an off/on/off protocol; the metric is how
many steps the liquid's mean voltage takes to return to its pre-disturbance
baseline.  Varying D1/D2 gains (and where the dopamine projects) maps how
neuromodulation shifts the liquid's stability — e.g. with tonic D1 the
network sits at a higher, noisier baseline and re-enters it sooner.

Run: python experiments/dopamine_liquid_interaction.py
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from pipeline_setup import output_path, signal_to_noise
from lsm_setup import (generate_liquid_weights, generate_start_firing,
                       stop_firing, determine_return_to_baseline)

import spiking_neural_networks_tpu.lixirnet as ln


def run_condition(s_d1, s_d2, rows=8, cols=8, off_phase=5000, on_phase=1000,
                  settling_period=1000, tolerance=2.0, seed=0,
                  disturb_rate=0.01, dopa_rate=0.01, internal_scalar=0.125,
                  spike_train_connectivity=0.5, spike_train_to_exc=3.0):
    rng = np.random.default_rng(seed)
    num = rows * cols
    w = generate_liquid_weights(num, connectivity=0.25,
                                scalar=internal_scalar, rng=rng)

    glu_neuro = ln.BoundedNeurotransmitterKinetics(clearance_constant=0.001)
    dopa_neuro = ln.BoundedNeurotransmitterKinetics(clearance_constant=0.001)
    exc_nts = {ln.DopaGluGABANeurotransmitterType.Glutamate: glu_neuro}
    dopa_nts = {ln.DopaGluGABANeurotransmitterType.Dopamine: dopa_neuro}

    glu = ln.GlutamateReceptor(ampa_r=ln.BoundedReceptorKinetics(r_max=10),
                               nmda_r=ln.BoundedReceptorKinetics(r_max=10))
    dopamine_rs = ln.DopamineReceptor(s_d1=s_d1, s_d2=s_d2)
    receptors = ln.DopaGluGABA()
    receptors.insert(ln.DopaGluGABANeurotransmitterType.Glutamate, glu)
    receptors.insert(ln.DopaGluGABANeurotransmitterType.Dopamine, dopamine_rs)

    exc_neuron = ln.IzhikevichNeuron()
    exc_neuron.c_m = 25.0
    exc_neuron.set_synaptic_neurotransmitters(exc_nts)
    exc_neuron.set_receptors(receptors)
    poisson = ln.PoissonNeuron()
    poisson.set_synaptic_neurotransmitters(exc_nts)
    poisson_dopa = ln.PoissonNeuron()
    poisson_dopa.set_synaptic_neurotransmitters(dopa_nts)

    liquid = ln.IzhikevichNeuronLattice(0)
    liquid.populate(exc_neuron, rows, cols)
    pos_to_idx = liquid.position_to_index
    liquid.connect(lambda x, y: bool(w[pos_to_idx[x]][pos_to_idx[y]] != 0),
                   lambda x, y: float(w[pos_to_idx[x]][pos_to_idx[y]]))
    liquid.apply(lambda n: setattr(
        n, "current_voltage", float(rng.uniform(-65, 30))))
    liquid.update_grid_history = True

    disturb = ln.PoissonLattice(1)
    disturb.populate(poisson, rows, cols)
    dopa = ln.PoissonLattice(2)
    dopa.populate(poisson_dopa, rows, cols)

    network = ln.IzhikevichNeuronNetwork.generate_network(
        [liquid], [disturb, dopa])
    network.connect(
        1, 0, lambda x, y: rng.uniform() < spike_train_connectivity,
        lambda x, y: spike_train_to_exc)
    network.connect(
        2, 0, lambda x, y: rng.uniform() < spike_train_connectivity,
        lambda x, y: spike_train_to_exc)
    network.electrical_synapse = False
    network.chemical_synapse = True
    network.set_dt(1.0)

    # tonic dopamine for the whole protocol
    network.apply_spike_train_lattice(2, generate_start_firing(dopa_rate))

    network.apply_spike_train_lattice(1, stop_firing)
    network.run_lattices(off_phase)
    network.apply_spike_train_lattice(1, generate_start_firing(disturb_rate))
    network.run_lattices(on_phase)
    network.apply_spike_train_lattice(1, stop_firing)
    network.run_lattices(off_phase)

    hist = network.get_lattice(0).history
    voltages = [float(np.array(i).mean()) for i in hist]
    recovery = determine_return_to_baseline(
        voltages, settling_period, on_phase, off_phase, tolerance)
    snr_baseline = float(signal_to_noise(voltages[settling_period:off_phase]))
    snr_disturbed = float(signal_to_noise(
        voltages[off_phase:off_phase + on_phase]))
    return dict(recovery_steps=recovery, snr_baseline=snr_baseline,
                snr_disturbed=snr_disturbed)


def main():
    conditions = {
        "no dopamine receptors": dict(s_d1=0.0, s_d2=0.0),
        "d2 (inhibitory gain)": dict(s_d1=0.0, s_d2=0.05),
        "d1 (excitatory gain)": dict(s_d1=1.0, s_d2=0.0),
    }
    results = {}
    for name, kw in conditions.items():
        results[name] = run_condition(**kw)
        r = results[name]
        print(f"{name}: recovery {r['recovery_steps']} steps, "
              f"baseline SNR {r['snr_baseline']:.2f}, "
              f"disturbed SNR {r['snr_disturbed']:.2f}")
    with open(output_path("dopamine_liquid_output.json"), "w") as f:
        json.dump(results, f, indent=1)
    return results


if __name__ == "__main__":
    main()
