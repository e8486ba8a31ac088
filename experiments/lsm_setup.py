"""Liquid-state-machine helpers.

Port of `/root/reference/interface/experiments/lsm_setup.py`: random liquid
weights normalized to a target spectral radius, spike-train on/off setup
functions, and the return-to-baseline stability metric.
"""

from __future__ import annotations

import numpy as np


def spectral_radius(w):
    return float(np.abs(np.linalg.eigvals(w)).max())


def generate_liquid_weights(size, minimum=0.0, maximum=1.0,
                            connectivity=0.25, scalar=0.5, rng=None):
    """Random sparse weights scaled so the spectral radius is ``1/scalar``
    (echo-state scaling; lsm_setup.py:8-21)."""
    rng = rng or np.random.default_rng()
    w = np.zeros((size, size))
    connections = rng.random((size, size)) < connectivity
    weights = np.abs(rng.normal(minimum, maximum, (size, size)))
    w[connections] = weights[connections]
    np.fill_diagonal(w, 0)
    return w / (spectral_radius(w) * scalar)


def generate_start_firing(cue_firing_rate):
    def start_firing(neuron):
        neuron.chance_of_firing = cue_firing_rate
        return neuron
    return start_firing


def stop_firing(neuron):
    neuron.chance_of_firing = 0.0
    return neuron


def determine_return_to_baseline(voltages, settling_period, on_phase,
                                 off_phase, tolerance):
    """Steps after the disturbance ends until the running-mean voltage
    re-enters ``tolerance`` of the pre-disturbance baseline
    (lsm_setup.py:36-44)."""
    baseline = np.array(voltages[settling_period:off_phase]).mean()
    for i in range(off_phase):
        tail = np.array(voltages[off_phase + on_phase + i:])
        if tail.size == 0:
            break
        if abs(baseline - tail.mean()) < tolerance:
            return i
    return off_phase
