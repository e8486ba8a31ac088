"""Generic traced-step multi-step kernel (ops/pallas_stencil.supports_model).

The reference DSL generates a GPU kernel for every model it compiles
(nb_macro/src/lib.rs:469); the TPU analog traces `model.step` straight into
the Pallas body, so DSL-built models and the whole IF family ride the fused
VMEM-resident path.  Contract mirrors the specialized kernels'
(tests/test_pallas_tiled.py): last_firing_time exact, voltages allclose vs
the SAME model's XLA path.  (A DSL Izhikevich is deliberately NOT
bit-identical to the handwritten builtin — `(expr/c_m)*dt` vs
`expr*(dt/c_m)` association, tests/test_dsl.py:38 — which is exactly why
the kernel uses the model's own arithmetic instead of substituting the
hand-specialized Izhikevich kernel.)
"""

import numpy as np
import jax.numpy as jnp
import pytest

import spiking_neural_networks_tpu as snn
from spiking_neural_networks_tpu.core import lattice as lattice_mod
from spiking_neural_networks_tpu.dsl import neuron_builder
from spiking_neural_networks_tpu.ops import pallas_stencil

DSL_IZHIKEVICH = """
[neuron]
    type: KernelIzh
    vars: w = 30, a = 0.02, b = 0.2, c = -55, d = 8, v_th = 30, tau_m = 1, c_m = 100
    on_spike:
        v = c
        w += d
    spike_detection: v >= v_th
    on_iteration:
        dw/dt = (a * (b * v - w)) / tau_m
        dv/dt = (0.04 * v * v + 5 * v + 140 - w + i) / c_m
[end]
"""

DSL_BRANCHY = """
[neuron]
    type: KernelBranchy
    vars: w = 30, a = 0.02, b = 0.2, c = -55, d = 8, v_th = 30, tau_m = 1, c_m = 100, boost = 1.5
    on_spike:
        v = c
        w += d
    spike_detection: v >= v_th
    on_iteration:
        gain(x) = max(x, 0.5)
        [if] v < -60 [then]
            dv/dt = (0.04 * v * v + 5 * v + 140 - w + i * boost) / c_m
        [else]
            dv/dt = (0.04 * v * v + 5 * v + 140 - w + i * gain(boost - 1)) / c_m
        [end]
        dw/dt = (a * (b * v - w)) / tau_m
[end]
"""


def _run(model, use_pallas, iters, rows=16, cols=16, seed=3):
    lat = snn.Lattice(model)
    lat.populate(rows, cols, gap_conductance=10.0)
    lat.connect_stencil(radius=2.0, keep_prob=0.8, seed=7)
    v0 = np.random.default_rng(seed).uniform(-65, 30, rows * cols)
    lat.apply(lambda s: {**s, "v": jnp.asarray(v0, jnp.float32)})
    lat.use_pallas = use_pallas
    lat.run_lattice(iters)
    return lat


def _assert_match(a, b, extra=()):
    np.testing.assert_allclose(np.asarray(b.state["v"]),
                               np.asarray(a.state["v"]),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(b.state["last_firing_time"]),
                                  np.asarray(a.state["last_firing_time"]))
    np.testing.assert_array_equal(np.asarray(b.state["is_spiking"]),
                                  np.asarray(a.state["is_spiking"]))
    for k in extra:
        np.testing.assert_allclose(np.asarray(b.state[k]),
                                   np.asarray(a.state[k]),
                                   rtol=1e-5, atol=1e-4)


def test_dsl_izhikevich_hits_model_kernel():
    cls = neuron_builder(DSL_IZHIKEVICH)["KernelIzh"]
    a = _run(cls(), False, 150)
    b = _run(cls(), True, 150)
    assert a._last_run_fused is False
    assert b._last_run_fused == ("model",)
    _assert_match(a, b, extra=("w",))


def test_dsl_branchy_model_kernel():
    """if/elseif + user function + min/max trace into the kernel body."""
    cls = neuron_builder(DSL_BRANCHY)["KernelBranchy"]
    a = _run(cls(), False, 120)
    b = _run(cls(), True, 120)
    assert b._last_run_fused == ("model",)
    _assert_match(a, b, extra=("w",))


def test_builtin_alif_hits_model_kernel():
    """ALIF (refractory_count + adaptive w) — no hand-specialized plain-
    lattice kernel exists for it; the generic path covers it."""
    a = _run(snn.AdaptiveLeakyIntegrateAndFire(), False, 150)
    b = _run(snn.AdaptiveLeakyIntegrateAndFire(), True, 150)
    assert b._last_run_fused == ("model",)
    _assert_match(a, b, extra=("w", "refractory_count"))


def test_builtin_leaky_izhikevich_model_kernel():
    a = _run(snn.LeakyIzhikevich(), False, 150)
    b = _run(snn.LeakyIzhikevich(), True, 150)
    assert b._last_run_fused == ("model",)
    _assert_match(a, b, extra=("w",))


def test_bcm_izhikevich_model_kernel():
    """BCM: pre_update bookkeeping (INT_FIELDS num_spikes, activity
    tracking) carries through the kernel."""
    a = _run(snn.BCMIzhikevich(), False, 150)
    b = _run(snn.BCMIzhikevich(), True, 150)
    assert b._last_run_fused == ("model",)
    _assert_match(a, b, extra=("w", "average_activity", "current_activity"))
    np.testing.assert_array_equal(np.asarray(b.state["num_spikes"]),
                                  np.asarray(a.state["num_spikes"]))


def test_model_kernel_remainder_launch():
    """50 = 3*16 + 2: the remainder launch compiles a second kernel."""
    cls = neuron_builder(DSL_IZHIKEVICH)["KernelIzh"]
    a = _run(cls(), False, 50)
    b = _run(cls(), True, 50)
    _assert_match(a, b)


def test_builtin_izhikevich_prefers_specialized_kernel():
    """The hand-specialized Izhikevich kernel stays first in line."""
    b = _run(snn.Izhikevich(), True, 32)
    assert b._last_run_fused[0] == "multi"


def test_histories_fall_back_to_xla():
    cls = neuron_builder(DSL_IZHIKEVICH)["KernelIzh"]
    lat = snn.Lattice(cls())
    lat.populate(8, 8, gap_conductance=10.0)
    lat.connect_stencil(radius=1.5, seed=1)
    lat.use_pallas = True
    lat.update_grid_history = True
    lat.run_lattice(20)
    assert lat._last_run_fused is False
    assert len(lat.grid_history.history) == 20


def test_carry_field_discovery():
    """Jaxpr forwarding analysis: params are read-only, state evolves."""
    fields, carry = pallas_stencil._model_kernel_fields(snn.Izhikevich())
    assert set(carry) == {"v", "w", "is_spiking"}
    fields, carry = pallas_stencil._model_kernel_fields(
        snn.AdaptiveLeakyIntegrateAndFire())
    assert {"v", "w", "refractory_count", "is_spiking"} <= set(carry)


def test_compile_failure_blocklists_and_falls_back(monkeypatch):
    """A Mosaic lowering failure routes the model to XLA permanently."""
    cls = neuron_builder(DSL_IZHIKEVICH)["KernelIzh"]
    model = cls()

    def boom(*a, **kw):
        raise RuntimeError("mosaic says no")

    monkeypatch.setattr(pallas_stencil, "lattice_multistep_model", boom)
    try:
        b = _run(model, True, 30)
        assert b._last_run_fused is False
        # second run must not even try the kernel
        assert not pallas_stencil.supports_model(
            model, b.graph, True, False, False)
        monkeypatch.undo()
        a = _run(model, False, 30)
        _assert_match(a, b)
    finally:
        pallas_stencil._MODEL_KERNEL_BLOCKLIST.discard(model.config_key())


DSL_ALIAS = """
[neuron]
    type: KernelAlias
    vars: w = 30, prev_v = 0, a = 0.02, b = 0.2, c = -55, d = 8, v_th = 30, tau_m = 1, c_m = 100
    on_spike:
        v = c
        w += d
    spike_detection: v >= v_th
    on_iteration:
        prev_v = v
        dw/dt = (a * (b * v - w)) / tau_m
        dv/dt = (0.04 * v * v + 5 * v + 140 - w + i) / c_m
[end]
"""


def test_cross_field_copy_rides_carry():
    """A step that copies one field into another (prev_v = v) must carry
    the copied field: its outvar IS another field's invar, and testing
    membership against ALL invars (rather than the field's own) froze it
    at its initial value inside the kernel."""
    cls = neuron_builder(DSL_ALIAS)["KernelAlias"]
    fields, carry = pallas_stencil._model_kernel_fields(cls())
    assert "prev_v" in carry
    a = _run(cls(), False, 120)
    b = _run(cls(), True, 120)
    assert b._last_run_fused == ("model",)
    _assert_match(a, b, extra=("w", "prev_v"))
    # prev_v actually evolved (kernel didn't freeze the initial 0s)
    assert float(np.abs(np.asarray(b.state["prev_v"])).max()) > 1.0
