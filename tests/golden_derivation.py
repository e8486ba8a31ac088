"""Independent float32 derivation of golden traces, transcribed LINE BY LINE
from the Rust reference (NOT from this repo's models or from
tests/reference_impl.py — this file exists so correctness does not rest on
two implementations by the same author agreeing; every arithmetic statement
below mirrors one cited Rust statement).

Sources:
  Izhikevich: /root/reference/backend/src/neuron/integrate_and_fire/mod.rs
    :1198-1220 (defaults), :1225-1247 (dw + spike handling),
    :1255-1260 (dv), :217-233 (iterate order: dv and dw computed from the
    same pre-step state, then applied, then spiking handled)
  LIF: same file :149-171 (defaults), :176-181 (dv), :83-104 (refractory
    spike handling), :189-196 (iterate order)
  Hodgkin-Huxley: /root/reference/backend/src/neuron/hodgkin_huxley/mod.rs
    :80-99 (defaults), :154-166 (voltage update), :182-192 (iterate:
    update_gates THEN update_cell_voltage), :207-219 (peak-style spike
    detection); channels /root/reference/backend/src/neuron/ion_channels/
    mod.rs :14-45 (gating update), :190-240 (Na), :243-286 (K),
    :290-315 (K leak)

All arithmetic in np.float32, matching Rust f32.
"""

import numpy as np

f32 = np.float32


def izhikevich_trace(i, steps):
    v = f32(-65.0)
    w = f32(30.0)
    a, b, c, d = f32(0.02), f32(0.2), f32(-55.0), f32(8.0)
    v_th, tau_m, c_m, dt = f32(30.0), f32(1.0), f32(100.0), f32(0.1)
    i = f32(i)
    out = []
    for _ in range(steps):
        # izhikevich_get_dv_change (mod.rs:1255-1260)
        dv = (f32(0.04) * v ** f32(2.0) + f32(5.0) * v + f32(140.0)
              - w + i) * (dt / c_m)
        # izhikevich_get_dw_change (mod.rs:1225-1230)
        dw = (a * (b * v - w)) * (dt / tau_m)
        v = v + dv
        w = w + dw
        # izhikevich_handle_spiking (mod.rs:1235-1247)
        spiking = False
        if v >= v_th:
            spiking = True
            v = c
            w = w + d
        out.append((float(v), float(w), spiking))
    return out


def lif_trace(i, steps):
    v = f32(-75.0)
    refractory_count = f32(0.0)
    leak_constant, integration_constant = f32(-1.0), f32(1.0)
    v_th, v_reset = f32(-55.0), f32(-75.0)
    tau_m, g_l = f32(10.0), f32(10.0)
    e_l, tref, dt = f32(-75.0), f32(10.0), f32(0.1)
    i = f32(i)
    out = []
    for _ in range(steps):
        # leaky_get_dv_change (mod.rs:176-181)
        dv = ((leak_constant * (v - e_l))
              + (integration_constant * (i / g_l))) * (dt / tau_m)
        v = v + dv
        # impl_default_handle_spiking (mod.rs:83-104)
        spiking = False
        if refractory_count > f32(0.0):
            v = v_reset
            refractory_count = refractory_count - f32(1.0)
        elif v >= v_th:
            spiking = True
            v = v_reset
            refractory_count = tref / dt
        out.append((float(v), float(refractory_count), spiking))
    return out


class _Gate:
    def __init__(self):
        self.alpha = f32(0.0)
        self.beta = f32(0.0)
        self.state = f32(0.0)

    def update(self, dt):
        # BasicGatingVariable::update (ion_channels/mod.rs:40-44)
        alpha_state = self.alpha * (f32(1.0) - self.state)
        beta_state = self.beta * self.state
        self.state = self.state + dt * (alpha_state - beta_state)


def hh_trace(i, steps):
    v = f32(-65.0)
    c_m, dt, v_th = f32(1.0), f32(0.01), f32(0.0)
    g_na, e_na = f32(120.0), f32(50.0)
    g_k, e_k = f32(36.0), f32(-77.0)
    g_k_leak, e_k_leak = f32(0.3), f32(-55.0)
    m, h, n = _Gate(), _Gate(), _Gate()
    i_na = i_k = i_k_leak = f32(0.0)
    was_increasing = False
    i = f32(i)
    out = []
    for _ in range(steps):
        last_voltage = v
        # update_gates (hodgkin_huxley/mod.rs:182-186):
        # NaIonChannel::update_current (ion_channels/mod.rs:219-236)
        m.alpha = f32(0.1) * ((v + f32(40.0))
                              / (f32(1.0) - np.exp(-(v + f32(40.0)) / f32(10.0))))
        m.beta = f32(4.0) * np.exp(-(v + f32(65.0)) / f32(18.0))
        h.alpha = f32(0.07) * np.exp(-(v + f32(65.0)) / f32(20.0))
        h.beta = f32(1.0) / (np.exp(-(v + f32(35.0)) / f32(10.0)) + f32(1.0))
        m.update(dt)
        h.update(dt)
        i_na = m.state ** f32(3.0) * h.state * g_na * (v - e_na)
        # KIonChannel::update_current (:268-279)
        n.alpha = f32(0.01) * (v + f32(55.0)) \
            / (f32(1.0) - np.exp(-(v + f32(55.0)) / f32(10.0)))
        n.beta = f32(0.125) * np.exp(-(v + f32(65.0)) / f32(80.0))
        n.update(dt)
        i_k = n.state ** f32(4.0) * g_k * (v - e_k)
        # KLeakChannel::update_current (:308-311)
        i_k_leak = g_k_leak * (v - e_k_leak)
        # update_cell_voltage (hodgkin_huxley/mod.rs:154-166); no receptors
        i_sum = i - (i_na + i_k + i_k_leak)
        v = v + dt * i_sum / c_m
        # peak-style spike detection (:207-219)
        increasing_right_now = bool(last_voltage < v)
        threshold_crossed = bool(v > v_th)
        spiking = threshold_crossed and was_increasing \
            and not increasing_right_now
        was_increasing = increasing_right_now
        out.append((float(v), float(m.state), float(h.state), float(n.state),
                    spiking))
    return out


if __name__ == "__main__":
    for i in (10.0, 50.0):
        tr = izhikevich_trace(i, 1000)
        print(f"IZH i={i}: s1={tr[0]} s2={tr[1]} s3={tr[2]} "
              f"s100={tr[99]} s1000={tr[999]}")
        spikes = [k for k, t in enumerate(tr) if t[2]]
        print("  spike steps:", spikes[:5])
    tr = lif_trace(300.0, 1000)
    print(f"LIF i=300: s1={tr[0]} s2={tr[1]} s100={tr[99]}")
    print("  spike steps:", [k for k, t in enumerate(tr) if t[2]][:5])
    tr = hh_trace(25.0, 2000)
    print(f"HH i=25: s1={tr[0]} s2={tr[1]} s1000={tr[999]} s2000={tr[1999]}")
    print("  spike steps:", [k for k, t in enumerate(tr) if t[4]][:5])


def morris_lecar_trace(i, steps):
    """Morris-Lecar (morris_lecar/mod.rs:50-70 defaults, :82-100
    update_channels/get_dv_change, :94-103 peak-style handle_spiking);
    channels ion_channels/mod.rs:321-360 (ReducedCalcium), :363-423
    (KSteadyState), :425-452 (Leak)."""
    v = f32(-70.0)
    v_th = f32(25.0)
    c_m, dt = f32(6.6), f32(0.01)
    g_ca, v_ca, v_1, v_2 = f32(4.0), f32(120.0), f32(-1.2), f32(18.0)
    g_k, v_k, phi, v_3, v_4 = f32(8.0), f32(-84.0), f32(0.067), f32(12.0), \
        f32(17.4)
    n = f32(0.0)
    g_l, v_l = f32(2.0), f32(-60.0)
    was_increasing = False
    i = f32(i)
    out = []
    for _ in range(steps):
        # ReducedCalciumChannel::update_current (ion_channels/mod.rs:349-357)
        m_ss = f32(0.5) * (f32(1.0) + np.tanh((v - v_1) / v_2, dtype=f32))
        i_ca = g_ca * m_ss * (v - v_ca)
        # KSteadyStateChannel::update_current (:400-420)
        n_ss = f32(0.5) * (f32(1.0) + np.tanh((v - v_3) / v_4, dtype=f32))
        t_n = f32(1.0) / (phi * np.cosh((v - v_3) / (f32(2.0) * v_4),
                                        dtype=f32))
        n = n + ((n_ss - n) / t_n) * dt
        i_k = g_k * n * (v - v_k)
        # LeakChannel::update_current (:444-447)
        i_l = g_l * (v - v_l)
        # get_dv_change + peak-style handle_spiking (morris_lecar/mod.rs
        # :88-103, :113-120)
        last_v = v
        v = v + (i - i_l - i_ca - i_k) * (dt / c_m)
        increasing_now = last_v < v
        spiking = bool((v > v_th) and was_increasing and not increasing_now)
        was_increasing = increasing_now
        out.append((float(v), float(n), spiking))
    return out


def qif_trace(i, steps):
    """Quadratic IF (integrate_and_fire/mod.rs:298-321 defaults, :324-328
    dv, :83-104 refractory handle_spiking)."""
    v = f32(-75.0)
    v_th, v_reset, v_c = f32(-55.0), f32(-75.0), f32(-60.0)
    alpha, integration_constant = f32(1.0), f32(1.0)
    tau_m, dt, tref = f32(100.0), f32(0.1), f32(10.0)
    refractory_count = f32(0.0)
    i = f32(i)
    out = []
    for _ in range(steps):
        dv = ((alpha * (v - v_reset) * (v - v_c))
              + integration_constant * i) * (dt / tau_m)
        v = v + dv
        spiking = False
        if refractory_count > 0:
            v = v_reset
            refractory_count = refractory_count - f32(1.0)
        elif v >= v_th:
            spiking = True
            v = v_reset
            refractory_count = tref / dt
        out.append((float(v), float(refractory_count), spiking))
    return out


def _adaptive_trace(i, steps, exp_term):
    """Adaptive (exp) LIF (integrate_and_fire/mod.rs:948-976/1100-1127
    defaults, :1032-1040/1130-1139 dv, :998-1008 dw, :1011-1028 adaptive
    refractory spike handling; iterate order :217-233: dv and dw computed
    from the same pre-step state, then both applied)."""
    v = f32(-75.0)
    w = f32(0.0)
    v_th, v_reset, e_l = f32(-55.0), f32(-75.0), f32(-75.0)
    alpha, beta = f32(6.0), f32(10.0)
    leak_constant, integration_constant = f32(-1.0), f32(1.0)
    g_l, tau_m, c_m = f32(10.0), f32(10.0), f32(100.0)
    dt, tref = f32(0.1), f32(10.0)
    slope_factor = f32(1.0)
    refractory_count = f32(0.0)
    i = f32(i)
    out = []
    for _ in range(steps):
        dv = (leak_constant * (v - e_l)
              + (slope_factor * np.exp((v - v_th) / slope_factor, dtype=f32)
                 if exp_term else f32(0.0))
              + integration_constant * (i / g_l)
              - (w / g_l)) * (dt / c_m)
        dw = (alpha * (v - e_l) - w) * (dt / tau_m)
        v = v + dv
        w = w + dw
        spiking = False
        if refractory_count > 0:
            v = v_reset
            refractory_count = refractory_count - f32(1.0)
        elif v >= v_th:
            spiking = True
            v = v_reset
            w = w + beta
            refractory_count = tref / dt
        out.append((float(v), float(w), spiking))
    return out


def alif_trace(i, steps):
    return _adaptive_trace(i, steps, exp_term=False)


def adex_trace(i, steps):
    return _adaptive_trace(i, steps, exp_term=True)


def leaky_izhikevich_trace(i, steps):
    """Leaky Izhikevich (integrate_and_fire/mod.rs:1296-1318 defaults,
    :1342-1348 dv with w*(v-e_l) leak coupling, :1225-1247 dw + spike
    handling; same iterate order as Izhikevich)."""
    v = f32(-65.0)
    w = f32(30.0)
    a, b, c, d = f32(0.02), f32(0.2), f32(-55.0), f32(8.0)
    e_l = f32(-65.0)
    v_th, tau_m, c_m, dt = f32(30.0), f32(10.0), f32(100.0), f32(0.1)
    i = f32(i)
    out = []
    for _ in range(steps):
        dv = (f32(0.04) * v ** f32(2.0) + f32(5.0) * v + f32(140.0)
              - w * (v - e_l) + i) * (dt / c_m)
        dw = (a * (b * v - w)) * (dt / tau_m)
        v = v + dv
        w = w + dw
        spiking = False
        if v >= v_th:
            spiking = True
            v = c
            w = w + d
        out.append((float(v), float(w), spiking))
    return out


def simple_lif_trace(i, steps):
    """SimpleLeakyIntegrateAndFire (integrate_and_fire/mod.rs:1540-1558
    defaults, :1580-1582 dv = (g*(v-e)+i)*dt, :1567-1577 reset-only spike
    handling, no refractory period)."""
    v = f32(-75.0)
    g, e = f32(-0.1), f32(0.0)
    v_th, v_reset, dt = f32(-55.0), f32(-75.0), f32(0.1)
    i = f32(i)
    out = []
    for _ in range(steps):
        v = v + (g * (v - e) + i) * dt
        spiking = False
        if v >= v_th:
            spiking = True
            v = v_reset
        out.append((float(v), spiking))
    return out


def bcm_izhikevich_trace(i, steps):
    """BCM Izhikevich (integrate_and_fire/mod.rs:1388-1416 defaults,
    :1432-1456 iterate: num_spikes counted from the PREVIOUS step's
    is_spiking and NEVER reset — current_activity therefore accumulates
    lifetime spikes / (window * dt); average_activity is a period-3
    leaky average updated at window crossings)."""
    v = f32(-65.0)
    w = f32(30.0)
    a, b, c, d = f32(0.02), f32(0.2), f32(-55.0), f32(8.0)
    v_th, tau_m, c_m, dt = f32(30.0), f32(1.0), f32(100.0), f32(0.1)
    period = 3
    num_spikes = 0
    firing_rate_clock = f32(0.0)
    firing_rate_window = f32(500.0)
    current_activity = f32(0.0)
    average_activity = f32(0.0)
    spiking = False
    i = f32(i)
    out = []
    for _ in range(steps):
        if spiking:
            num_spikes += 1
        firing_rate_clock = firing_rate_clock + dt
        if firing_rate_clock >= firing_rate_window:
            firing_rate_clock = f32(0.0)
            current_activity = f32(num_spikes) / (firing_rate_window * dt)
            average_activity = average_activity \
                - average_activity / f32(period)
            average_activity = average_activity \
                + current_activity / f32(period)
        dv = (f32(0.04) * v ** f32(2.0) + f32(5.0) * v + f32(140.0)
              - w + i) * (dt / c_m)
        dw = (a * (b * v - w)) * (dt / tau_m)
        v = v + dv
        w = w + dw
        spiking = False
        if v >= v_th:
            spiking = True
            v = c
            w = w + d
        out.append((float(v), float(current_activity),
                    float(average_activity), num_spikes, spiking))
    return out


def izhikevich_chemical_trace(t_sched, steps):
    """Izhikevich driven purely chemically through AMPA/NMDA/GABA ionotropic
    receptors with Approximate kinetics (iterate_and_spike/mod.rs:234-252
    order: r = t (ApproximateReceptor :430-441), receptor currents from the
    PRE-update voltage (:1078-1167: AMPA/GABA I = g*r*(v-e); NMDA Mg block
    1/(1+exp(-0.062 v)*mg/3.75), g=0.6, mg=0.3; GABA g=1.2, e=-80), then
    v += dv + (-(sum I) * dt / c_m); nt release uses the PREVIOUS step's
    spike flag (ApproximateNeurotransmitter :192-195 reads is_spiking
    before handle_spiking updates it).

    ``t_sched(step) -> (t_ampa, t_nmda, t_gaba)`` is the presynaptic
    concentration schedule."""
    v = f32(-65.0)
    w = f32(30.0)
    a, b, c, d = f32(0.02), f32(0.2), f32(-55.0), f32(8.0)
    v_th, tau_m, c_m, dt = f32(30.0), f32(1.0), f32(100.0), f32(0.1)
    g_ampa, e_ampa = f32(1.0), f32(0.0)
    g_nmda, mg, e_nmda = f32(0.6), f32(0.3), f32(0.0)
    g_gaba, e_gaba = f32(1.2), f32(-80.0)
    out = []
    for k in range(steps):
        t_ampa, t_nmda, t_gaba = (f32(x) for x in t_sched(k))
        # update_receptor_kinetics: ApproximateReceptor r = t
        r_ampa, r_nmda, r_gaba = t_ampa, t_nmda, t_gaba
        # set_receptor_currents at the pre-update voltage
        i_ampa = (g_ampa * r_ampa) * (v - e_ampa)
        block = f32(1.0) / (f32(1.0)
                            + (np.exp(f32(-0.062) * v, dtype=f32) * mg)
                            / f32(3.75))
        i_nmda = ((block * g_nmda) * r_nmda) * (v - e_nmda)
        i_gaba = (g_gaba * r_gaba) * (v - e_gaba)
        nt_dv = -(i_ampa + i_nmda + i_gaba) * (dt / c_m)
        dv = (f32(0.04) * v ** f32(2.0) + f32(5.0) * v + f32(140.0)
              - w) * (dt / c_m)
        dw = (a * (b * v - w)) * (dt / tau_m)
        v = v + dv + nt_dv
        w = w + dw
        spiking = False
        if v >= v_th:
            spiking = True
            v = c
            w = w + d
        out.append((float(v), float(w), spiking))
    return out


def dopa_glu_gaba_trace(t_sched, s_d1, s_d2, steps):
    """lixirnet DopaGluGABA Izhikevich (DSL source embedded at
    interface_gpu/lixirnet/src/lib.rs:22-79): BoundedReceptorKinetics
    r = clamp(t, 0, r_max); Glutamate current with the 3.57 Mg denominator
    and nmda_r ^ nmda_modifier; Dopamine block runs LAST, so the D1/D2
    modifiers it computes apply to the NEXT step's currents; neuron block
    dv/dt = (0.04v^2+5v+140-u+i)/c_m with tau_m=1, c_m=100, u0=30.

    ``t_sched(step) -> (t_glu, t_gaba, t_dopa)``."""
    v = f32(-65.0)
    u = f32(30.0)
    a, b, c, d = f32(0.02), f32(0.2), f32(-55.0), f32(8.0)
    v_th, tau_m, c_m, dt = f32(30.0), f32(1.0), f32(100.0), f32(0.1)
    g_ampa, g_nmda, mg = f32(1.0), f32(0.6), f32(0.3)
    e_ampa = e_nmda = f32(0.0)
    g_gaba, e_gaba = f32(1.2), f32(-80.0)
    s_d1, s_d2 = f32(s_d1), f32(s_d2)
    inh_mod = f32(1.0)
    nmda_mod = f32(1.0)
    out = []
    for k in range(steps):
        t_glu, t_gaba, t_dopa = (f32(x) for x in t_sched(k))
        # BoundedReceptorKinetics: r = min(max(t, 0), r_max)
        ampa_r = nmda_r = min(max(t_glu, f32(0.0)), f32(1.0))
        gaba_r = min(max(t_gaba, f32(0.0)), f32(1.0))
        r_d1 = r_d2 = min(max(t_dopa, f32(0.0)), f32(1.0))
        # receptor blocks in declaration order at the pre-update voltage
        block = f32(1.0) / (f32(1.0)
                            + np.exp(f32(-0.062) * v, dtype=f32) * mg
                            / f32(3.57))
        glu_current = inh_mod * g_ampa * ampa_r * (v - e_ampa) \
            + block * inh_mod * g_nmda \
            * np.power(nmda_r, nmda_mod, dtype=f32) * (v - e_nmda)
        gaba_current = g_gaba * gaba_r * (v - e_gaba)
        inh_mod = f32(1.0) - r_d2 * s_d2       # applies NEXT step
        nmda_mod = f32(1.0) - r_d1 * s_d1
        nt_dv = -(glu_current + gaba_current) * (dt / c_m)
        dv = (f32(0.04) * v ** f32(2.0) + f32(5.0) * v + f32(140.0)
              - u) * (dt / c_m)
        du = (a * (b * v - u)) * (dt / tau_m)
        v = v + dv + nt_dv
        u = u + du
        spiking = False
        if v >= v_th:
            spiking = True
            v = c
            u = u + d
        out.append((float(v), float(u), float(inh_mod), float(nmda_mod),
                    spiking))
    return out
