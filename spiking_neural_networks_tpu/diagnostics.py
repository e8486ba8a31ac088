"""Why did (or didn't) the fused Mosaic fast path engage?

The reference's GPU classes make the fast path explicit — you construct a
``GPU*Lattice`` or you don't (interface_gpu/lixirnet/src/lattices/mod.rs).
Here the fast path is an automatic engagement decision spread over the
``supports*`` gates in `ops/pallas_stencil.py`, `ops/pallas_hh.py` and
`ops/pallas_reward.py`, and after a run the only signal is
``lat._last_run_fused``.  This module adds the missing diagnosis:

    >>> import spiking_neural_networks_tpu as snn
    >>> snn.why_not_fused(lat)
    ['graph history recording (update_graph_history) has no fused form']

returns a list of human-readable reasons the fused path would NOT engage
for a ``Lattice`` / ``RewardModulatedLattice`` (empty list: a fused path
applies).  The checklist mirrors the documented gate conditions; when a
gate declines for a condition not on the checklist the generic final
reason names the gate to read, so a stale checklist degrades to a pointer
instead of misinformation.
"""

from __future__ import annotations


def _model_reason(lat, reasons):
    from .ops.pallas_reward import _model_kind
    from .models.integrate_and_fire import Izhikevich
    if _model_kind(lat.model) is None \
            and type(lat.model) is not Izhikevich:
        reasons.append(
            f"model {type(lat.model).__name__} is outside the fused kernel"
            " families (Izhikevich/ALIF/LIF; HH via ops/pallas_hh; other"
            " elementwise models ride the generic traced-step kernel only"
            " without plasticity/histories)")


def _graph_reason(lat, reasons):
    from .ops.graph import StencilGraph
    if not isinstance(lat.graph, StencilGraph):
        reasons.append(
            f"connectivity compiled to {type(lat.graph).__name__}, not a"
            " StencilGraph — the lattice kernels are stencil programs"
            " (connect() auto-decomposes small-offset-support masks;"
            " dense/COO stay on XLA)")


def why_not_fused(lat):
    """Reasons the fused Mosaic fast path would not engage for ``lat``.

    Accepts a ``Lattice`` or ``RewardModulatedLattice``.  Returns a list
    of strings, empty when a fused path applies (i.e. a run with
    ``use_pallas`` unset on TPU, or ``True`` elsewhere, would set
    ``_last_run_fused``)."""
    from .core.lattice import Lattice, _mask_any
    from .core.reward import RewardModulatedLattice
    from .ops import pallas_stencil, pallas_reward

    reasons = []
    if isinstance(lat, RewardModulatedLattice):
        if pallas_reward.supports_lattice(lat):
            return []
        from .core.reward import RewardModulatedSTDP
        _model_reason(lat, reasons)
        _graph_reason(lat, reasons)
        if lat.chemical_synapse or not lat.electrical_synapse:
            reasons.append("reward kernels cover electrical synapses only")
        if getattr(lat, "mesh", None) is not None:
            reasons.append("sharded reward lattices stay on GSPMD/XLA")
        if lat.cols > 128:
            reasons.append(
                f"cols={lat.cols} exceeds the 128-lane grid layout")
        if type(lat.reward_modulator) is not RewardModulatedSTDP:
            reasons.append(
                "custom reward modulator (only RewardModulatedSTDP is"
                " implemented in-kernel)")
        if bool(_mask_any(lat.state["nt$mask"])):
            reasons.append("neurotransmitters inserted (chemical release"
                           " has no reward-kernel form)")
        if not reasons:
            reasons.append("declined by ops/pallas_reward.supports_lattice"
                           " for a condition not on this checklist")
        return reasons

    if not isinstance(lat, Lattice):
        raise TypeError(f"why_not_fused: unsupported type {type(lat)!r};"
                        " pass a Lattice or RewardModulatedLattice (for"
                        " networks, check net._last_run_fused after a run)")

    skip_nt = not bool(_mask_any(lat.state["nt$mask"]))
    plain_elec = pallas_stencil.supports(
        lat.model, lat.graph, lat.electrical_synapse, lat.chemical_synapse,
        lat.do_plasticity)

    if lat.mesh is not None:
        if not plain_elec:
            reasons.append(
                "sharded: only the plain electrical Izhikevich stencil"
                " class composes the fused kernel with a mesh"
                " (shard_map + ppermute ghost rows)")
        elif lat._history_items() or lat.update_graph_history:
            reasons.append("sharded fused path cannot emit history planes")
        elif pallas_stencil.sharded_multistep_config(lat.graph,
                                                     lat.mesh) is None:
            reasons.append(
                "sharded fused config infeasible (needs a 1-D mesh, rows"
                " divisible by it, cross-row coupling, and the extended"
                " row block within VMEM)")
        return reasons

    if plain_elec:
        # the per-step kernel form engages whenever the lane layout works,
        # even with graph histories; the multi-step/tiled upgrades need
        # no graph history (and the tiled form no histories at all)
        if pallas_stencil.step_kernel_ok(lat.graph):
            return []
        emit = 1 if lat._history_items() else 0
        if not lat.update_graph_history \
                and (pallas_stencil.multistep_vmem_ok(lat.graph, emit=emit)
                     or (not emit
                         and pallas_stencil.multistep_tiled_config(lat.graph)
                         and pallas_stencil.uniform_lattice_params(
                             lat.state))):
            return []
        reasons.append(
            f"cols={lat.cols} has no (rows, L, 128) per-step layout and"
            " the multi-step/tiled upgrade is unavailable"
            + (" (graph history recording blocks it)"
               if lat.update_graph_history else
               " (VMEM budget, or histories/non-uniform params on the"
               " tiled form)"))
        return reasons

    if not skip_nt:
        from .ops import pallas_hh
        if lat._history_items() or lat.update_graph_history:
            reasons.append("chemical lattices with histories have no"
                           " fused form")
        elif pallas_hh.supports(lat.model, lat.graph, lat.chemical_synapse,
                                lat.do_plasticity, lat.plasticity):
            return []
        else:
            reasons.append(
                "neurotransmitters inserted: only the HodgkinHuxley"
                " chemical class has a fused kernel (ops/pallas_hh)")
        return reasons

    if lat.update_graph_history:
        reasons.append("graph (weight) history recording has no fused"
                       " form for this lattice class")
        return reasons

    _graph_reason(lat, reasons)
    if not lat.electrical_synapse and skip_nt:
        reasons.append("no electrical synapse and no neurotransmitters:"
                       " nothing for a kernel to gather")
    if lat.do_plasticity:
        from .core.plasticity import STDP
        if type(lat.plasticity) is not STDP:
            reasons.append(
                f"plasticity {type(lat.plasticity).__name__}: only plain"
                " STDP is implemented in the fused 'plastic' lattice class")
        elif skip_nt and pallas_reward.plain_stdp_lattice_spec(lat) is None:
            _model_reason(lat, reasons)
            if lat.cols > 128:
                reasons.append(
                    f"cols={lat.cols} exceeds the 128-lane grid layout")
            if not reasons:
                reasons.append(
                    "declined by ops/pallas_reward.plain_stdp_lattice_spec"
                    " for a condition not on this checklist (shape/VMEM)")
        return reasons
    if skip_nt:
        _model_reason(lat, reasons)
        if pallas_stencil.supports_model(
                lat.model, lat.graph, lat.electrical_synapse,
                lat.chemical_synapse, lat.do_plasticity):
            if lat._history_items():
                reasons.append(
                    "histories on a generic traced-step model: per-step"
                    " stores of select-chain values are the documented"
                    " XLA:CPU compile blowup (ops/pallas_stencil"
                    " module gotchas) — only the Izhikevich kernels emit")
            elif not pallas_stencil.model_multistep_vmem_ok(lat.graph,
                                                            lat.model):
                reasons.append("model fields exceed the generic kernel's"
                               " VMEM budget")
    if not reasons:
        reasons.append("declined by the ops/pallas_stencil gates for a"
                       " condition not on this checklist")
    return reasons
