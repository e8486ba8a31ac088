"""Bytes/step accounting for the fused-kernel bench rows (docs/performance.md).

Derives the per-step HBM traffic of each fused kernel from its actual
engagement config (plane counts x dtype x K-amortization), so a measured
step time converts to achieved HBM bandwidth and a roofline position on
TPU v5e (819 GB/s HBM).  Run on CPU — it only builds graphs host-side:

    JAX_PLATFORMS=cpu python docs/roofline.py [us_512 us_2048 us_4096]

With measured step times (microseconds) passed in, prints the achieved
GB/s and the fraction of v5e HBM bandwidth per row; without, prints the
bytes/step table only.
"""
import sys

import numpy as np

HBM_GBPS = 819.0  # TPU v5e peak HBM bandwidth


def stencil_graph(rows, cols, radius=2.0, keep_prob=0.8, seed=42):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import spiking_neural_networks_tpu as snn
    lat = snn.Lattice(snn.Izhikevich())
    lat.populate(rows, cols, gap_conductance=10.0)
    lat.connect_stencil(radius=radius, keep_prob=keep_prob, seed=seed)
    return lat.graph


def multistep_row(graph):
    """fused_izhikevich_multistep (whole lattice VMEM-resident, K steps):
    per launch HBM = read(v,w,lft + n_off weight planes + in_deg + 9 param
    planes) + write(v,w,lft,spk); intermediates never leave VMEM."""
    rows, cols = graph.shape
    n_off = graph.weights.shape[0]
    plane = rows * cols * 4
    K = 16
    reads = (3 + n_off + 1 + 9) * plane
    writes = 4 * plane
    return (reads + writes) / K, dict(n_off=n_off, K=K, plane_mb=plane / 2**20)


def tiled_row(graph):
    """fused_izhikevich_multistep_tiled: per K-step launch the full grid's
    planes stream once, state/weight tiles extended by the halo."""
    from spiking_neural_networks_tpu.ops import pallas_stencil
    rows, cols = graph.shape
    n_off = graph.weights.shape[0]
    tile_r, halo, K = pallas_stencil.multistep_tiled_config(graph)
    plane = rows * cols * 4
    grow = (tile_r + 2 * halo) / tile_r     # halo read overhead
    reads = (3 + n_off + 1) * plane * grow  # params ride SMEM scalars
    writes = 4 * plane
    return ((reads + writes) / K,
            dict(n_off=n_off, K=K, tile_r=tile_r, halo=halo,
                 plane_mb=plane / 2**20))


def main():
    us = [float(x) for x in sys.argv[1:]]
    rows = []
    g512 = stencil_graph(512, 512)
    b, meta = multistep_row(g512)
    rows.append(("512x512 multistep (VMEM-resident)", b, meta))
    g2048 = stencil_graph(2048, 2048)
    b, meta = tiled_row(g2048)
    rows.append(("2048x2048 tiled", b, meta))
    g4096 = stencil_graph(4096, 4096)
    b, meta = tiled_row(g4096)
    rows.append(("4096x4096 tiled", b, meta))
    for i, (name, b, meta) in enumerate(rows):
        line = f"{name}: {b / 2**20:.2f} MB/step  ({meta})"
        if i < len(us):
            gbps = b / (us[i] * 1e-6) / 1e9
            line += f"  @ {us[i]:.1f} us/step -> {gbps:.0f} GB/s" \
                    f" = {100 * gbps / HBM_GBPS:.0f}% of v5e HBM"
        print(line)


if __name__ == "__main__":
    main()
