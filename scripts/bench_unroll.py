#!/usr/bin/env python3
"""A/B partial unroll of the quota engine's in-kernel step loop.

PERF.md records the rolled fori_loop (unroll=1) at ~25% steady cost vs
full unroll (cross-step ILP), with full unroll of the k=128 windowed
config blowing the 16 MB VMEM scoped limit / compile budget.  The open
question (BACKLOG): does Mosaic accept *partial* unroll (2/4/8) of the
stride-window inner loop, and does it buy back ILP at bounded compile
cost?  This script measures compile time, steady throughput, and R_d
parity at the full_scale preset for each unroll factor.

Usage: python scripts/bench_unroll.py [--photons 2e7] [--tiles 64]
       [--unrolls 1,2,4,8]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--photons", type=float, default=2e7)
    ap.add_argument("--tiles", type=int, default=64)
    ap.add_argument("--k-steps", type=int, default=128)
    ap.add_argument("--chunk-blocks", type=int, default=16)
    ap.add_argument("--unrolls", default="1,2,4,8")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from light_transport_tpu.core.hostio import host_get
    from light_transport_tpu.models.presets import full_scale
    from light_transport_tpu.ops.pallas.photon_kernel import (
        LANES,
        ROWS,
        simulate_pallas,
    )

    medium, cfg = full_scale()
    cfg = dataclasses.replace(cfg, n_photons=int(args.photons))
    lanes = ROWS * LANES * args.tiles
    print(f"devices: {jax.devices()}", flush=True)
    float(host_get(jnp.arange(1024.0).sum()))  # absorb the tunnel init tax

    ref_rd = None
    for u in [int(x) for x in args.unrolls.split(",")]:
        t0 = time.perf_counter()
        try:
            timings = {}
            tallies = simulate_pallas(medium, cfg, seed=cfg.seed,
                                      lanes=lanes, k_steps=args.k_steps,
                                      chunk_blocks=args.chunk_blocks,
                                      unroll=u, timings=timings)
            jax.block_until_ready(tallies)
        except Exception as e:
            print(f"unroll={u}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        wall = time.perf_counter() - t0
        rd = tallies.total_reflectance()
        n = tallies.n_launched
        exact = n == float(cfg.n_photons)
        if ref_rd is None:
            ref_rd = rd
        print(f"unroll={u}: steady "
              f"{timings['steady_steps_per_sec'] / 1e9:.3f}e9 steps/s, "
              f"compile+first {timings['compile_plus_first_chunk_s']:.1f}s, "
              f"wall {wall:.1f}s, R_d {rd:.5f} "
              f"(drift {abs(rd - ref_rd):.2e}), n_exact={exact}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
