#!/usr/bin/env python3
"""Per-component cost attribution for the unbiased (quota) Pallas engine.

Runs the full_scale preset at a pilot photon count with tally components
ablated one at a time (kernel RNG order, physics and counters unchanged —
only the recording/folding of the named component is skipped), printing a
steady ms/block + steps/s table.  This is how the PERF.md fold-attribution
numbers are measured; run it after any kernel change that should move one
component's cost.

Usage: python scripts/bench_quota_ablation.py [--photons 1e7] [--tiles 64]
       [--k-steps 128] [--chunk-blocks 16] [--combos default]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

COMBOS = {
    "full": frozenset(),
    "kernel_only": frozenset({"rz", "det", "vol", "exits"}),
    "no_rz": frozenset({"rz"}),
    "no_det": frozenset({"det"}),
    "no_vol": frozenset({"vol"}),
    "no_exits": frozenset({"exits"}),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--photons", type=float, default=1e7)
    ap.add_argument("--tiles", type=int, default=64)
    ap.add_argument("--k-steps", type=int, default=128)
    ap.add_argument("--chunk-blocks", type=int, default=16)
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--combos", default="full,kernel_only,no_rz,no_det,"
                    "no_vol,no_exits")
    ap.add_argument("--interleave", action="store_true",
                    help="interleaved rz flush (r5): stage each window's "
                         "records and flush between the next window's step "
                         "chunks")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from light_transport_tpu.core.hostio import host_get
    from light_transport_tpu.models.presets import full_scale
    from light_transport_tpu.ops.pallas.photon_kernel import (
        LANES, ROWS, simulate_pallas,
    )

    medium, cfg = full_scale()
    cfg = dataclasses.replace(cfg, n_photons=int(args.photons))
    lanes = ROWS * LANES * args.tiles

    print(f"devices: {jax.devices()}", file=sys.stderr)
    t0 = time.perf_counter()
    float(host_get(jnp.arange(1024.0).sum()))
    print(f"backend warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    rows = []
    for name in args.combos.split(","):
        ab = COMBOS[name]
        timings = {}
        t0 = time.perf_counter()
        tl = simulate_pallas(medium, cfg, seed=7, lanes=lanes,
                             k_steps=args.k_steps,
                             chunk_blocks=args.chunk_blocks,
                             unroll=args.unroll,
                             timings=timings, _ablate=ab,
                             interleave_flush=(args.interleave
                                               and "rz" not in ab))
        jax.block_until_ready(tl.absorb_rz)
        wall = time.perf_counter() - t0
        row = {
            "combo": name,
            "interleave": bool(args.interleave and "rz" not in ab),
            "steady_steps_per_sec": timings.get("steady_steps_per_sec"),
            "ms_per_block": timings.get("ms_per_block"),
            "steady_occupancy": timings.get("steady_occupancy"),
            "steady_blocks": timings.get("steady_blocks"),
            "compile_s": timings.get("compile_plus_first_chunk_s"),
            "wall_s": wall,
            "launched_exact": tl.n_launched == cfg.n_photons,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    full = next((r for r in rows if r["combo"] == "full"), None)
    if full:
        print("\n# deltas vs full (ms/block):", file=sys.stderr)
        for r in rows:
            if r["combo"] != "full" and r["ms_per_block"]:
                d = full["ms_per_block"] - r["ms_per_block"]
                print(f"  {r['combo']:>12}: {d:+.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
