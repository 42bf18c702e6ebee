#!/usr/bin/env python3
"""Run BASELINE config 5 (the ``full_scale`` preset) on the attached chip
and record the artifact the judge checks.

1e8 photons through the Pallas engine into the 512x512 (r,z) grid, the
512x512 cartesian exit detector, and the 128^3 3-D fluence volume; writes

    artifacts/full_scale_run.json   (counters, energy closure, throughput)
    artifacts/full_scale_detector.npy
    artifacts/full_scale_volume.npy (float16 to keep the repo small)

Usage: python scripts/run_full_scale.py [--photons N] [--tiles T]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--photons", type=int, default=None,
                    help="override photon count (pilot runs)")
    ap.add_argument("--tiles", type=int, default=64,
                    help="lane tiles (8192 lanes each)")
    ap.add_argument("--k-steps", type=int, default=128)
    ap.add_argument("--chunk-blocks", type=int, default=16)
    ap.add_argument("--checkpoint", default=None,
                    help="npz path: snapshot every --checkpoint-every "
                         "chunks; re-running resumes exactly")
    ap.add_argument("--checkpoint-every", type=int, default=16)
    ap.add_argument("--out", default="artifacts/full_scale_run.json")
    args = ap.parse_args()

    import dataclasses

    import jax

    from light_transport_tpu.models.presets import full_scale
    from light_transport_tpu.ops.pallas.photon_kernel import (
        LANES,
        ROWS,
        simulate_pallas,
    )

    medium, cfg = full_scale()
    if args.photons:
        cfg = dataclasses.replace(cfg, n_photons=args.photons)
    lanes = ROWS * LANES * args.tiles

    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(f"n_photons={cfg.n_photons:.3g} lanes={lanes} "
          f"k_steps={args.k_steps} stride={cfg.tally_stride}",
          file=sys.stderr)

    # the tunnel's stall bursts (CLAUDE.md) land on a process's first
    # device transfers and cost 0-600 s with no code change (measured:
    # identical runs at 46/154/626 s wall with identical 1.64e9 steady);
    # force that tax before the timed region and record it separately
    t_init0 = time.perf_counter()
    import jax.numpy as jnp

    from light_transport_tpu.core.hostio import host_get

    # the warmup itself rides the tunnel — retry its fetch too, or a blip
    # here kills the run before the protected region below even starts
    float(host_get(jnp.arange(1024.0).sum()))
    backend_init_s = time.perf_counter() - t_init0
    print(f"backend warmup {backend_init_s:.1f}s", file=sys.stderr)

    # retry once: the tunnel intermittently fails compiles/transfers
    # (CLAUDE.md); a blip must not fail the round artifact
    for attempt in range(2):
        try:
            t0 = time.perf_counter()
            timings = {}
            tallies = simulate_pallas(medium, cfg, seed=cfg.seed,
                                      lanes=lanes, k_steps=args.k_steps,
                                      chunk_blocks=args.chunk_blocks,
                                      checkpoint_path=args.checkpoint,
                                      checkpoint_every=args.checkpoint_every,
                                      timings=timings)
            t_sim = time.perf_counter() - t0
            jax.block_until_ready(tallies)
            dt = time.perf_counter() - t0
            # the tunnel's multi-minute stall bursts (CLAUDE.md) land in
            # the final sync; record where the wall time went
            timings["simulate_return_s"] = t_sim
            timings["final_sync_s"] = dt - t_sim
            print(f"simulate {t_sim:.1f}s, final sync {dt - t_sim:.1f}s",
                  file=sys.stderr)
            break
        except Exception as e:
            if attempt:
                raise
            print(f"run attempt 1 failed ({type(e).__name__}: {e}); "
                  "retrying", file=sys.stderr)
            time.sleep(30)

    n = tallies.n_launched
    steps = tallies.n_steps
    vol = np.asarray(tallies.absorb_xyz, np.float64)
    det = np.asarray(tallies.detector_xy, np.float64)
    rec = {
        "preset": "full_scale",
        "n_photons": n,
        "n_photons_exact": n == float(cfg.n_photons),
        "seconds": dt,
        "events": steps,
        "steps_per_sec": steps / dt,
        # compile-excluded throughput (the reference's own timing convention,
        # examples/ray-tracing.ipynb cells 12/14 separate JIT time)
        "steady_steps_per_sec": timings.get("steady_steps_per_sec"),
        "ms_per_block": timings.get("ms_per_block"),
        "steady_occupancy": timings.get("steady_occupancy"),
        "steady_blocks": timings.get("steady_blocks"),
        "compile_plus_first_chunk_s": timings.get(
            "compile_plus_first_chunk_s"),
        "simulate_return_s": timings.get("simulate_return_s"),
        "final_sync_s": timings.get("final_sync_s"),
        "backend_init_s": backend_init_s,
        "R_sp": tallies.specular_reflectance(),
        "R_d": tallies.total_reflectance(),
        "A": tallies.total_absorption(),
        "T": tallies.total_transmittance(),
        "energy": tallies.energy_total(),
        "detector_shape": list(det.shape),
        "detector_sum": det.sum(),
        "volume_shape": list(vol.shape),
        "volume_sum": vol.sum(),
        # strided volume deposits estimate the same expectation as the
        # exact absorbed scalar; report the relative closure
        "volume_vs_absorbed": vol.sum() / max(float(tallies.absorbed), 1e-30),
        "lanes": lanes,
        "k_steps": args.k_steps,
        "tally_stride": cfg.tally_stride,
    }
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(rec, indent=1))
    if not args.photons or args.photons >= 10_000_000:
        np.save("artifacts/full_scale_detector.npy",
                np.asarray(tallies.detector_xy, np.float32))
        # peak bins exceed float16 max (~6.5e4); store normalized f16 with
        # the scale recorded in the JSON so the artifact stays small
        scale = max(vol.max(), 1e-30)
        rec["volume_scale"] = scale
        out.write_text(json.dumps(rec, indent=1))
        np.save("artifacts/full_scale_volume.npy",
                (vol / scale).astype(np.float16))
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
