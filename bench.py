#!/usr/bin/env python3
"""Benchmark: photon scatter steps/sec/chip (the BASELINE.json metric).

Measures the fused Pallas photon-superstep engine (hop-drop-spin with
respawn, anisotropic HG medium with mismatched index) at steady state on
the attached chip and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference CPU sustains ~1e5 bounce-steps/s (SURVEY.md §6 —
4.5M paths in 149 s with ~2 BVH traversals per bounce; BASELINE.md derived
anchor), so vs_baseline = value / 1e5.

Falls back to the XLA superstep engine if the Pallas path fails to compile
on the attached backend.
"""

import json
import time

import jax

from light_transport_tpu.core.config import MediumConfig, PhotonRunConfig
from light_transport_tpu.scene.medium import LayeredMedium

BASELINE_STEPS_PER_SEC = 1e5


def _medium():
    # BASELINE.json config 2 flavor: anisotropic HG medium, mismatched index
    return LayeredMedium.build(
        [MediumConfig(mu_a=1.0, mu_s=9.0, g=0.9, n=1.37)], n_above=1.0
    )


def bench_pallas_engine():
    from light_transport_tpu.ops.pallas.photon_kernel import (
        LANES,
        ROWS,
        bench_pallas,
    )

    medium = _medium()
    cfg = PhotonRunConfig(nr=64, nz=64, dr=0.01, dz=0.01)
    tiles, k_steps, blocks = 8, 64, 32
    lanes = ROWS * LANES * tiles

    from light_transport_tpu.tally.tallies import counter_value

    @jax.jit
    def step(seed):
        return bench_pallas(medium, cfg, seed, lanes, blocks,
                            k_steps=k_steps).steps

    step(0).block_until_ready()  # compile + warmup

    best = 0.0
    for trial in range(2):
        # pipeline several async dispatches to hide tunnel latency
        t0 = time.perf_counter()
        outs = [step(10 * trial + i + 1) for i in range(4)]
        total = sum(counter_value(o.block_until_ready()) for o in outs)
        dt = time.perf_counter() - t0
        best = max(best, total / dt)
    return best


def bench_xla_engine():
    from light_transport_tpu.tally.tallies import counter_value
    from light_transport_tpu.transport.photon import run_fixed_steps

    medium = _medium()
    cfg = PhotonRunConfig(nr=64, nz=64, dr=0.01, dz=0.01)
    lanes, steps = 1 << 20, 256

    @jax.jit
    def bench_step(key):
        _, tallies = run_fixed_steps(medium, cfg, key, lanes, steps)
        return tallies.steps

    bench_step(jax.random.key(0)).block_until_ready()
    best = 0.0
    for i in range(3):
        t0 = time.perf_counter()
        s = counter_value(bench_step(jax.random.key(i + 1)).block_until_ready())
        best = max(best, s / (time.perf_counter() - t0))
    return best


def main():
    try:
        best = bench_pallas_engine()
    except Exception as e:
        import sys

        print(f"pallas bench failed ({type(e).__name__}); falling back "
              f"to the XLA engine", file=sys.stderr)
        best = bench_xla_engine()

    print(
        json.dumps(
            {
                "metric": "photon_scatter_steps_per_sec_per_chip",
                "value": best,
                "unit": "steps/s/chip",
                "vs_baseline": best / BASELINE_STEPS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
