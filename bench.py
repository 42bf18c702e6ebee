#!/usr/bin/env python3
"""Benchmark: photon scatter steps/sec/chip (the BASELINE.json metric).

Runs the fixed-step photon superstep engine (hop-drop-spin with respawn,
MCML tissue-optics config) at steady state on the attached chip and prints
ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference CPU sustains ~1e5 bounce-steps/s (SURVEY.md §6 —
4.5M paths in 149 s with ~2 BVH traversals per bounce; BASELINE.md derived
anchor), so vs_baseline = value / 1e5.
"""

import json
import time

import jax

from light_transport_tpu.core.config import MediumConfig, PhotonRunConfig
from light_transport_tpu.scene.medium import LayeredMedium
from light_transport_tpu.transport.photon import run_fixed_steps

BASELINE_STEPS_PER_SEC = 1e5

LANES = 1 << 20
STEPS = 256


def main():
    # BASELINE.json config 2 flavor: anisotropic HG medium, mismatched index
    medium = LayeredMedium.build(
        [MediumConfig(mu_a=1.0, mu_s=9.0, g=0.9, n=1.37)], n_above=1.0
    )
    cfg = PhotonRunConfig(nr=64, nz=64, dr=0.01, dz=0.01)

    @jax.jit
    def bench_step(key):
        _, tallies = run_fixed_steps(medium, cfg, key, LANES, STEPS)
        return tallies.steps

    # compile + warmup
    bench_step(jax.random.key(0)).block_until_ready()

    # measure best of 3 (tunnel jitter)
    best = 0.0
    for i in range(3):
        t0 = time.perf_counter()
        steps = float(bench_step(jax.random.key(i + 1)).block_until_ready())
        dt = time.perf_counter() - t0
        best = max(best, steps / dt)

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
