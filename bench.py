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

from light_transport_tpu.core.cache import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402

from light_transport_tpu.core.config import MediumConfig, PhotonRunConfig
from light_transport_tpu.scene.medium import LayeredMedium

BASELINE_STEPS_PER_SEC = 1e5


def _medium():
    # BASELINE.json config 2 flavor: anisotropic HG medium, mismatched index
    return LayeredMedium.build(
        [MediumConfig(mu_a=1.0, mu_s=9.0, g=0.9, n=1.37)], n_above=1.0
    )


def bench_pallas_engine(trials: int = 5,
                        tiles: int = 32, k_steps: int = 96,
                        blocks: int = 384, sink=None):
    # r3 asymptote sweep (PERF.md §block-count asymptote): throughput climbs
    # with blocks-per-dispatch until per-call overhead amortizes out —
    # (tiles=8,k=64,blocks=32) measured 2.2e9 while the same kernel at
    # (32,96,384) sustains ~10e9; k=128 fails to compile over the tunnel.
    from light_transport_tpu.ops.pallas.photon_kernel import (
        LANES,
        ROWS,
        bench_pallas,
    )

    medium = _medium()
    cfg = PhotonRunConfig(nr=64, nz=64, dr=0.01, dz=0.01)
    lanes = ROWS * LANES * tiles

    from light_transport_tpu.tally.tallies import counter_value

    @jax.jit
    def step(seed):
        return bench_pallas(medium, cfg, seed, lanes, blocks,
                            k_steps=k_steps).steps

    step(0).block_until_ready()  # compile + warmup

    # ``sink``: caller-shared list — per-trial values land there as they
    # complete, so a wall-budget timeout mid-loop still salvages a number
    per_trial = sink if sink is not None else []
    # best-of-N over a few minutes: tunnel throughput swings +-30% hour to
    # hour with no code change (PERF.md §bench drift — the r1 2.54e9 vs r2
    # 2.04e9 delta reproduced with bit-identical kernels); per-trial values
    # are recorded so drift is attributable from the artifact alone
    for trial in range(trials):
        # pipeline several async dispatches to hide tunnel latency
        t0 = time.perf_counter()
        outs = [step(10 * trial + i + 1) for i in range(4)]
        total = sum(counter_value(o.block_until_ready()) for o in outs)
        dt = time.perf_counter() - t0
        per_trial.append(total / dt)
        if trial < trials - 1:
            time.sleep(15)  # sample distinct tunnel phases
    prov = {
        "engine": "pallas_bench_mode",
        "tiles": tiles, "k_steps": k_steps, "blocks": blocks,
        "lanes": lanes,
        "trials_steps_per_sec": [round(v) for v in per_trial],
    }
    return max(per_trial), prov


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


def parity_check(n: int = 200_000):
    """Chi-squared physics parity of the hardware-PRNG Pallas kernel vs the
    XLA threefry engine, run through the *sharded* entry point (shard_map +
    pallas_call on the attached mesh) so both the kernel physics and the
    multi-chip composition are validated on hardware every round
    (VERDICT.md next-round items 4 and 7).

    The chi-squared treats per-bin absorbed weight as pseudo-counts; photon
    weights are <= 1, so true variance is below Poisson and the bound is
    conservative in the lenient direction — it flags gross physics
    divergence, while the 3-sigma totals catch estimator-level bias.
    """
    import numpy as np

    from light_transport_tpu.api import simulate
    from light_transport_tpu.parallel.mesh import simulate_pallas_sharded
    from light_transport_tpu.tally.stats import (
        binomial_stderr,
        chi2_counts,
        mc_parity_3sigma,
    )

    medium = LayeredMedium.build(
        [MediumConfig(mu_a=1.0, mu_s=9.0, g=0.7, n=1.37)], n_above=1.0
    )
    cfg = PhotonRunConfig(n_photons=n, nr=32, nz=32, dr=0.02, dz=0.02)
    t_p = simulate_pallas_sharded(medium, cfg, seed=11)
    t_x = simulate(medium, cfg, seed=12)
    a = np.asarray(t_p.absorb_rz, np.float64).reshape(8, 4, 8, 4).sum((1, 3))
    b = np.asarray(t_x.absorb_rz, np.float64).reshape(8, 4, 8, 4).sum((1, 3))
    chi2, dof = chi2_counts(a.reshape(-1), b.reshape(-1), min_expected=50.0)
    se = binomial_stderr(t_x.total_reflectance(), n) * np.sqrt(2.0)
    r_ok = mc_parity_3sigma(t_p.total_reflectance(), t_x.total_reflectance(),
                            se, abs_floor=1e-3)
    return {
        "parity_chi2": chi2,
        "parity_dof": dof,
        "parity_chi2_per_dof": chi2 / max(dof, 1),
        "parity_r_d_pallas": t_p.total_reflectance(),
        "parity_r_d_xla": t_x.total_reflectance(),
        "parity_n_exact": t_p.n_launched == float(n),
        "parity_ok": bool(r_ok and chi2 / max(dof, 1) < 1.5
                          and t_p.n_launched == float(n)),
    }


def _backend_alive(timeout_s: float = 300.0) -> bool:
    """Probe device init with a watchdog.

    The axon tunnel can go fully dark for hours (2026-08-18 outage:
    even ``jax.devices()`` hung indefinitely).  Backend init is not
    interruptible, so probe it from a daemon thread and give up after
    ``timeout_s`` — an honest error record beats a silent hang that
    leaves the round with no bench artifact at all."""
    import threading

    out = {}

    def probe():
        try:
            out["devs"] = jax.devices()
        except Exception as e:  # pragma: no cover - backend-dependent
            out["err"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return "devs" in out


def _run_bounded(fn, timeout_s: float, label: str):
    """Run ``fn()`` on a daemon thread with a hard wall bound.

    Tunnel compiles are not interruptible from Python (the r4 bench hung
    >driver-timeout inside one, BENCH_r04 rc=124), so the only safe shape
    is: do the work on a thread we can abandon, and keep the main thread
    free to print the JSON artifact no matter what.  Returns
    ``(ok, value_or_error_string)``."""
    import threading

    out = {}

    def run():
        try:
            out["val"] = fn()
        except Exception as e:  # pragma: no cover - backend-dependent
            out["err"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(max(timeout_s, 1.0))
    if "val" in out:
        return True, out["val"]
    if "err" in out:
        return False, out["err"]
    return False, f"{label} timed out after {timeout_s:.0f}s"


# Total wall budget.  The driver gives the bench a finite slot; a single
# tunnel compile can sit 5-35 min (PERF.md §environment), so every phase
# below runs under _run_bounded against this deadline and the JSON line is
# printed with whatever was captured when it expires.
WALL_BUDGET_S = float(__import__("os").environ.get("LT_BENCH_BUDGET_S",
                                                   1200.0))


def main():
    import os
    import sys

    t_start = time.monotonic()
    deadline = t_start + WALL_BUDGET_S

    def remaining() -> float:
        return deadline - time.monotonic()

    def emit(rec):
        rec.setdefault("wall_s", round(time.monotonic() - t_start, 1))
        print(json.dumps(rec))
        sys.stdout.flush()
        # skip backend teardown: a thread abandoned mid-compile can wedge
        # atexit handlers, and the artifact is already out
        os._exit(0)

    if not _backend_alive(min(300.0, WALL_BUDGET_S / 2)):
        print("device backend unreachable (tunnel dark?) — recording an "
              "error line instead of hanging", file=sys.stderr)
        emit({
            "metric": "photon_scatter_steps_per_sec_per_chip",
            "value": 0.0,
            "unit": "steps/s/chip",
            "vs_baseline": 0.0,
            "error": "TPU backend init timed out (axon tunnel unreachable);"
                     " see PERF.md for the last measured value (10.46e9)",
        })

    best = prov = None
    partial = []  # (steps/s, shape, trials) from timed-out attempts
    # the axon tunnel fails compiles/transfers transiently (CLAUDE.md);
    # falling back to the ~15x-slower XLA engine on a flake would record a
    # misleading number, so retry the Pallas bench first — the asymptote
    # config twice, then a mid-size config (measured ~8.8e9) whose smaller
    # executable is less compile-helper-hungry
    for attempt, shape in enumerate([(32, 96, 384), (32, 96, 384),
                                     (16, 96, 96)]):
        budget = min(600.0, remaining() - 120.0)  # reserve fallback+parity
        if budget < 60.0:
            print("wall budget exhausted before pallas attempt "
                  f"{attempt + 1}", file=sys.stderr)
            break
        sink = []
        ok, res = _run_bounded(
            lambda s=shape, k=sink: bench_pallas_engine(
                tiles=s[0], k_steps=s[1], blocks=s[2], sink=k),
            budget, f"pallas attempt {attempt + 1} {shape}")
        if ok:
            best, prov = res
            break
        print(f"pallas bench attempt {attempt + 1} {shape} failed: {res}",
              file=sys.stderr)
        if sink:  # salvage completed trials from the timed-out attempt
            partial.append((max(sink), shape, [round(v) for v in sink]))
        if remaining() > 140.0:
            time.sleep(20)
    if best is None and partial:
        val, shape, trials = max(partial, key=lambda p: p[0])
        best, prov = val, {
            "engine": "pallas_bench_mode_partial",
            "tiles": shape[0], "k_steps": shape[1], "blocks": shape[2],
            "trials_steps_per_sec": trials,
            "note": "attempt hit its wall bound; best completed trial",
        }
    if best is None and remaining() > 90.0:
        print("pallas bench yielded nothing; falling back to the XLA "
              "engine", file=sys.stderr)
        ok, res = _run_bounded(bench_xla_engine,
                               min(300.0, remaining() - 30.0),
                               "xla fallback")
        if ok:
            best, prov = res, {"engine": "xla_superstep_fallback"}
        else:
            print(f"xla fallback failed: {res}", file=sys.stderr)
    if best is None:
        emit({
            "metric": "photon_scatter_steps_per_sec_per_chip",
            "value": 0.0,
            "unit": "steps/s/chip",
            "vs_baseline": 0.0,
            "error": "all bench attempts failed or timed out within the "
                     f"{WALL_BUDGET_S:.0f}s wall budget; last measured "
                     "value 10.46e9 (PERF.md)",
        })

    rec = {
        "metric": "photon_scatter_steps_per_sec_per_chip",
        "value": best,
        "unit": "steps/s/chip",
        "vs_baseline": best / BASELINE_STEPS_PER_SEC,
        **prov,
    }
    for attempt in range(2):
        budget = min(300.0, remaining() - 10.0)
        if budget < 30.0:
            rec["parity_ok"] = False
            rec["parity_error"] = "wall budget exhausted"
            break
        ok, res = _run_bounded(parity_check, budget,
                               f"parity attempt {attempt + 1}")
        if ok:
            rec.update(res)
            break
        # parity must never break the throughput record
        print(f"parity check attempt {attempt + 1} failed: {res}",
              file=sys.stderr)
        rec["parity_ok"] = False
        rec["parity_error"] = str(res)
        if remaining() > 50.0:
            time.sleep(20)
    emit(rec)


if __name__ == "__main__":
    main()
