#!/usr/bin/env python3
"""BASELINE config 2 validation: anisotropic HG sweep in a semi-infinite
medium — diffuse reflectance vs the similarity relation and vs the
isotropic analytic anchor.

For each (g, mu_a, mu_s) the similarity relation says R_d is approximately
a function of the reduced single-scattering albedo
    a' = mu_s' / (mu_a + mu_s'),   mu_s' = mu_s (1 - g),
so the sweep checks two things:
  1. the g=0 rows agree with van de Hulst's exact tabulation where we have
     anchors (a = 0.9 -> R = 0.41550);
  2. across g at fixed a', R_d collapses approximately onto one curve
     (similarity), and R_d increases monotonically with a'.

Writes artifacts/hg_sweep.json and prints a table.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from light_transport_tpu.api import simulate
from light_transport_tpu.core.config import MediumConfig, PhotonRunConfig
from light_transport_tpu.scene.medium import LayeredMedium

N_PHOTONS = 100_000


def main():
    rows = []
    t0 = time.time()
    for g in (0.0, 0.5, 0.9):
        for mu_a in (1.0, 10.0):
            for mu_s in (10.0, 90.0):
                medium = LayeredMedium.build(
                    [MediumConfig(mu_a=mu_a, mu_s=mu_s, g=g, n=1.0)]
                )
                cfg = PhotonRunConfig(n_photons=N_PHOTONS, nr=32, nz=32,
                                      dr=0.05, dz=0.05)
                res = simulate(medium, cfg, seed=hash((g, mu_a, mu_s)) % 997)
                mu_s_r = mu_s * (1 - g)
                a_red = mu_s_r / (mu_a + mu_s_r)
                rows.append({
                    "g": g, "mu_a": mu_a, "mu_s": mu_s,
                    "albedo": mu_s / (mu_a + mu_s),
                    "reduced_albedo": a_red,
                    "R_d": res.total_reflectance(),
                    "energy": res.energy_total(),
                })
                r = rows[-1]
                print(f"g={g:.1f} mu_a={mu_a:5.1f} mu_s={mu_s:5.1f}  "
                      f"a'={a_red:.3f}  R_d={r['R_d']:.4f}  "
                      f"energy={r['energy']:.4f}")

    # checks
    failures = []
    for r in rows:
        if abs(r["energy"] - 1.0) > 0.01:
            failures.append(f"energy closure: {r}")
    # anchor: g=0, albedo 0.9 -> van de Hulst 0.41550
    anchors = [r for r in rows
               if r["g"] == 0.0 and abs(r["albedo"] - 0.9) < 1e-9]
    for r in anchors:
        if abs(r["R_d"] - 0.41550) > 0.01:
            failures.append(f"van de Hulst anchor: {r}")
    # monotonicity in reduced albedo at fixed g
    for g in (0.0, 0.5, 0.9):
        sub = sorted((r for r in rows if r["g"] == g),
                     key=lambda r: r["reduced_albedo"])
        rds = [r["R_d"] for r in sub]
        if any(b < a - 0.02 for a, b in zip(rds, rds[1:])):
            failures.append(f"monotonicity at g={g}: {rds}")

    os.makedirs("artifacts", exist_ok=True)
    out = {
        "rows": rows,
        "failures": failures,
        "n_photons": N_PHOTONS,
        "seconds": time.time() - t0,
    }
    with open("artifacts/hg_sweep.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\n{len(rows)} configs in {out['seconds']:.0f}s; "
          f"{len(failures)} failures -> artifacts/hg_sweep.json")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
