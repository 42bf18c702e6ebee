"""Photon Monte Carlo in layered media (MCML-style hop-drop-spin).

The reference left this subsystem as an empty placeholder
(src/photon_tracing.py, 0 lines) plus an unused Henyey-Greenstein phase
function (src/medium_samples.py:14-16); this framework implements it in
full.  Runs the three validation media whose diffuse reflectance /
transmittance have published golden values, then a fluence map:

- van de Hulst semi-infinite slab (a=0.9, g=0):      R_d = 0.41550
- MCML finite slab (d=0.02cm, mu_a=10, mu_s=90, g=0.75):
                                      R_d = 0.09739, T_t = 0.66096
- Giovanelli mismatched boundary (n=1.5, a=0.9):     R_total = 0.26
"""

import numpy as np
import jax

from _common import report, save_image, timer

from light_transport_tpu.api import simulate
from light_transport_tpu.core.config import MediumConfig, PhotonRunConfig
from light_transport_tpu.scene.medium import LayeredMedium

N = 1_000_000


def main():
    cases = [
        ("van_de_hulst", [MediumConfig(mu_a=1.0, mu_s=9.0, g=0.0, n=1.0)],
         {"R_d": 0.41550}),
        ("mcml_slab",
         [MediumConfig(mu_a=10.0, mu_s=90.0, g=0.75, n=1.0, thickness=0.02)],
         {"R_d": 0.09739, "T_t": 0.66096}),
        ("giovanelli", [MediumConfig(mu_a=1.0, mu_s=9.0, g=0.0, n=1.5)],
         {"R_total": 0.26}),
    ]
    for name, layers, golden in cases:
        medium = LayeredMedium.build(layers)
        with timer() as t:
            res = simulate(medium, PhotonRunConfig(n_photons=N), seed=0)
            jax.block_until_ready(res)
        r_d = float(res.total_reflectance())
        extra = {"R_d": round(r_d, 5),
                 "T_t": round(float(res.total_transmittance()), 5),
                 "R_total": round(r_d + res.specular_reflectance(), 5),
                 "golden": golden}
        report(f"photon_{name}", t.seconds, n_photons=N, **extra)

    # fluence map of a tissue-like medium (the full_scale preset, scaled
    # down so the example stays fast)
    medium = LayeredMedium.build(
        [MediumConfig(mu_a=0.5, mu_s=50.0, g=0.9, n=1.37)]
    )
    cfg = PhotonRunConfig(n_photons=N, nr=256, nz=256, dr=0.005, dz=0.005)
    with timer() as t:
        res = simulate(medium, cfg, seed=1)
        jax.block_until_ready(res)
    flu = np.asarray(res.fluence_rz(cfg))
    # guard the all-zero / constant grid (a tally regression must produce
    # a black diagnostic image, not crash the example on an empty min())
    floor = flu[flu > 0].min() if np.any(flu > 0) else 1.0
    img = np.log10(np.maximum(flu, floor)).T
    span = img.max() - img.min()
    img = (img - img.min()) / (span if span > 0 else 1.0)
    p = save_image(np.repeat(img[:, :, None], 3, axis=2), "photon_fluence.png")
    report("photon_fluence", t.seconds, n_photons=N, grid=[cfg.nr, cfg.nz],
           image=p)


if __name__ == "__main__":
    main()
