"""Glossy BSDF + MIS showcase: the Veach tilted-plate regime.

A 45°-tilted glossy (modified-Phong, ``Material(is_glossy=True)``) plate
reflects the camera straight into an overhead area light, so every plate
pixel is a specular highlight.  At equal spp, NEE-only light sampling
almost never lands inside the cos^n lobe footprint — its rare hits are
enormous spikes that clip, leaving a near-black image — while
``emission_mode="mis"`` routes those pixels through BSDF sampling via the
power heuristic.  This is the capability the reference lacks end-to-end:
its Phong terms exist only inside the Whitted renderer (src/brdf.py:12-48)
and its path tracers carry no glossy lobe or MIS.

Artifacts: artifacts/examples/glossy_nee.png / glossy_mis.png /
glossy_truth.png and a JSON line with RMSEs (PERF.md §mis has the
measured 3.6-7.6x table from the full harness,
scripts/bench_mis_ab.py).
"""

import dataclasses
import os
import sys

import numpy as np

from _common import report, save_image, timer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import jax

from bench_mis_ab import glossy_plate_scene

from light_transport_tpu.integrators.path_tracer import render_image


def main():
    scene, cfg = glossy_plate_scene(width=96, height=96, spp=16,
                                    max_depth=3, shininess=400.0)
    # converged display truth: raw sample mean over many passes, clipped
    # once (the spp->inf limit of the renderer's clip-of-mean display)
    tr = dataclasses.replace(cfg, spp=64, emission_mode="mis")
    acc = None
    for sd in range(4):
        _, s = render_image(scene, tr, jax.random.key(100 + sd),
                            return_samples=True)
        m = np.asarray(s, np.float64).mean(axis=2)
        acc = m if acc is None else acc + m
    truth = np.clip(acc / 4, 0.0, 1.0)
    save_image(truth, "glossy_truth.png")

    out = {}
    for mode in ("nee", "mis"):
        c = dataclasses.replace(cfg, emission_mode=mode)
        with timer() as t:
            img = np.asarray(render_image(scene, c, jax.random.key(0)))
        save_image(img, f"glossy_{mode}.png")
        out[mode] = {
            "rmse_vs_truth": float(np.sqrt(((img - truth) ** 2).mean())),
            "display_mean": float(img.mean()),
            "seconds": round(t.seconds, 3),
        }
    report("glossy_mis", out["nee"]["seconds"] + out["mis"]["seconds"],
           truth_mean=float(truth.mean()),
           rmse_ratio=out["nee"]["rmse_vs_truth"]
           / max(out["mis"]["rmse_vs_truth"], 1e-30), **out)


if __name__ == "__main__":
    main()
