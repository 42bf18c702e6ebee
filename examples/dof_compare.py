"""Thin-lens depth of field A/B on the Cornell parity scene.

The reference camera is a pure pinhole (render loop,
src/path_tracing.py:263-287); ``RenderConfig(aperture, focus_distance)``
adds the thin-lens model (extension, README feature list).  This driver
renders the LTS Cornell+cone scene three ways — pinhole, lens focused on
the cone, lens focused just in front of the camera — and reports
per-region MSE against the pinhole image.  With the sobol sampler the
lens point rides a dedicated pair id (ops/qmc.LENS_PAIR), so every other
random decision is IDENTICAL across the three renders: the MSEs measure
pure lens geometry, not MC noise.  Focused on the cone, the image stays
near the pinhole render; focused off-plane, the subject smears by an
order of magnitude more.

Artifacts: artifacts/examples/dof_{pinhole,focus_cone,focus_near}.png.
"""

import dataclasses

import numpy as np

from _common import report, save_image, timer

from light_transport_tpu.api import render
from light_transport_tpu.scene.cornell import cornell_box_scene


def _region_mse(img, ref):
    """MSE vs the pinhole image over the center (the cone) and the image
    border (walls off the focal plane)."""
    d2 = ((np.asarray(img, np.float32) - ref) ** 2).mean(axis=-1)
    h, w = d2.shape
    center = d2[h // 3: 2 * h // 3, w // 3: 2 * w // 3].mean()
    border = np.ones((h, w), bool)
    border[h // 4: 3 * h // 4, w // 4: 3 * w // 4] = False
    return float(center), float(d2[border].mean())


def main():
    # camera sits at z = dim + 0.5 = 8 (LTS.ipynb cell 18); the cone's
    # axis is at the box center, ~8 world units from the camera — focusing
    # there keeps the subject sharp; focusing at 2.5 defocuses everything
    scene, cfg = cornell_box_scene(width=150, height=150, spp=32,
                                   max_depth=3)
    cfg = dataclasses.replace(cfg, sampler="sobol")
    variants = {
        "pinhole": {},
        "focus_cone": {"aperture": 0.35, "focus_distance": 8.0},
        "focus_near": {"aperture": 0.35, "focus_distance": 2.5},
    }
    images, secs = {}, {}
    for name, over in variants.items():
        c = dataclasses.replace(cfg, **over)
        with timer() as t:
            images[name] = np.asarray(render(scene, c, seed=0))
        secs[name] = round(t.seconds, 3)
        save_image(images[name], f"dof_{name}.png")

    ref = np.asarray(images["pinhole"], np.float32)
    out = {}
    for name in ("focus_cone", "focus_near"):
        c_mse, b_mse = _region_mse(images[name], ref)
        out[f"{name}_center_mse"] = round(c_mse, 6)
        out[f"{name}_border_mse"] = round(b_mse, 6)
    report("dof_compare", secs["pinhole"], **out)


if __name__ == "__main__":
    main()
