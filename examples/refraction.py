"""Refraction through a whisky glass (glass + liquid + ice, iors
1.5/1.356/1.310).

Mirrors the reference's refraction.ipynb + examples/obj/glass.py: the
procedurally designed tumbler under an area light, path-traced so the
transmissive chains (air->glass->whisky->glass->air) resolve by stochastic
Fresnel reflect-or-refract at every interface.
"""

import numpy as np

from _common import report, save_image, timed_twice

from light_transport_tpu.api import render
from light_transport_tpu.models.presets import glass_scene


def main():
    scene, cfg = glass_scene(width=160, height=160, spp=32, max_depth=6)
    img, t_jit, t_steady = timed_twice(
        lambda: np.asarray(render(scene, cfg, seed=0)))
    p = save_image(img, "refraction_glass.png", gamma=2.2)
    report("refraction", t_jit, steady_seconds=round(t_steady, 3), tris=int(scene.mesh.v0.shape[0]),
           mean=float(img.mean()), image=p)


if __name__ == "__main__":
    main()
