"""Point (delta) light demo: the Cornell box under a true point source.

The reference GUI offers a 'Point' light source (app.py:152-158) — a
``Light(source=pos, material)`` row its integrators shade toward directly.
This framework makes that a first-class light type
(``Scene.with_point_lights``): the path tracer adds the exact delta-light
direct term ``f * I * cos / r^2 * V`` (no pdf — the light cannot be
BSDF-sampled) and Whitted Phong-shades toward the position.

The hallmark of a point source is the HARD shadow: the cone's silhouette
on the floor has a razor edge at any spp, where the area panel's is
penumbral.  Artifacts: artifacts/examples/point_light_path.png /
point_light_whitted.png / area_light_path.png (same geometry, area panel).
"""

import numpy as np

from _common import report, save_image, timer

from light_transport_tpu.api import render
from light_transport_tpu.models.presets import point_light_scene
from light_transport_tpu.scene.cornell import cornell_box_scene


def main():
    scene, cfg = point_light_scene(width=192, height=192, spp=16,
                                   max_depth=4)
    out = {}
    with timer() as t:
        img_p = np.asarray(render(scene, cfg, seed=0))
    save_image(img_p, "point_light_path.png")
    out["path"] = {"seconds": round(t.seconds, 3),
                   "mean": float(img_p.mean())}

    with timer() as t:
        img_w = np.asarray(render(scene, cfg, seed=0,
                                  integrator="whitted"))
    save_image(img_w, "point_light_whitted.png")
    out["whitted"] = {"seconds": round(t.seconds, 3),
                      "mean": float(img_w.mean())}

    # bdpt with delta-origin light subpaths: the same transport through
    # deterministic s=1 connections + isotropic light walks + t=1 splats
    with timer() as t:
        img_b = np.asarray(render(scene, cfg, seed=0, integrator="bdpt"))
    save_image(img_b, "point_light_bdpt.png")
    out["bdpt"] = {"seconds": round(t.seconds, 3),
                   "mean": float(img_b.mean())}

    # same geometry under the area panel, for the soft-vs-hard shadow A/B
    area_scene, area_cfg = cornell_box_scene(width=192, height=192, spp=16,
                                             max_depth=4)
    with timer() as t:
        img_a = np.asarray(render(area_scene, area_cfg, seed=0))
    save_image(img_a, "area_light_path.png")
    out["area_path"] = {"seconds": round(t.seconds, 3),
                        "mean": float(img_a.mean())}

    # MIXED lighting through bdpt: area panel AND the point source in one
    # render — the light walks pick their origin family per lane with a
    # power-proportional probability (integrators/bdpt._light_family)
    mixed_scene = area_scene.with_point_lights([[0.0, 3.0, 0.0]],
                                               [[40.0, 40.0, 40.0]])
    with timer() as t:
        img_m = np.asarray(render(mixed_scene, area_cfg, seed=0,
                                  integrator="bdpt"))
    save_image(img_m, "mixed_light_bdpt.png")
    out["mixed_bdpt"] = {"seconds": round(t.seconds, 3),
                         "mean": float(img_m.mean())}

    report("point_light", sum(v["seconds"] for v in out.values()), **out)


if __name__ == "__main__":
    main()
