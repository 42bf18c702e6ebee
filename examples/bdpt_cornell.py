"""Bidirectional path tracing on the Cornell box.

Mirrors the reference's BDPT.ipynb (whose integrator was left unfinished,
SURVEY.md section 0) — here the full estimator works: camera and light
subpaths, all (s, t) connection strategies with balance-heuristic MIS,
including t=1 light-tracing splats onto the film, which is what renders the
caustic under the glass cone that unidirectional PT effectively never finds.
Prints the PT-vs-BDPT mean agreement (the unbiasedness cross-check used in
tests/test_bdpt.py).
"""

import numpy as np
import jax

from _common import report, save_image, timed_twice

from light_transport_tpu.integrators.bdpt import render_bdpt
from light_transport_tpu.integrators.path_tracer import render_image
from light_transport_tpu.scene.cornell import cornell_box_scene


def main():
    scene, cfg = cornell_box_scene(width=96, height=96, spp=16, max_depth=4)

    img_pt, t_jit, t_steady = timed_twice(
        lambda: np.asarray(render_image(scene, cfg, jax.random.key(0))))
    report("path_tracer", t_jit, steady_seconds=round(t_steady, 3),
           mean=float(img_pt.mean()))

    img_bd, t_jit, t_steady = timed_twice(lambda: np.asarray(
        render_bdpt(scene, cfg, jax.random.key(1), light_tracing=True)))
    report("bdpt_light_tracing", t_jit, steady_seconds=round(t_steady, 3),
           mean=float(img_bd.mean()),
           pt_mean=float(img_pt.mean()),
           abs_mean_diff=float(abs(img_bd.mean() - img_pt.mean())))

    save_image(img_pt, "bdpt_cornell_pt.png")
    save_image(img_bd, "bdpt_cornell_bdpt.png")


if __name__ == "__main__":
    main()
