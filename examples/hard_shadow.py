"""Hard shadows from a tiny emitter.

Mirrors the reference's hard_shadow.ipynb: a cone on a floor lit by a very
small area light — the penumbra collapses and the shadow edge goes hard.
Compare with soft_shadow.py, which only enlarges the emitter.
"""

import numpy as np
import jax

from _common import report, save_image, timed_twice

from light_transport_tpu.api import render
from light_transport_tpu.core.config import RenderConfig
from light_transport_tpu.scene.cornell import cone_triangles
from light_transport_tpu.scene.geometry import (
    TriangleMesh,
    concat_meshes,
    quad_triangles,
)
from light_transport_tpu.scene.material import Material, MaterialTable, presets
from light_transport_tpu.scene.scene import Scene


def build_scene(light_half_size: float, emission: float):
    # scene recentered at y=0: the camera window is fixed at x,y in [-1,1]
    # at z=f_distance (src/scene.py:61-64) so the camera sits at y=0
    cone_t = cone_triangles(radius=1.5, height=3.5, center=(0.0, 0.0, 0.0),
                            direction=(0.0, 1.0, 0.0), resolution=48)
    cone = TriangleMesh.build(cone_t, np.zeros(len(cone_t), np.int32))
    floor = TriangleMesh.build(
        quad_triangles((-10, -1.75, -10), (-10, -1.75, 10), (10, -1.75, 10),
                       (10, -1.75, -10)),
        np.asarray([1, 1], np.int32),
    )
    s = light_half_size
    lq = quad_triangles((-s + 3, 7.25, -s), (s + 3, 7.25, -s),
                        (s + 3, 7.25, s), (-s + 3, 7.25, s))
    lights = TriangleMesh.build(lq, np.asarray([2, 2], np.int32),
                                np.asarray([True, True]))
    mats = MaterialTable.build([
        Material(color=presets.TURQUOISE),
        Material(color=presets.WHITE_2),
        Material(color=presets.WHITE, emission=emission),
    ])
    mesh = concat_meshes([cone, floor, lights])
    # frustum half-width at the cone plane: 12/(12-9.6) = 5 world units
    scene = Scene.build(mesh, mats, camera=[0.0, 0.0, 12.0]).with_bvh()
    cfg = RenderConfig(width=200, height=200, spp=16, max_depth=2,
                       f_distance=9.6)
    return scene, cfg


def main():
    # emission scales as 1/area so total light power stays comparable
    scene, cfg = build_scene(light_half_size=0.12, emission=5000.0)
    img, t_jit, t_steady = timed_twice(
        lambda: np.asarray(render(scene, cfg, seed=0)))
    p = save_image(img, "hard_shadow.png", gamma=2.2)
    report("hard_shadow", t_jit, steady_seconds=round(t_steady, 3), mean=float(img.mean()), image=p)


if __name__ == "__main__":
    main()
