"""Whitted-style ray tracing of the teapot.

Mirrors the reference's ray-tracing.ipynb: deterministic primary rays,
Phong shading against every light sample, recursive mirror reflection and
refraction (here a statically unrolled specular tree), optional
hemisphere-sampled indirect diffuse (src/render_old.py:186-194).
"""

import numpy as np
import jax

from _common import report, save_image, timed_twice

from light_transport_tpu.core.config import RenderConfig
from light_transport_tpu.integrators.whitted import render_whitted
from light_transport_tpu.scene.geometry import (
    TriangleMesh,
    concat_meshes,
    quad_triangles,
)
from light_transport_tpu.scene.material import Material, MaterialTable, presets
from light_transport_tpu.scene.objio import parse_obj, reference_obj_path
from light_transport_tpu.scene.scene import Scene


def build_scene():
    path = reference_obj_path("teapot.obj")
    if path is None:  # reference assets not mounted: use a procedural cone
        from light_transport_tpu.scene.cornell import cone_triangles

        tris = cone_triangles(radius=2.0, height=3.0, center=(0, 1.5, 0),
                              direction=(0.0, -1.0, 0.0), resolution=24)
    else:
        tris = parse_obj(path)
    tris = np.asarray(tris, np.float64)
    # center the body on the view axis: the screen window is FIXED at
    # x,y in [-1,1] at z=f_distance (src/scene.py:61-64), so the camera
    # must sit at y=0 looking through it — recenter the model instead
    mid_y = 0.5 * (tris[..., 1].min() + tris[..., 1].max())
    floor_y = tris[..., 1].min() - mid_y
    tris[..., 1] -= mid_y
    body = TriangleMesh.build(tris, np.zeros(len(tris), np.int32))

    floor = TriangleMesh.build(
        quad_triangles((-20, floor_y, -20), (-20, floor_y, 20),
                       (20, floor_y, 20), (20, floor_y, -20)),
        np.asarray([1, 1], np.int32),
    )
    lq = quad_triangles((-1.5, 9, -1.5), (1.5, 9, -1.5), (1.5, 9, 1.5),
                        (-1.5, 9, 1.5))
    lights = TriangleMesh.build(lq, np.asarray([2, 2], np.int32),
                                np.asarray([True, True]))
    # Phong materials: shininess sharpens the specular lobe (the default
    # shininess=1 lobe is nearly flat and washes the image to white)
    mats = MaterialTable.build([
        Material(color=presets.BRONZE, shininess=64, reflection=0.3),
        Material(color=presets.WHITE_2, shininess=128),
        Material(color=presets.WHITE, emission=30.0),
    ])
    mesh = concat_meshes([body, floor, lights])
    # frustum half-width at the model plane = cam_z / (cam_z - f_distance)
    scene = Scene.build(mesh, mats, camera=[0.0, 0.0, 9.0]).with_bvh()
    cfg = RenderConfig(width=192, height=192, spp=1, max_depth=2,
                       f_distance=7.0)
    return scene, cfg


def main():
    scene, cfg = build_scene()
    # static args (ray_chunk, indirect_samples) passed positionally —
    # render_whitted jits with static_argnums
    img, t_jit, t_steady = timed_twice(lambda: np.asarray(
        render_whitted(scene, cfg, jax.random.key(0), None, 4)))
    p = save_image(img, "ray_tracing_teapot.png")
    report("ray_tracing", t_jit, steady_seconds=round(t_steady, 3),
           tris=int(scene.mesh.v0.shape[0]),
           mean=float(img.mean()), image=p)


if __name__ == "__main__":
    main()
