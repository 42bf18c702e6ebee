#!/usr/bin/env python3
"""A/B emission_mode='nee' vs 'mis' (VERDICT r3 item 5): per-pixel
display-clipped variance at equal spp on three Cornell variants —
(a) stock, (b) small-bright light (5x smaller per side, 25x emission:
the regime where NEE is already near-optimal and MIS must match it, not
lose), and (c) LARGE-close light (4x larger per side, 1/16 emission):
shading points near the light see the NEE estimator's cos*cos/r^2
geometry term explode while BSDF sampling covers the light cheaply — the
power heuristic downweights NEE exactly there, which is where the
variance win lives.  Runs on CPU (estimator property, not a kernel)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import dataclasses

import numpy as np


def small_light_scene(width, height, spp, max_depth, shrink=5.0):
    from light_transport_tpu.scene import cornell as C
    from light_transport_tpu.scene.geometry import (TriangleMesh,
                                                    concat_meshes,
                                                    quad_triangles)
    from light_transport_tpu.scene.material import MaterialTable
    from light_transport_tpu.scene.scene import Scene

    dim = 7.5
    mats_rows = C.cornell_materials(emission=200.0 * shrink * shrink)
    mats = MaterialTable.build(mats_rows)
    wall_verts, wall_kind = C.cornell_box_triangles(dim)
    wall_ids = np.where(wall_kind == 1, 1,
                        np.where(wall_kind == 2, 2, 0)).astype(np.int32)
    walls = TriangleMesh.build(wall_verts, wall_ids)
    s = 1.0 / shrink
    lq = quad_triangles((-s, dim - 0.01, -s), (s, dim - 0.01, -s),
                        (s, dim - 0.01, s), (-s, dim - 0.01, s))
    lights = TriangleMesh.build(lq, np.full(2, 4, np.int32),
                                np.ones(2, bool))
    mesh = concat_meshes([walls, lights])
    scene = Scene.build(mesh, mats, camera=[0.0, 0.0, dim + 0.5])
    cfg = RenderConfig(width=width, height=height, spp=spp,
                       max_depth=max_depth, f_distance=dim + 0.5 - dim / 2)
    return scene, cfg


from light_transport_tpu.core.config import RenderConfig  # noqa: E402


def glossy_floor_scene(width, height, spp, max_depth, shininess=80.0,
                       half=4.0, emission=12.0):
    """The regime MIS was built for (r5): a glossy floor under a large
    area light.  NEE's area sampling sees the Phong lobe's cos^n swing
    wildly across the light's solid angle at highlight pixels, while BSDF
    sampling follows the lobe — the power heuristic should trade them
    per-direction."""
    from light_transport_tpu.scene.geometry import (TriangleMesh,
                                                    concat_meshes,
                                                    quad_triangles)
    from light_transport_tpu.scene.material import (Color, Material,
                                                    MaterialTable)
    from light_transport_tpu.scene.scene import Scene

    dim = 7.5
    glossy = Material(color=Color.of((0, 0, 0), (0.10, 0.10, 0.10),
                                     (0.85, 0.85, 0.85)),
                      shininess=shininess, is_diffuse=False,
                      is_glossy=True)
    source = Material(color=Color.of((1, 1, 1), (1, 1, 1), (1, 1, 1)),
                      shininess=1, emission=emission)
    mats = MaterialTable.build([glossy, source])
    fq = quad_triangles((-dim, -2.0, -dim), (dim, -2.0, -dim),
                        (dim, -2.0, dim), (-dim, -2.0, dim))
    floor = TriangleMesh.build(fq, np.zeros(2, np.int32))
    lq = quad_triangles((-half, dim - 0.01, -half),
                        (half, dim - 0.01, -half),
                        (half, dim - 0.01, half),
                        (-half, dim - 0.01, half))
    lights = TriangleMesh.build(lq, np.full(2, 1, np.int32),
                                np.ones(2, bool))
    mesh = concat_meshes([floor, lights])
    scene = Scene.build(mesh, mats, camera=[0.0, 0.0, dim + 0.5])
    cfg = RenderConfig(width=width, height=height, spp=spp,
                       max_depth=max_depth,
                       f_distance=dim + 0.5 - dim / 2)
    return scene, cfg


def clipped_var(scene, cfg, mode, seeds):
    import jax

    from light_transport_tpu.integrators.path_tracer import render_image

    c = dataclasses.replace(cfg, emission_mode=mode)
    vs, ms = [], []
    for sd in seeds:
        _, samples = render_image(scene, c, jax.random.key(sd),
                                  return_samples=True)
        s = np.clip(np.asarray(samples, np.float64), 0, 1)
        vs.append(s.var(axis=2).mean())
        ms.append(s.mean())
    return float(np.mean(vs)), float(np.mean(ms))


def main():
    from light_transport_tpu.scene.cornell import cornell_box_scene

    seeds = [0, 1, 2]
    rows = []
    stock, cfg = cornell_box_scene(width=48, height=48, spp=16, max_depth=4)
    small, cfg2 = small_light_scene(48, 48, 16, 4)
    large, cfg3 = small_light_scene(48, 48, 16, 4, shrink=0.25)
    gl80, cfg4 = glossy_floor_scene(48, 48, 16, 3, shininess=80.0)
    gl400, cfg5 = glossy_floor_scene(48, 48, 16, 3, shininess=400.0)
    for label, sc, cf in (("stock", stock, cfg),
                          ("small-bright", small, cfg2),
                          ("large-close", large, cfg3),
                          ("glossy-n80", gl80, cfg4),
                          ("glossy-n400", gl400, cfg5)):
        v_nee, m_nee = clipped_var(sc, cf, "nee", seeds)
        v_mis, m_mis = clipped_var(sc, cf, "mis", seeds)
        rows.append((label, v_nee, v_mis, v_nee / max(v_mis, 1e-30),
                     m_nee, m_mis))
        print(f"{label}: var nee {v_nee:.3e}  mis {v_mis:.3e}  "
              f"ratio {v_nee/max(v_mis,1e-30):.2f}x   "
              f"mean nee {m_nee:.4f} mis {m_mis:.4f}", flush=True)


if __name__ == "__main__":
    main()
