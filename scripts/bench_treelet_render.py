"""End-to-end render A/B of treelet dispatch on a >MXU_MAX_TRIS scene.

  A: default dispatch (coherent-hint MXU primaries + roped-BVH bounce)
  B: Scene.with_treelet() — every BVH-path query (primaries, bounce,
     shadow) rides the treelet kernel

Usage: python scripts/bench_treelet_render.py [--nt 1450] [--size 256]
       [--spp 2] [--depth 3] [--T 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, default=1450)  # ~4.2M tris
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--T", type=int, default=512)
    args = ap.parse_args()

    import jax

    from light_transport_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    import light_transport_tpu as lt
    from light_transport_tpu.scene.cornell import cornell_box_scene
    from light_transport_tpu.scene.geometry import (
        TriangleMesh,
        concat_meshes,
        uv_sphere_triangles,
    )
    from light_transport_tpu.scene.scene import Scene

    jax.block_until_ready(jax.numpy.zeros((8, 128)) + 1.0)
    base, cfg = cornell_box_scene(width=args.size, height=args.size,
                                  spp=args.spp, max_depth=args.depth,
                                  include_cone=False)
    dim = 7.5
    tris = uv_sphere_triangles(center=(0.0, -dim + 3.0, 0.0), radius=2.9,
                               n_theta=args.nt, n_phi=args.nt)
    print(f"sphere tris: {tris.shape[0]:,}", flush=True)
    sphere = TriangleMesh.build(tris, np.zeros(len(tris), np.int32))
    mesh = concat_meshes([base.mesh, sphere])
    t0 = time.perf_counter()
    # treelet=False: arm A must measure the PRE-treelet default (auto
    # would attach slabs to a >1M-tri mesh on TPU); arm B re-attaches
    scene = Scene.build(mesh, base.materials, camera=[0.0, 0.0, dim + 0.5]
                        ).with_bvh(treelet=False)
    print(f"scene+bvh build {time.perf_counter()-t0:.1f}s", flush=True)

    def steady(label, sc):
        np.asarray(lt.render(sc, cfg, seed=0))  # compile+warm
        best, img = 1e9, None
        for _ in range(2):
            t0 = time.perf_counter()
            img = np.asarray(lt.render(sc, cfg, seed=0))
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best:.2f} s steady", flush=True)
        return best, img

    t_a, img_a = steady("A (MXU primaries + BVH bounce)", scene)

    t0 = time.perf_counter()
    scene_t = scene.with_treelet(T=args.T)
    jax.block_until_ready(scene_t.treelet.tab)
    print(f"treelet tables {time.perf_counter()-t0:.1f}s "
          f"({scene_t.treelet.tab.nbytes/1e9:.2f} GB)", flush=True)
    t_b, img_b = steady("B (treelet everything)", scene_t)

    mae = float(np.abs(img_a - img_b).mean())
    print(f"speedup {t_a / t_b:.2f}x, image MAE {mae:.2e} "
          f"(means {img_a.mean():.4f} vs {img_b.mean():.4f})", flush=True)
    return 0 if mae < 5e-3 else 1


if __name__ == "__main__":
    sys.exit(main())
