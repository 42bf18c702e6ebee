"""A/B the depth-0 coherence hint on a >MXU_MAX_TRIS render.

At >1M triangles dispatch routes everything to the roped BVH; the r3
coherence hint peels bounce 0 out of the path tracer's scan and routes
those camera-grid primaries to the MXU gather-cull kernel (3.2x faster on
primaries at 4.2M tris, PERF.md §mesh-scale crossover).  This script
measures the end-to-end render delta and checks image parity:

  A: default dispatch (peel + coherent primaries on the MXU)
  B: _use_pallas_mxu forced False (everything on the BVH — the pre-hint
     behavior)

Usage: python scripts/bench_coherent_hint.py [--nt 764] [--size 256]
       [--spp 2] [--depth 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, default=764)  # ~1.16M tris
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--depth", type=int, default=3)
    args = ap.parse_args()

    import jax

    from light_transport_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    import light_transport_tpu as lt
    from light_transport_tpu.ops import dispatch
    from light_transport_tpu.scene.cornell import cornell_box_scene
    from light_transport_tpu.scene.geometry import (
        TriangleMesh,
        concat_meshes,
        uv_sphere_triangles,
    )
    from light_transport_tpu.scene.scene import Scene

    base, cfg = cornell_box_scene(width=args.size, height=args.size,
                                  spp=args.spp, max_depth=args.depth,
                                  include_cone=False)
    dim = 7.5
    tris = uv_sphere_triangles(center=(0.0, -dim + 3.0, 0.0), radius=2.9,
                               n_theta=args.nt, n_phi=args.nt)
    print(f"sphere tris: {tris.shape[0]:,} "
          f"(cap {dispatch.MXU_MAX_TRIS:,})", flush=True)
    sphere = TriangleMesh.build(tris, np.zeros(len(tris), np.int32))
    mesh = concat_meshes([base.mesh, sphere])
    t0 = time.perf_counter()
    # treelet=False: this script measures the coherent-hint MXU-vs-roped
    # routing; auto-attached slabs would reroute everything to the treelet
    scene = Scene.build(mesh, base.materials, camera=[0.0, 0.0, dim + 0.5]
                        ).with_bvh(treelet=False)
    print(f"scene+bvh build {time.perf_counter()-t0:.1f}s", flush=True)

    def steady(label):
        # force with a host fetch, not block_until_ready: in some tunnel
        # phases block_until_ready returns before the work runs and rows
        # read ~0 s (PERF.md §mesh-scale re-measure)
        np.asarray(lt.render(scene, cfg, seed=0))  # compile+warm
        best, img = 1e9, None
        for _ in range(2):
            t0 = time.perf_counter()
            img = np.asarray(lt.render(scene, cfg, seed=0))
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best:.2f} s steady", flush=True)
        return best, img

    t_hint, img_hint = steady("A (coherent-hint primaries on MXU)")

    orig = dispatch._use_pallas_mxu
    dispatch._use_pallas_mxu = lambda scene, coherent=False: False
    jax.clear_caches()
    try:
        t_bvh, img_bvh = steady("B (all BVH, pre-hint dispatch)")
    finally:
        dispatch._use_pallas_mxu = orig

    mae = float(np.abs(img_hint - img_bvh).mean())
    print(f"speedup {t_bvh / t_hint:.2f}x, image MAE {mae:.2e} "
          f"(means {img_hint.mean():.4f} vs {img_bvh.mean():.4f})",
          flush=True)
    return 0 if mae < 5e-3 else 1


if __name__ == "__main__":
    sys.exit(main())
