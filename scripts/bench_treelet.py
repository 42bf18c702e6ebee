"""A/B the treelet Pallas traversal against the XLA roped BVH walk at
multi-million-triangle scale (VERDICT r3 item 2: >=2x on the 4.2M-tri
bounce regime with exact per-ray parity).

Same scene/ray regimes as scripts/bench_mesh_scale.py (UV sphere; coherent
camera grid, surface cosine bounce, incoherent shell).  Timing uses the
forcing-fetch discipline (block_until_ready can return early in some
tunnel phases — PERF.md).

Usage: python scripts/bench_treelet.py [--nt 1450] [--rays 1048576]
       [--T 512] [--ray-tile 256] [--no-sort] [--regimes camera,bounce,shell]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from light_transport_tpu.core.cache import enable_compile_cache
enable_compile_cache()

from light_transport_tpu.accel import bvh as bvh_mod
from light_transport_tpu.ops.dispatch import _chunked_bvh
from light_transport_tpu.ops.pallas.treelet_kernel import (
    build_treelet_tables, intersect_bvh_treelet)
from light_transport_tpu.ops.raysort import sorted_apply
from light_transport_tpu.scene.geometry import (
    TriangleMesh, uv_sphere_triangles)


def make_rays(n, rng):
    # incoherent shell
    o = rng.normal(size=(n, 3))
    o = 2.5 * o / np.linalg.norm(o, axis=1, keepdims=True)
    d = rng.normal(size=(n, 3))
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    shell = (jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
    # coherent camera grid
    side = int(np.sqrt(n))
    xs = np.linspace(-1.2, 1.2, side)
    gx, gy = np.meshgrid(xs, xs)
    oc = np.stack([gx.ravel(), gy.ravel(), np.full(side * side, -3.0)], -1)
    cam = (jnp.asarray(oc, jnp.float32),
           jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                            (side * side, 3)))
    # surface-origin cosine bounce
    pn = rng.normal(size=(n, 3))
    pn /= np.linalg.norm(pn, axis=1, keepdims=True)
    u1, u2 = rng.random(n), rng.random(n)
    r_ = np.sqrt(u1)
    phi = 2 * np.pi * u2
    lx, ly = r_ * np.cos(phi), r_ * np.sin(phi)
    lz = np.sqrt(np.maximum(0.0, 1.0 - u1))
    t1_ = np.cross(pn, np.where(np.abs(pn[:, :1]) < 0.9,
                                [[1.0, 0, 0]], [[0, 1.0, 0]]))
    t1_ /= np.linalg.norm(t1_, axis=1, keepdims=True)
    t2_ = np.cross(pn, t1_)
    db = lx[:, None] * t1_ + ly[:, None] * t2_ + lz[:, None] * pn
    bounce = (jnp.asarray(pn * 1.001, jnp.float32),
              jnp.asarray(db, jnp.float32))
    return {"camera": cam, "bounce": bounce, "shell": shell}


def steady(fn, *a, reps=3):
    force = lambda h: float(jnp.sum(h.t[:8]))
    force(fn(*a))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        h = fn(*a)
        force(h)
        best = min(best, time.perf_counter() - t0)
    return best, h


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, default=1450)
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--T", type=int, default=512)
    ap.add_argument("--ray-tile", type=int, default=256)
    ap.add_argument("--no-sort", action="store_true")
    ap.add_argument("--skip-walk", action="store_true",
                    help="treelet rows only (walk numbers known)")
    ap.add_argument("--regimes", default="camera,bounce,shell")
    args = ap.parse_args()
    regimes = args.regimes.split(",")

    # backend warmup (exclude the 0-600 s tunnel init tax)
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.zeros((8, 128)) + 1.0)
    print(f"backend_init_s {time.perf_counter()-t0:.1f}", flush=True)

    rng = np.random.default_rng(0)
    tris = uv_sphere_triangles(n_theta=args.nt, n_phi=args.nt)
    print(f"tris: {tris.shape[0]:,}", flush=True)
    mesh = TriangleMesh.build(tris, np.zeros(tris.shape[0], np.int32))

    t0 = time.perf_counter()
    bvh, mesh_r = bvh_mod.build(mesh)
    print(f"bvh build {time.perf_counter()-t0:.1f}s "
          f"({bvh.num_nodes:,} nodes)", flush=True)
    mesh_rd = jax.device_put(mesh_r)
    bvh_d = jax.device_put(bvh)

    t0 = time.perf_counter()
    tables = jax.jit(build_treelet_tables,
                     static_argnames=("T",))(bvh_d, T=args.T)
    jax.block_until_ready(tables.tab)
    print(f"treelet tables {time.perf_counter()-t0:.1f}s "
          f"({tables.tab.nbytes/1e9:.2f} GB, {tables.n_treelets} treelets)",
          flush=True)

    @jax.jit
    def walk(o, d, mesh, bvh):
        return _chunked_bvh(
            lambda oo, dd: bvh_mod.intersect_bvh(oo, dd, mesh, bvh), o, d)

    rt = args.ray_tile

    @jax.jit
    def tree(o, d, tab):
        fn = lambda oo, dd: intersect_bvh_treelet(oo, dd, tab, ray_tile=rt)
        if args.no_sort:
            return fn(o, d)
        return sorted_apply(fn, mesh_r, o, d)

    @jax.jit
    def tree_stats(o, d, tab):
        def fn(oo, dd):
            h, st = intersect_bvh_treelet(oo, dd, tab, ray_tile=rt,
                                          with_stats=True)
            return h, st["visits"], st["loads"], st["iters"], st["leafs"]
        if args.no_sort:
            return fn(o, d)
        # stats need the sorted-frame loads; sort manually
        from light_transport_tpu.ops.raysort import ray_sort_key, scene_bounds
        lo, hi = scene_bounds(mesh_r)
        perm = jnp.argsort(ray_sort_key(o, d, lo, hi))
        h, vis, loads, iters, leafs = fn(o[perm], d[perm])
        inv = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(perm.shape[0], dtype=perm.dtype))
        return jax.tree.map(lambda x: x[inv], h), vis[inv], loads, \
            iters, leafs

    rays = make_rays(args.rays, rng)
    n = args.rays
    for name in regimes:
        o, d = rays[name]
        if not args.skip_walk:
            bw, hw = steady(lambda oo, dd: walk(oo, dd, mesh_rd, bvh_d),
                            o, d)
            print(f"roped walk {name}: {bw:.2f} s "
                  f"({o.shape[0]/bw/1e6:.2f} Mray/s)", flush=True)
        bt, ht = steady(lambda oo, dd: tree(oo, dd, tables), o, d)
        print(f"treelet    {name}: {bt:.2f} s "
              f"({o.shape[0]/bt/1e6:.2f} Mray/s)"
              + ("" if args.skip_walk else f"  [{bw/bt:.2f}x]"), flush=True)
        _, vis, loads, iters, leafs = tree_stats(o, d, tables)
        vis = np.asarray(vis)
        loads = np.asarray(loads)
        iters = np.asarray(iters)
        leafs = np.asarray(leafs)
        print(f"  visits/ray mean {vis.mean():.1f} p99 "
              f"{np.percentile(vis, 99):.0f}; loads/tile mean "
              f"{loads.mean():.1f} max {loads.max()} "
              f"(sum {loads.sum():,}); iters sum {iters.sum():,} "
              f"leaf-iters {leafs.sum():,} "
              f"(occ {vis.sum()/max(iters.sum(),1)/rt*100:.0f}%)",
              flush=True)
        if not args.skip_walk:
            ev = np.array_equal(np.asarray(hw.valid), np.asarray(ht.valid))
            et = np.array_equal(np.asarray(hw.tri), np.asarray(ht.tri))
            ett = np.array_equal(np.asarray(hw.t), np.asarray(ht.t))
            print(f"  parity: valid {ev} tri {et} t-bitwise {ett}",
                  flush=True)


if __name__ == "__main__":
    main()
