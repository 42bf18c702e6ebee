"""Sweep treelet size T and ray tile R on the bounce regime (one BVH build).

Per-iteration cost scales with T (one-hot fetch is O(T*R) MACs + O(T*R)
VPU compare); lockstep occupancy rises with T (bigger resident range =
more lanes advance per iteration).  This measures where the product
bottoms out.  Usage: python scripts/sweep_treelet.py [--nt 1450]
[--rays 1048576] [--configs 256:256,512:256,512:128,1024:256]
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
from light_transport_tpu.ops.pallas.treelet_kernel import (
    build_treelet_tables, intersect_bvh_treelet)
from light_transport_tpu.ops.raysort import sorted_apply
from light_transport_tpu.scene.geometry import (
    TriangleMesh, uv_sphere_triangles)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, default=1450)
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--configs",
                    default="256:256,512:256,512:128,1024:256,2048:256")
    ap.add_argument("--regime", default="bounce")
    ap.add_argument("--key", default="dir",
                    help="csv of sort keys: dir (direction-major, the MXU "
                    "cull default) | origin (origin-major morton — treelet "
                    "traversal locality is subtree-driven, which follows "
                    "origin more than direction) | none")
    args = ap.parse_args()

    jax.block_until_ready(jnp.zeros((8, 128)) + 1.0)
    rng = np.random.default_rng(0)
    tris = uv_sphere_triangles(n_theta=args.nt, n_phi=args.nt)
    mesh = TriangleMesh.build(tris, np.zeros(tris.shape[0], np.int32))
    t0 = time.perf_counter()
    bvh, mesh_r = bvh_mod.build(mesh)
    print(f"tris {tris.shape[0]:,} nodes {bvh.num_nodes:,} "
          f"build {time.perf_counter()-t0:.0f}s", flush=True)
    bvh_d = jax.device_put(bvh)

    n = args.rays
    if args.regime == "bounce":
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
        o = jnp.asarray(pn * 1.001, jnp.float32)
        d = jnp.asarray(db, jnp.float32)
    else:  # shell
        oo = rng.normal(size=(n, 3))
        oo = 2.5 * oo / np.linalg.norm(oo, axis=1, keepdims=True)
        dd = rng.normal(size=(n, 3))
        dd = dd / np.linalg.norm(dd, axis=1, keepdims=True)
        o, d = jnp.asarray(oo, jnp.float32), jnp.asarray(dd, jnp.float32)

    for spec in args.configs.split(","):
        T, R = (int(x) for x in spec.split(":"))
        t0 = time.perf_counter()
        tables = jax.jit(build_treelet_tables,
                         static_argnames=("T",))(bvh_d, T=T)
        jax.block_until_ready(tables.tab)
        tb = time.perf_counter() - t0

        from light_transport_tpu.ops.raysort import (
            ray_sort_key, scene_bounds)

        def make_sort_key(mode):
            def sort_key(oo, dd, lo, hi):
                k = ray_sort_key(oo, dd, lo, hi)
                if mode == "dir":
                    return k
                # origin-major: 24-bit morton high, 6 direction bits low
                return ((k & jnp.uint32(0x00FFFFFF)) << 6) | (k >> 24)
            return sort_key

        for mode in args.key.split(","):
            sort_key = make_sort_key(mode)

            @jax.jit
            def tree(o, d):
                if mode == "none":
                    return intersect_bvh_treelet(o, d, tables, ray_tile=R)
                lo, hi = scene_bounds(mesh_r)
                perm = jnp.argsort(sort_key(o, d, lo, hi))
                inv = jnp.zeros_like(perm).at[perm].set(
                    jnp.arange(perm.shape[0], dtype=perm.dtype))
                h = intersect_bvh_treelet(o[perm], d[perm], tables,
                                          ray_tile=R)
                return jax.tree.map(lambda x: x[inv], h)

            @jax.jit
            def tree_stats(o, d):
                if mode == "none":
                    _, st = intersect_bvh_treelet(o, d, tables, ray_tile=R,
                                                  with_stats=True)
                    return st["iters"], st["loads"]
                lo, hi = scene_bounds(mesh_r)
                perm = jnp.argsort(sort_key(o, d, lo, hi))
                _, st = intersect_bvh_treelet(
                    o[perm], d[perm], tables, ray_tile=R, with_stats=True)
                return st["iters"], st["loads"]

            force = lambda h: float(jnp.sum(h.t[:8]))
            # the tunnel's remote-compile helper intermittently stalls and
            # drops the connection (broken pipe) mid-compile — retry
            for attempt in range(3):
                try:
                    force(tree(o, d))
                    break
                except Exception as e:
                    print(f"compile attempt {attempt} failed: "
                          f"{type(e).__name__}; retrying", flush=True)
                    time.sleep(20)
            else:
                raise RuntimeError("compile failed 3x")
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                h = tree(o, d)
                force(h)
                best = min(best, time.perf_counter() - t0)
            iters, loads = tree_stats(o, d)
            iters = int(np.asarray(iters).sum())
            loads = int(np.asarray(loads).sum())
            print(f"T={T:5d} R={R:3d} key={mode:6s}: {best:.2f} s "
                  f"({n/best/1e6:.2f} Mray/s)  iters {iters:,} "
                  f"({best/iters*1e9:.0f} ns/iter) loads {loads:,} "
                  f"[tables {tb:.0f}s]", flush=True)
        del tables


if __name__ == "__main__":
    main()
