"""A/B the wavefront (queued) treelet traversal against the single-launch
treelet kernel at 4.2M-tri scale, across the three PERF.md ray regimes.

The single-launch kernel is iteration-bound at 4% lockstep occupancy on
bounce rays (PERF.md §treelet); the wavefront driver re-sorts lanes by
cursor between bounded launches so tiles converge to one resident
treelet.  This measures whether the saved iterations beat the added
sort/launch overhead, and checks bit-parity per regime.

Usage: python scripts/bench_treelet_queued.py [--nt 1450] [--rays 1048576]
  [--configs single,1:8,4:8] [--regimes camera,bounce,shell]
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
    build_treelet_tables, intersect_bvh_treelet,
    intersect_bvh_treelet_queued)
from light_transport_tpu.ops.raysort import ray_sort_key, scene_bounds
from light_transport_tpu.scene.geometry import (
    TriangleMesh, uv_sphere_triangles)


def make_rays(regime, n, rng):
    if regime == "camera":
        side = int(np.sqrt(n))
        xs = np.linspace(-1.2, 1.2, side)
        gx, gy = np.meshgrid(xs, xs)
        o = np.stack([gx.ravel(), gy.ravel(),
                      np.full(side * side, -3.0)], -1)
        d = np.broadcast_to([0.0, 0.0, 1.0], (side * side, 3))
    elif regime == "bounce":
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
        d = lx[:, None] * t1_ + ly[:, None] * t2_ + lz[:, None] * pn
        o = pn * 1.001
    else:  # shell
        o = rng.normal(size=(n, 3))
        o = 2.5 * o / np.linalg.norm(o, axis=1, keepdims=True)
        d = rng.normal(size=(n, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (jnp.asarray(np.ascontiguousarray(o), jnp.float32),
            jnp.asarray(np.ascontiguousarray(d), jnp.float32))


def retry_compile(fn, tries=3):
    for attempt in range(tries):
        try:
            return fn()
        except Exception as e:
            print(f"  compile/run attempt {attempt} failed: "
                  f"{type(e).__name__}: {e}", flush=True)
            if attempt + 1 == tries:
                raise
            time.sleep(30)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, default=1450)
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--T", type=int, default=512)
    ap.add_argument("--R", type=int, default=256)
    ap.add_argument("--configs", default="single,1:8,4:8",
                    help="csv: 'single' or loads_per_pass:passes_per_sync")
    ap.add_argument("--regimes", default="bounce,shell,camera")
    args = ap.parse_args()

    jax.block_until_ready(jnp.zeros((8, 128)) + 1.0)  # backend warmup
    rng = np.random.default_rng(0)
    tris = uv_sphere_triangles(n_theta=args.nt, n_phi=args.nt)
    mesh = TriangleMesh.build(tris, np.zeros(tris.shape[0], np.int32))
    t0 = time.perf_counter()
    bvh, mesh_r = bvh_mod.build(mesh)
    print(f"tris {tris.shape[0]:,} nodes {bvh.num_nodes:,} "
          f"build {time.perf_counter()-t0:.0f}s", flush=True)
    bvh_d = jax.device_put(bvh)
    tables = jax.jit(build_treelet_tables,
                     static_argnames=("T",))(bvh_d, T=args.T)
    jax.block_until_ready(tables.tab)
    lo, hi = scene_bounds(mesh_r)

    n = args.rays
    rays = {r: make_rays(r, n, rng) for r in args.regimes.split(",")}
    ref_hits = {}

    for spec in args.configs.split(","):
        if spec == "single":
            @jax.jit
            def tree(o, d):
                # dir-major pre-sort: the dispatch path's convention
                perm = jnp.argsort(ray_sort_key(o, d, lo, hi))
                inv = jnp.zeros_like(perm).at[perm].set(
                    jnp.arange(perm.shape[0], dtype=perm.dtype))
                h = intersect_bvh_treelet(o[perm], d[perm], tables,
                                          ray_tile=args.R)
                return jax.tree.map(lambda x: x[inv], h)

            run = tree
            label = "single   "
        else:
            L, P = (int(x) for x in spec.split(":"))

            def run(o, d, L=L, P=P):
                return intersect_bvh_treelet_queued(
                    o, d, tables, ray_tile=args.R, loads_per_pass=L,
                    passes_per_sync=P)

            label = f"queued {spec:>4s}"

        for regime, (o, d) in rays.items():
            force = lambda h: float(jnp.sum(h.t[:8]))
            retry_compile(lambda: force(run(o, d)))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                h = run(o, d)
                force(h)
                best = min(best, time.perf_counter() - t0)
            extra = ""
            if spec != "single":
                _, st = intersect_bvh_treelet_queued(
                    o, d, tables, ray_tile=args.R,
                    loads_per_pass=L, passes_per_sync=P, with_stats=True)
                extra = (f" iters {int(st['iters']):,} "
                         f"loads {int(st['loads']):,} "
                         f"passes {st['passes']}")
                if regime in ref_hits:
                    ref = ref_hits[regime]
                    ok = (np.array_equal(np.asarray(ref.t),
                                         np.asarray(h.t))
                          and np.array_equal(np.asarray(ref.tri),
                                             np.asarray(h.tri)))
                    extra += f" parity={'EXACT' if ok else 'MISMATCH'}"
            else:
                ref_hits[regime] = h
            print(f"{label} {regime:7s}: {best:.2f} s "
                  f"({n/best/1e6:.2f} Mray/s){extra}", flush=True)


if __name__ == "__main__":
    main()
