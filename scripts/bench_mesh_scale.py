"""A/B the two mesh intersectors at multi-million-triangle scale.

Measures the Pallas MXU gather-cull path (ops/pallas/intersect_kernel)
against the roped stackless BVH walk (accel/bvh) on a ~4.2M-triangle UV
sphere under three ray regimes: coherent camera primaries, surface-origin
cosine "bounce" rays, and incoherent shell rays.  The results set
ops/dispatch.MXU_MAX_TRIS (see PERF.md §mesh-scale crossover).

Reference component being measured against: intersect_bvh
(/root/reference/LightTransportSimulator/light_transport/src/bvh_new.py:413-482).

Usage: python scripts/bench_mesh_scale.py [--nt 1450] [--rays 1048576]
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

from light_transport_tpu.scene.geometry import TriangleMesh
from light_transport_tpu.accel import bvh as bvh_mod
from light_transport_tpu.ops.pallas.intersect_kernel import (
    intersect_rays_pallas, pack_tri_weights, cluster_bounds)
from light_transport_tpu.ops.raysort import sorted_apply
from light_transport_tpu.ops.dispatch import _chunked_bvh


def big_sphere(nt, nph):
    # a smooth convex UV sphere: friendly for cluster culling, so the
    # measured crossover is an optimistic bound for the MXU path
    from light_transport_tpu.scene.geometry import uv_sphere_triangles

    return uv_sphere_triangles(n_theta=nt, n_phi=nph)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, default=1450)
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--bvh-only", action="store_true",
                    help="skip the MXU path (re-measuring traversal work)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    tris = big_sphere(args.nt, args.nt)
    print(f"tris: {tris.shape[0]:,}", flush=True)
    mesh = TriangleMesh.build(tris, np.zeros(tris.shape[0], np.int32))

    n = args.rays
    o = rng.normal(size=(n, 3))
    o = 2.5 * o / np.linalg.norm(o, axis=1, keepdims=True)
    d = rng.normal(size=(n, 3))
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    side = int(np.sqrt(n))
    xs = np.linspace(-1.2, 1.2, side)
    gx, gy = np.meshgrid(xs, xs)
    oc = np.stack([gx.ravel(), gy.ravel(), np.full(side * side, -3.0)], -1)
    oc = jnp.asarray(oc, jnp.float32)
    dc = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                          (side * side, 3))

    # --- MXU gather path (coherence-sorted, A_MAX-capped id lists) -------
    if args.bvh_only:
        tw = cb = None
    else:
        t0 = time.perf_counter()
        tw = pack_tri_weights(mesh)
        cb = cluster_bounds(mesh)
        print(f"weights pack {time.perf_counter()-t0:.1f}s "
              f"({tw.nbytes/1e9:.2f} GB, {tw.shape[2]//512} clusters)",
              flush=True)

        t0 = time.perf_counter()
        mesh_d = jax.device_put(mesh)
        tw_d = jax.device_put(tw)
        cb_d = jax.device_put(cb)
        jax.block_until_ready(tw_d)
        print(f"device_put {time.perf_counter()-t0:.1f}s", flush=True)

    @jax.jit
    def mxu(o, d, mesh, tw, cb):
        tm = jnp.full((o.shape[0],), jnp.inf, o.dtype)
        return sorted_apply(
            lambda oo, dd, tt: intersect_rays_pallas(
                oo, dd, mesh, tri_weights=tw, t_max=tt, clusters=cb),
            mesh, o, d, tm)

    def steady(fn, *a, reps=2):
        # force with a host fetch of a result-dependent scalar, NOT just
        # block_until_ready: in some tunnel phases block_until_ready
        # returns before the work runs (PERF.md's impossible-microbench
        # caution) and every row reads 0.00 s
        force = lambda h: float(jnp.sum(h.t[:8]))
        force(fn(*a))  # compile + drain the warmup execution
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            h = fn(*a)
            force(h)
            best = min(best, time.perf_counter() - t0)
        return best, h

    if not args.bvh_only:
        b, h1c = steady(lambda oo, dd: mxu(oo, dd, mesh_d, tw_d, cb_d),
                        oc, dc)
        print(f"MXU gather camera: {b:.2f} s ({n/b/1e6:.2f} Mray/s)",
              flush=True)
        b, h1 = steady(lambda oo, dd: mxu(oo, dd, mesh_d, tw_d, cb_d), o, d,
                       reps=1)
        print(f"MXU gather random: {b:.2f} s ({n/b/1e6:.2f} Mray/s)",
              flush=True)
    # bounce-like: origins on the surface, cosine-weighted outward — what
    # a render's secondary rays actually look like on an opaque mesh
    pn = rng.normal(size=(n, 3))
    pn /= np.linalg.norm(pn, axis=1, keepdims=True)
    u1, u2 = rng.random(n), rng.random(n)
    r_ = np.sqrt(u1); phi = 2 * np.pi * u2
    lx, ly = r_ * np.cos(phi), r_ * np.sin(phi)
    lz = np.sqrt(np.maximum(0.0, 1.0 - u1))
    t1_ = np.cross(pn, np.where(np.abs(pn[:, :1]) < 0.9,
                                [[1.0, 0, 0]], [[0, 1.0, 0]]))
    t1_ /= np.linalg.norm(t1_, axis=1, keepdims=True)
    t2_ = np.cross(pn, t1_)
    db = lx[:, None] * t1_ + ly[:, None] * t2_ + lz[:, None] * pn
    ob = jnp.asarray(pn * 1.001, jnp.float32)
    db = jnp.asarray(db, jnp.float32)
    if not args.bvh_only:
        b, _ = steady(lambda oo, dd: mxu(oo, dd, mesh_d, tw_d, cb_d),
                      ob, db)
        print(f"MXU gather bounce: {b:.2f} s ({n/b/1e6:.2f} Mray/s)",
              flush=True)

    # --- roped BVH walk --------------------------------------------------
    t0 = time.perf_counter()
    bvh, mesh_r = bvh_mod.build(mesh)
    print(f"bvh build {time.perf_counter()-t0:.1f}s "
          f"({bvh.num_nodes:,} nodes)", flush=True)
    mesh_rd = jax.device_put(mesh_r)

    bvh_d = jax.device_put(bvh)

    @jax.jit
    def walk(o, d, mesh, bvh):
        return _chunked_bvh(
            lambda oo, dd: bvh_mod.intersect_bvh(oo, dd, mesh, bvh), o, d)

    b, h2c = steady(lambda oo, dd: walk(oo, dd, mesh_rd, bvh_d), oc, dc)
    print(f"roped BVH camera: {b:.2f} s ({n/b/1e6:.2f} Mray/s)", flush=True)
    b, h2 = steady(lambda oo, dd: walk(oo, dd, mesh_rd, bvh_d), o, d)
    print(f"roped BVH random: {b:.2f} s ({n/b/1e6:.2f} Mray/s)", flush=True)
    b, _ = steady(lambda oo, dd: walk(oo, dd, mesh_rd, bvh_d), ob, db)
    print(f"roped BVH bounce: {b:.2f} s ({n/b/1e6:.2f} Mray/s)", flush=True)

    # --- parity ----------------------------------------------------------
    if args.bvh_only:
        # cross-check the walk against the chunked brute-force reference
        from light_transport_tpu.ops import intersect as xint
        # 32 rays: the brute force materializes several (rays, T) f32
        # temps; 128 rays measured 288 MB over the 15.75 GB HBM budget
        # next to the resident mesh+BVH
        hb = jax.jit(lambda oo, dd, mm: xint.intersect_rays(
            oo, dd, mm))(o[:32], d[:32], mesh_rd)
        h2s = jax.tree.map(lambda a: a[:32], h2)
        vb, vw = np.asarray(hb.valid), np.asarray(h2s.valid)
        tb, tw_ = np.asarray(hb.t), np.asarray(h2s.t)
        both = vb & vw
        dt = np.abs(tb[both] - tw_[both]) / np.maximum(tb[both], 1e-6)
        print(f"parity vs brute (32 rays): valid agree "
              f"{(vb == vw).mean():.6f}, t rel err max "
              f"{dt.max() if both.any() else 0.0:.2e}", flush=True)
        return
    v1, v2 = np.asarray(h1.valid), np.asarray(h2.valid)
    t1v, t2v = np.asarray(h1.t), np.asarray(h2.t)
    same_valid = (v1 == v2).mean()
    both = v1 & v2
    dt = np.abs(t1v[both] - t2v[both]) / np.maximum(t2v[both], 1e-6)
    print(f"parity: valid agree {same_valid:.6f}, "
          f"t rel err p99 {np.percentile(dt, 99):.2e} max {dt.max():.2e}",
          flush=True)


if __name__ == "__main__":
    main()
