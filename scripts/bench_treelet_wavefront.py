"""Hardware A/B of the jittable wavefront treelet traversal (the dispatch
route behind TREELET_WAVEFRONT) against the single-launch treelet kernel
and the XLA roped walk, at 4.2M-tri scale across the three PERF.md ray
regimes — the measurement VERDICT r4 item 1 calls for.

Per config this measures the REAL dispatch composition:
  - wavefront: ``intersect_bvh_treelet_wavefront`` exactly as dispatch
    calls it (no pre-sort; the per-pass cursor sort is the scheduler),
    jitted, slab passed as a jit argument (closures hang tunnel compiles
    at ~1 GB — PERF.md §mesh-scale).
  - single: dir-Morton pre-sorted single-launch kernel (the r4 default).
  - roped: the XLA stackless walk (contract: src/bvh_new.py:413-482).

Bit-parity (t AND tri) is asserted between all three per regime.

Usage: python scripts/bench_treelet_wavefront.py [--nt 1450]
  [--configs 4:12,2:12,8:8,4:24] [--regimes bounce,shell,camera]
  [--skip-roped] [--json artifacts/treelet_wavefront.json]
"""

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

from light_transport_tpu.core.cache import enable_compile_cache

enable_compile_cache()

from light_transport_tpu.accel import bvh as bvh_mod
from light_transport_tpu.ops.pallas.treelet_kernel import (
    build_treelet_tables,
    intersect_bvh_treelet,
    intersect_bvh_treelet_wavefront,
)
from light_transport_tpu.ops.raysort import ray_sort_key, scene_bounds
from light_transport_tpu.scene.geometry import (
    TriangleMesh,
    uv_sphere_triangles,
)

from bench_treelet_queued import make_rays, retry_compile  # noqa: E402


def force(h):
    x = h.t if hasattr(h, "t") else h
    return float(jnp.sum(x.astype(jnp.float32)[:8]))


def timeit(fn, o, d, reps=3):
    retry_compile(lambda: force(fn(o, d)))
    best = 1e9
    h = None
    for _ in range(reps):
        t0 = time.perf_counter()
        h = fn(o, d)
        force(h)
        best = min(best, time.perf_counter() - t0)
    return best, h


def parity(a, b):
    return (np.array_equal(np.asarray(a.t), np.asarray(b.t))
            and np.array_equal(np.asarray(a.tri), np.asarray(b.tri)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, default=1450)
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--T", default="512",
                    help="csv of treelet sizes — all measured in ONE "
                         "process (same tunnel phase) for comparable rows")
    ap.add_argument("--configs", default="4:12,2:12,8:8,4:24",
                    help="csv of loads_per_pass:max_passes")
    ap.add_argument("--regimes", default="bounce,shell,camera")
    ap.add_argument("--skip-roped", action="store_true")
    ap.add_argument("--json", default="artifacts/treelet_wavefront.json")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU logic check (timings meaningless)")
    args = ap.parse_args()
    interp = args.interpret
    if interp:
        jax.config.update("jax_platforms", "cpu")

    jax.block_until_ready(jnp.zeros((8, 128)) + 1.0)  # backend warmup
    rng = np.random.default_rng(0)
    tris = uv_sphere_triangles(n_theta=args.nt, n_phi=args.nt)
    mesh = TriangleMesh.build(tris, np.zeros(tris.shape[0], np.int32))
    t0 = time.perf_counter()
    bvh, mesh_r = bvh_mod.build(mesh)
    print(f"tris {tris.shape[0]:,} nodes {bvh.num_nodes:,} "
          f"build {time.perf_counter() - t0:.0f}s", flush=True)
    bvh_d = jax.device_put(bvh)
    t_list = [int(x) for x in str(args.T).split(",")]
    lo, hi = scene_bounds(mesh_r)

    regimes = args.regimes.split(",")
    rays = {r: make_rays(r, args.rays, rng) for r in regimes}
    rows = []  # (driver, regime, seconds)
    ref_hits = {}

    def record(driver, regime, secs, extra="", T=None):
        rows.append({"driver": driver, "regime": regime, "s": round(secs, 3),
                     **({"T": T} if T is not None else {})})
        tag = f" T={T}" if T is not None and len(t_list) > 1 else ""
        print(f"{driver:14s} {regime:7s}: {secs:.2f} s "
              f"({args.rays / secs / 1e6:.2f} Mray/s){tag}{extra}",
              flush=True)

    # big arrays (BVH rows, mesh, treelet slab) MUST travel as jit
    # ARGUMENTS: closed-over constants are embedded in the remote-compile
    # request body and the tunnel helper rejects it (HTTP 413) — the
    # PERF.md §mesh-scale rule, re-learned here the hard way
    mesh_d = jax.device_put(mesh_r)

    if not args.skip_roped:
        roped = jax.jit(bvh_mod.intersect_bvh)
        for regime in regimes:
            o, d = rays[regime]
            secs, h = timeit(lambda o, d: roped(o, d, mesh_d, bvh_d), o, d)
            ref_hits[regime] = h
            record("roped", regime, secs)

    for T in t_list:
        tables = jax.jit(build_treelet_tables,
                         static_argnames=("T",))(bvh_d, T=T)
        jax.block_until_ready(tables.tab)

        @jax.jit
        def single_call(o, d, tab, tables=tables):
            # dispatch's single-launch convention: dir-major Morton pre-sort
            perm = jnp.argsort(ray_sort_key(o, d, lo, hi))
            inv = jnp.zeros_like(perm).at[perm].set(
                jnp.arange(perm.shape[0], dtype=perm.dtype))
            h = intersect_bvh_treelet(o[perm], d[perm],
                                      tables.replace(tab=tab),
                                      interpret=interp)
            return jax.tree.map(lambda x: x[inv], h)

        def single(o, d):
            return single_call(o, d, tables.tab)

        for regime in regimes:
            o, d = rays[regime]
            secs, h = timeit(single, o, d)
            extra = ""
            if regime in ref_hits:
                extra = (f" parity="
                         f"{'EXACT' if parity(ref_hits[regime], h) else 'MISMATCH'}")
            ref_hits[regime] = h
            record("single", regime, secs, extra, T=T)

        tab = tables.tab

        for spec in args.configs.split(","):
            L, P = (int(x) for x in spec.split(":"))

            @functools.partial(jax.jit, static_argnames=("lp", "mp"))
            def wf(o, d, tab, lp, mp, tables=tables):
                return intersect_bvh_treelet_wavefront(
                    o, d, tables.replace(tab=tab), interpret=interp,
                    loads_per_pass=lp, max_passes=mp)

            @functools.partial(jax.jit, static_argnames=("lp", "mp"))
            def wf_stats(o, d, tab, lp, mp, tables=tables):
                return intersect_bvh_treelet_wavefront(
                    o, d, tables.replace(tab=tab), interpret=interp,
                    loads_per_pass=lp, max_passes=mp, with_stats=True)

            for regime in regimes:
                o, d = rays[regime]
                secs, h = timeit(lambda o, d: wf(o, d, tab, L, P), o, d)
                _, st = retry_compile(
                    lambda: jax.block_until_ready(
                        wf_stats(o, d, tab, L, P)))
                ok = parity(ref_hits[regime], h)
                extra = (f" iters {int(st['iters']):,} loads "
                         f"{int(st['loads']):,} "
                         f"parity={'EXACT' if ok else 'MISMATCH'}")
                record(f"wave {spec}", regime, secs, extra, T=T)
                rows[-1].update(iters=int(st["iters"]),
                                loads=int(st["loads"]), parity=bool(ok))

    out = {
        "tris": int(tris.shape[0]), "nodes": int(bvh.num_nodes),
        "rays": args.rays, "T": t_list, "rows": rows,
    }
    Path(args.json).parent.mkdir(parents=True, exist_ok=True)
    Path(args.json).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
