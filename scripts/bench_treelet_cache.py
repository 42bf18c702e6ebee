#!/usr/bin/env python3
"""Cross-process persistent-cache check for the treelet Mosaic binaries
(VERDICT r4 item 7): the default-(T, R) treelet compile costs 2-5 min per
process over the tunnel — does `enable_compile_cache` make the SECOND
process compile in seconds?

Run twice back-to-back (same args):

    python scripts/bench_treelet_cache.py --tris 12000
    python scripts/bench_treelet_cache.py --tris 12000

and compare the printed first-call seconds.  The executable key includes
every operand shape — notably the table's treelet count ``n_t`` — so a hit
requires the SAME mesh/table shapes: this measures the "user re-runs
their render script" case, not cross-scene reuse.
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=12000)
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--T", type=int, default=512)
    ap.add_argument("--no-cache", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = None
    if not args.no_cache:
        from light_transport_tpu.core.cache import enable_compile_cache

        cache_dir = enable_compile_cache()

    from light_transport_tpu.accel import bvh as bvh_mod
    from light_transport_tpu.ops.pallas.treelet_kernel import (
        build_treelet_tables,
        intersect_bvh_treelet,
        intersect_bvh_treelet_wavefront,
    )
    from light_transport_tpu.scene.geometry import TriangleMesh

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(5)
    base = rng.uniform(-4, 4, size=(args.tris, 1, 3))
    tri = base + rng.normal(scale=0.3, size=(args.tris, 3, 3))
    mesh = TriangleMesh.build(tri, np.zeros(args.tris, np.int32))
    bvh, _ = bvh_mod.build(mesh)
    tables = jax.jit(lambda b: build_treelet_tables(b, T=args.T))(
        jax.device_put(bvh))
    jax.block_until_ready(tables.tab)
    o = jnp.asarray(rng.uniform(-5, 5, size=(args.rays, 3)), jnp.float32)
    d = rng.normal(size=(args.rays, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)

    rows = {}
    for label, fn in (
        ("single", lambda: intersect_bvh_treelet(o, d, tables)),
        ("wavefront", lambda: intersect_bvh_treelet_wavefront(
            o, d, tables, loads_per_pass=2, max_passes=4)),
    ):
        t0 = time.perf_counter()
        hit = fn()
        jax.block_until_ready(hit.t)
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        hit = fn()
        jax.block_until_ready(hit.t)
        steady = time.perf_counter() - t0
        rows[label] = {"first_call_s": round(first, 2),
                       "steady_s": round(steady, 3)}
        print(json.dumps({"kernel": label, **rows[label]}), flush=True)
    print(json.dumps({"cache_dir": cache_dir, "tris": args.tris,
                      "T": args.T, **{f"{k}_first_s": v["first_call_s"]
                                      for k, v in rows.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
