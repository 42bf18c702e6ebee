"""Quantify treelet-kernel vs roped-walk mismatches on real TPU.

bench_treelet.py reported parity False on all regimes at 4.2M tris while
interpret mode is bit-exact — this script measures HOW different: mismatch
counts on valid/tri, |dt| distribution on agreeing hits, and whether
disagreeing rays are near-ties (two triangles at nearly equal t, i.e. FP
contraction noise) or structural (different subtrees, i.e. a logic bug).

Usage: python scripts/diag_treelet_parity.py [--nt 250] [--rays 262144] [--T 512]
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
from light_transport_tpu.scene.geometry import (
    TriangleMesh, uv_sphere_triangles)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, default=250)
    ap.add_argument("--rays", type=int, default=1 << 18)
    ap.add_argument("--T", type=int, default=512)
    args = ap.parse_args()

    jax.block_until_ready(jnp.zeros((8, 128)) + 1.0)
    rng = np.random.default_rng(0)
    tris = uv_sphere_triangles(n_theta=args.nt, n_phi=args.nt)
    print(f"tris {tris.shape[0]:,}", flush=True)
    mesh = TriangleMesh.build(tris, np.zeros(tris.shape[0], np.int32))
    bvh, mesh_r = bvh_mod.build(mesh)
    print(f"nodes {bvh.num_nodes:,}", flush=True)
    tables = jax.jit(build_treelet_tables,
                     static_argnames=("T",))(jax.device_put(bvh), T=args.T)

    n = args.rays
    # bounce-like rays from the sphere surface
    pn = rng.normal(size=(n, 3))
    pn /= np.linalg.norm(pn, axis=1, keepdims=True)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # half inward (hit-rich), half outward
    d[n // 2:] = np.where(
        (d[n // 2:] * pn[n // 2:]).sum(1, keepdims=True) > 0,
        -d[n // 2:], d[n // 2:])
    o = jnp.asarray(pn * 1.001, jnp.float32)
    d = jnp.asarray(d, jnp.float32)

    walk = jax.jit(lambda oo, dd: bvh_mod.intersect_bvh(oo, dd, mesh_r, bvh))
    tree = jax.jit(lambda oo, dd: intersect_bvh_treelet(
        oo, dd, tables, ray_tile=256))

    hw = jax.block_until_ready(walk(o, d))
    ht = jax.block_until_ready(tree(o, d))
    v_w = np.asarray(hw.valid); v_t = np.asarray(ht.valid)
    t_w = np.asarray(hw.t); t_t = np.asarray(ht.t)
    i_w = np.asarray(hw.tri); i_t = np.asarray(ht.tri)

    print(f"valid: walk {v_w.sum():,} tree {v_t.sum():,} "
          f"disagree {(v_w != v_t).sum():,}")
    both = v_w & v_t
    tri_mis = both & (i_w != i_t)
    print(f"tri mismatch on common-valid: {tri_mis.sum():,} / {both.sum():,}")
    same = both & (i_w == i_t)
    dt = np.abs(t_w[same] - t_t[same])
    rel = dt / np.maximum(np.abs(t_w[same]), 1e-30)
    print(f"same-tri hits: {same.sum():,}; |dt| max {dt.max():.3e} "
          f"p99 {np.percentile(dt, 99):.3e}; rel max {rel.max():.3e} "
          f"bit-equal {(dt == 0).mean()*100:.2f}%")
    if tri_mis.sum():
        # are mismatched picks near-ties?  compare the two t values
        sel = np.where(tri_mis)[0][:20]
        for j in sel[:10]:
            print(f"  ray {j}: walk tri {i_w[j]} t {t_w[j]:.7f} | "
                  f"tree tri {i_t[j]} t {t_t[j]:.7f} "
                  f"(dt {abs(t_w[j]-t_t[j]):.2e})")
    vd = np.where(v_w != v_t)[0]
    if vd.size:
        for j in vd[:10]:
            print(f"  valid-diff ray {j}: walk ({v_w[j]}, tri {i_w[j]}, "
                  f"t {t_w[j]:.7f}) tree ({v_t[j]}, tri {i_t[j]}, "
                  f"t {t_t[j]:.7f})")


if __name__ == "__main__":
    main()
