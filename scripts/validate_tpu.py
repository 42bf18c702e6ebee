#!/usr/bin/env python3
"""One-shot on-TPU validation of every Mosaic-only code path.

The CPU test suite cannot execute the intersect kernels (no interpret
fallback) or the hardware-PRNG photon kernel, so changes to them accumulate
untested while the axon tunnel is down.  Run this the moment the tunnel
recovers; it batches:

  1. dense-path intersect kernel: nearest-hit + any-hit parity vs the XLA
     brute force on a small mesh (covers the any_hit early-out that reads
     best_col_ref inside the pl.when predicate — advisor r3);
  2. gather-path intersect kernel: parity on a BVH-ordered mesh large
     enough to cross _GATHER_MIN_CLUSTERS (covers the scale-relative
     cluster AABB pad);
  3. photon kernel: exact launch counter at >256 tiles (covers the int32
     counter_from_sum fold) and chi2 parity vs the XLA engine;
  4. slim windowed quota path (strided tallies, in-kernel MXU folds,
     per-window respawn): exact quota + energy closure on hardware;
  5. treelet single-launch kernel: bit-parity vs the roped walk;
  6. wavefront (resume-mode) treelet driver — the dispatch default for
     incoherent big-mesh traffic: bit-parity + any-hit.

Exit code 0 = all green.  Keep it fast (~2-4 min after compile).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    print("devices:", devs, flush=True)
    if devs[0].platform not in ("tpu", "axon"):
        print("no TPU attached — nothing to validate here")
        return 1

    from light_transport_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    from light_transport_tpu.ops import intersect
    from light_transport_tpu.ops.pallas.intersect_kernel import (
        _GATHER_MIN_CLUSTERS,
        TRI_TILE,
        intersect_rays_pallas,
    )
    from light_transport_tpu.scene.cornell import sphere_triangles
    from light_transport_tpu.scene.geometry import TriangleMesh

    rng = np.random.default_rng(0)
    ok = True

    def tris_for(n_theta):
        return sphere_triangles(center=(0, 0, 0), radius=1.0,
                                n_theta=n_theta, n_phi=2 * n_theta)

    # --- 1. dense path (few clusters) -------------------------------------
    t = tris_for(10)
    mesh = TriangleMesh.build(t, np.zeros(len(t), np.int32))
    n = 4096
    o = jnp.asarray(rng.normal(0, 3, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(0, 1, (n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    brute = intersect.intersect_rays(o, d, mesh)
    fast = intersect_rays_pallas(o, d, mesh)
    same = np.asarray(brute.valid) == np.asarray(fast.valid)
    print(f"dense nearest-hit: {same.mean():.6f} valid-agree", flush=True)
    ok &= same.mean() > 0.999
    occ_b = np.asarray(intersect.occluded(o, d, mesh, 10.0))
    occ_f = np.asarray(intersect_rays_pallas(o, d, mesh, any_hit=True,
                                             max_dist=10.0))
    agree = (occ_b == occ_f).mean()
    print(f"dense any-hit (early-out path): {agree:.6f} agree", flush=True)
    ok &= agree > 0.999

    # --- 2. gather path (many clusters) ------------------------------------
    t2 = tris_for(64)  # ~16k tris -> > _GATHER_MIN_CLUSTERS clusters
    n_clusters = ((len(t2) + TRI_TILE - 1) // TRI_TILE)
    assert n_clusters >= _GATHER_MIN_CLUSTERS, n_clusters
    mesh2 = TriangleMesh.build(t2, np.zeros(len(t2), np.int32))
    brute2 = intersect.intersect_rays(o, d, mesh2, ray_chunk=2048)
    fast2 = intersect_rays_pallas(o, d, mesh2)
    same2 = np.asarray(brute2.valid) == np.asarray(fast2.valid)
    hit2 = np.asarray(brute2.valid) & np.asarray(fast2.valid)
    dt = np.abs(np.asarray(brute2.t)[hit2] - np.asarray(fast2.t)[hit2])
    print(f"gather parity: {same2.mean():.6f} valid-agree, "
          f"max |dt| {dt.max() if hit2.any() else 0:.2e}", flush=True)
    ok &= same2.mean() > 0.999

    # --- 3. photon kernel: counters + chi2 vs XLA engine -------------------
    from light_transport_tpu.core.config import MediumConfig, PhotonRunConfig
    from light_transport_tpu.ops.pallas.photon_kernel import (
        LANES,
        ROWS,
        simulate_pallas,
    )
    from light_transport_tpu.scene.medium import LayeredMedium
    from light_transport_tpu.tally.tallies import counter_value
    from light_transport_tpu.transport.photon import simulate_photons

    medium = LayeredMedium.build(
        [MediumConfig(mu_a=1.0, mu_s=9.0, g=0.7, n=1.37)])
    n_photons = 2_000_000
    cfg = PhotonRunConfig(n_photons=n_photons, nr=64, nz=64,
                          dr=0.01, dz=0.01)
    # the production quota loop at 32 tiles: stride-1 streams this size go
    # through the chunked _hist fold, and ~2e7 total steps push the exact
    # step counter past 2^24 (the int32 word-sum path)
    t0 = time.time()
    tallies = simulate_pallas(medium, cfg, seed=17,
                              lanes=ROWS * LANES * 32, k_steps=64)
    launched = tallies.n_launched
    steps = counter_value(tallies.steps)
    print(f"pallas launched={launched} (want {n_photons}), "
          f"steps={steps:.0f} (two-word counter "
          f"{'exercised' if steps > 2**24 else 'NOT exercised'}), "
          f"{time.time()-t0:.1f}s", flush=True)
    ok &= launched == n_photons
    ok &= steps > 2 ** 24
    r_pal = float(tallies.total_reflectance())
    xla = simulate_photons(medium, PhotonRunConfig(
        n_photons=500_000, nr=64, nz=64, dr=0.01, dz=0.01),
        jax.random.key(3), lanes=65536)
    r_xla = float(xla.total_reflectance())
    se = float(np.sqrt(r_pal * (1 - r_pal) / n_photons
                       + r_xla * (1 - r_xla) / 500_000))
    print(f"R_d pallas={r_pal:.5f} xla={r_xla:.5f} "
          f"(|diff| {abs(r_pal-r_xla):.5f} vs 4se {4*se:.5f})", flush=True)
    ok &= abs(r_pal - r_xla) < 4 * se + 1e-3

    # --- 4. slim windowed path (r4): strided tallies + in-kernel MXU folds
    # + per-window respawn, at full_scale-like settings scaled down.  The
    # CPU suite runs this in interpret mode; here it must Mosaic-compile
    # and keep the quota exact and energy closed on hardware.
    import dataclasses

    cfg4 = PhotonRunConfig(n_photons=3_000_000, nr=128, nz=128,
                           dr=0.01, dz=0.01,
                           detector_nx=128, detector_extent=0.64,
                           vol_nx=32, vol_ny=32, vol_nz=32,
                           vol_dx=0.04, vol_dy=0.04, vol_dz=0.04,
                           tally_stride=8, vol_stride=16,
                           respawn_windows=1)
    t0 = time.time()
    t4 = simulate_pallas(medium, cfg4, seed=23,
                         lanes=ROWS * LANES * 16, k_steps=64)
    e4 = float(t4.energy_total())
    rz4 = float(np.asarray(t4.absorb_rz, np.float64).sum())
    vol4 = float(np.asarray(t4.absorb_xyz, np.float64).sum())
    ab4 = float(t4.absorbed)
    print(f"slim+respawn launched={t4.n_launched} (want {cfg4.n_photons}),"
          f" energy={e4:.5f}, rz/abs={rz4/ab4:.4f}, vol/abs={vol4/ab4:.4f},"
          f" {time.time()-t0:.1f}s", flush=True)
    ok &= t4.n_launched == cfg4.n_photons
    ok &= abs(e4 - 1.0) < 5e-3
    ok &= abs(rz4 / ab4 - 1.0) < 0.02
    ok &= abs(vol4 / ab4 - 1.0) < 0.05  # clipped-edge deposits excluded

    # --- 5. treelet traversal kernel: bit-parity vs the roped walk ---------
    from light_transport_tpu.accel import bvh as bvh_mod
    from light_transport_tpu.ops.pallas.treelet_kernel import (
        build_treelet_tables,
        intersect_bvh_treelet,
        occluded_bvh_treelet,
    )

    t6 = tris_for(48)  # ~9k tris, a few treelets at T=512
    mesh6 = TriangleMesh.build(t6, np.zeros(len(t6), np.int32))
    bvh6, mesh6r = bvh_mod.build(mesh6)
    tables6 = jax.jit(build_treelet_tables)(jax.device_put(bvh6))
    ref6 = bvh_mod.intersect_bvh(o, d, mesh6r, bvh6)
    got6 = intersect_bvh_treelet(o, d, tables6)
    pv = np.array_equal(np.asarray(ref6.valid), np.asarray(got6.valid))
    pi = np.array_equal(np.asarray(ref6.tri), np.asarray(got6.tri))
    pt = np.array_equal(np.asarray(ref6.t), np.asarray(got6.t))
    occ_r = bvh_mod.occluded_bvh(o, d, mesh6r, bvh6,
                                 jnp.full((n,), 3.0))
    occ_t = occluded_bvh_treelet(o, d, tables6, jnp.full((n,), 3.0))
    po = np.array_equal(np.asarray(occ_r), np.asarray(occ_t))
    print(f"treelet parity: valid {pv} tri {pi} t-bitwise {pt} "
          f"occluded {po}", flush=True)
    ok &= pv and pi and pt and po

    # --- 6. wavefront (resume-mode) treelet driver: the dispatch default
    # for incoherent big-mesh traffic (VERDICT r4 item 1) — Mosaic-compiles
    # the bounded resume kernel + unbounded finish and checks bit-parity +
    # any-hit against the roped walk
    from light_transport_tpu.ops.pallas.treelet_kernel import (
        intersect_bvh_treelet_wavefront,
    )

    got7 = intersect_bvh_treelet_wavefront(o, d, tables6,
                                           loads_per_pass=2, max_passes=4)
    wv = np.array_equal(np.asarray(ref6.valid), np.asarray(got7.valid))
    wi_ = np.array_equal(np.asarray(ref6.tri), np.asarray(got7.tri))
    wt = np.array_equal(np.asarray(ref6.t), np.asarray(got7.t))
    occ_w = intersect_bvh_treelet_wavefront(
        o, d, tables6, t_max=jnp.full((n,), 3.0), any_hit=True,
        loads_per_pass=2, max_passes=4)
    wo = np.array_equal(np.asarray(occ_r), np.asarray(occ_w))
    print(f"wavefront parity: valid {wv} tri {wi_} t-bitwise {wt} "
          f"occluded {wo}", flush=True)
    ok &= wv and wi_ and wt and wo

    print("ALL GREEN" if ok else "FAILURES — see above", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
