"""Pallas photon-engine parity tests (hardware-PRNG path).

These run only on a real TPU: they exercise the Mosaic-compiled kernel with
``pltpu.prng_random_bits``, which has no CPU lowering.  Off-TPU coverage of
the same kernel body exists via the threefry-fed interpret fallback
(tests/test_sharding.py::test_pallas_sharded_cpu_mesh_matches_xla and the
driver dryrun); the driver's TPU bench exercises the hardware path every
round, and this file can be run manually with JAX_PLATFORMS unset.
"""

import jax
import numpy as np
import pytest

from light_transport_tpu.core.config import MediumConfig, PhotonRunConfig
from light_transport_tpu.scene.medium import LayeredMedium
from light_transport_tpu.tally.stats import binomial_stderr, mc_parity_3sigma

tpu_only = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="hardware PRNG requires a real TPU",
)


@tpu_only
def test_pallas_van_de_hulst():
    from light_transport_tpu.ops.pallas.photon_kernel import (
        LANES, ROWS, simulate_pallas,
    )

    m = LayeredMedium.build([MediumConfig(mu_a=1.0, mu_s=9.0, g=0.0, n=1.0)])
    n = 200_000
    cfg = PhotonRunConfig(n_photons=n, nr=64, nz=64, dr=0.05, dz=0.05)
    tl = simulate_pallas(m, cfg, seed=3, lanes=ROWS * LANES * 4)
    assert tl.n_launched == n
    se = binomial_stderr(0.41550, n)
    assert mc_parity_3sigma(tl.total_reflectance(), 0.41550, se,
                            abs_floor=1e-3)
    assert abs(tl.energy_total() - 1.0) < 5e-3


@tpu_only
def test_pallas_matches_xla_engine():
    from light_transport_tpu.api import simulate
    from light_transport_tpu.ops.pallas.photon_kernel import (
        LANES, ROWS, simulate_pallas,
    )

    m = LayeredMedium.build(
        [MediumConfig(mu_a=10.0, mu_s=90.0, g=0.75, n=1.5, thickness=0.02)],
        n_above=1.0,
    )
    n = 100_000
    cfg = PhotonRunConfig(n_photons=n, nr=32, nz=32, dr=0.004, dz=0.001)
    t_pallas = simulate_pallas(m, cfg, seed=1, lanes=ROWS * LANES * 2)
    t_xla = simulate(m, cfg, seed=2)
    for name in ("total_reflectance", "total_transmittance",
                 "total_absorption"):
        a = getattr(t_pallas, name)()
        b = getattr(t_xla, name)()
        se = binomial_stderr(max(a, b), n) * np.sqrt(2)
        assert mc_parity_3sigma(a, b, se, abs_floor=2e-3), (name, a, b)


@tpu_only
def test_pallas_intersector_matches_brute():
    import jax.numpy as jnp
    from light_transport_tpu.ops import intersect
    from light_transport_tpu.ops.pallas.intersect_kernel import (
        intersect_rays_pallas,
    )
    from light_transport_tpu.scene.geometry import TriangleMesh

    rng = np.random.default_rng(3)
    verts = rng.normal(scale=2.0, size=(700, 3, 3))
    mesh = TriangleMesh.build(verts, np.zeros(700, np.int32))
    # camera-style rays (single origin, grazing directions) — the case that
    # exposed the bf16-matmul precision bug
    cam = np.array([0, 0, 9.0], np.float32)
    pix = rng.uniform(-1, 1, (2048, 3)).astype(np.float32)
    pix[:, 2] = 5.0
    o = jnp.asarray(np.tile(cam, (2048, 1)))
    d = jnp.asarray((pix - cam) / np.linalg.norm(pix - cam, axis=1,
                                                 keepdims=True))
    hb = intersect.intersect_rays(o, d, mesh, ray_chunk=2048)
    hp = intersect_rays_pallas(o, d, mesh)
    vb, vp = np.asarray(hb.valid), np.asarray(hp.valid)
    assert (vb != vp).sum() <= 2  # t-ties at shared edges only
    m = vb & vp
    np.testing.assert_allclose(
        np.asarray(hb.t)[m], np.asarray(hp.t)[m], rtol=1e-4
    )
    tie = np.asarray(hb.tri)[m] != np.asarray(hp.tri)[m]
    assert tie.mean() < 0.01


@tpu_only
def test_pallas_cluster_culling_matches_unculled():
    """Cluster culling is a pure skip optimisation: a mesh large enough to
    span many TRI_TILE clusters must produce exactly the same hits whether
    tiles are skipped or not (mask errors would drop silhouette hits)."""
    import jax.numpy as jnp
    from light_transport_tpu.ops.pallas import intersect_kernel as ik
    from light_transport_tpu.scene.cornell import sphere_triangles
    from light_transport_tpu.scene.geometry import TriangleMesh

    tris = sphere_triangles(center=(0, 0, 0), radius=1.5, n_theta=48,
                            n_phi=96)  # ~9k tris -> ~18 clusters
    mesh = TriangleMesh.build(tris, np.zeros(len(tris), np.int32))
    rng = np.random.default_rng(7)
    cam = np.array([0, 0, 6.0], np.float32)
    pix = rng.uniform(-2, 2, (4096, 3)).astype(np.float32)
    pix[:, 2] = 2.0
    o = jnp.asarray(np.tile(cam, (4096, 1)))
    d = jnp.asarray((pix - cam) / np.linalg.norm(pix - cam, axis=1,
                                                 keepdims=True))
    culled = ik.intersect_rays_pallas(o, d, mesh)
    # all-ones mask == no culling
    c_lo, c_hi = ik.cluster_bounds(mesh)
    open_lo = jnp.full_like(c_lo, -1e30)
    open_hi = jnp.full_like(c_hi, 1e30)
    unculled = ik.intersect_rays_pallas(o, d, mesh,
                                        clusters=(open_lo, open_hi))
    np.testing.assert_array_equal(np.asarray(culled.valid),
                                  np.asarray(unculled.valid))
    np.testing.assert_array_equal(np.asarray(culled.tri),
                                  np.asarray(unculled.tri))
    np.testing.assert_allclose(np.asarray(culled.t)[np.asarray(culled.valid)],
                               np.asarray(unculled.t)[np.asarray(unculled.valid)],
                               rtol=1e-6)
    # sanity: the mask actually culls something on this scene
    feats_o = o
    tmm = jnp.stack([jnp.full((4096,), 1e-5), jnp.full((4096,), np.inf)], -1)
    mask = ik._tile_cluster_mask(feats_o, d, tmm, c_lo, c_hi)
    assert float(np.asarray(mask).mean()) < 1.0


@tpu_only
def test_pallas_sharded_composition():
    """shard_map + pallas_call (simulate_pallas_sharded) on the attached
    mesh: exact launch count, energy closure, and van-de-Hulst golden R_d
    (VERDICT.md next-round item 4)."""
    from light_transport_tpu.parallel.mesh import simulate_pallas_sharded

    m = LayeredMedium.build([MediumConfig(mu_a=1.0, mu_s=9.0, g=0.0, n=1.0)])
    n = 200_000
    cfg = PhotonRunConfig(n_photons=n, nr=64, nz=64, dr=0.05, dz=0.05)
    tl = simulate_pallas_sharded(m, cfg, seed=5)
    assert tl.n_launched == n
    se = binomial_stderr(0.41550, n)
    assert mc_parity_3sigma(tl.total_reflectance(), 0.41550, se,
                            abs_floor=1e-3)
    assert abs(tl.energy_total() - 1.0) < 5e-3


@tpu_only
def test_pallas_gather_path_matches_brute_incoherent():
    """The scalar-prefetch gather kernel (>= _GATHER_MIN_CLUSTERS clusters,
    intersect_kernel._gather_kernel) against the XLA brute force on
    incoherent interior rays — the workload the dense-grid kernel was
    replaced for.  Covers closest-hit and any-hit."""
    import jax.numpy as jnp
    from light_transport_tpu.ops import intersect
    from light_transport_tpu.ops.pallas import intersect_kernel as ik
    from light_transport_tpu.scene.cornell import sphere_triangles
    from light_transport_tpu.scene.geometry import TriangleMesh

    tris = sphere_triangles(center=(0, 0, 0), radius=1.5, n_theta=48,
                            n_phi=96)  # ~9k tris -> 18 clusters
    mesh = TriangleMesh.build(tris, np.zeros(len(tris), np.int32))
    assert ik.pack_tri_weights(mesh).shape[2] // ik.TRI_TILE >= \
        ik._GATHER_MIN_CLUSTERS

    rng = np.random.default_rng(11)
    n = 4096
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)

    hb = intersect.intersect_rays(o, d, mesh, ray_chunk=1024)
    hp = ik.intersect_rays_pallas(o, d, mesh)
    np.testing.assert_array_equal(np.asarray(hb.valid), np.asarray(hp.valid))
    m = np.asarray(hb.valid)
    np.testing.assert_allclose(np.asarray(hb.t)[m], np.asarray(hp.t)[m],
                               rtol=1e-5, atol=1e-6)
    assert (np.asarray(hb.tri)[m] != np.asarray(hp.tri)[m]).mean() < 0.01

    ob = intersect.occluded(o, d, mesh, 2.0, ray_chunk=1024)
    op = ik.intersect_rays_pallas(o, d, mesh, any_hit=True, max_dist=2.0)
    np.testing.assert_array_equal(np.asarray(ob), np.asarray(op))


@tpu_only
def test_dispatch_active_mask_gates_dead_lanes():
    """scene_intersect/scene_occluded with an active mask: live lanes get
    exactly the ungated results, inactive lanes report no-hit/unoccluded
    (dispatch gives them an empty ray interval; ops/dispatch.py)."""
    import jax.numpy as jnp
    from light_transport_tpu.ops.dispatch import (
        scene_intersect,
        scene_occluded,
    )
    from light_transport_tpu.scene.cornell import sphere_triangles
    from light_transport_tpu.scene.geometry import TriangleMesh
    from light_transport_tpu.scene.material import (
        Material,
        MaterialTable,
        presets,
    )
    from light_transport_tpu.scene.scene import Scene

    tris = sphere_triangles(center=(0, 0, 0), radius=1.5, n_theta=48,
                            n_phi=96)
    mesh = TriangleMesh.build(tris, np.zeros(len(tris), np.int32))
    mats = MaterialTable.build([Material(color=presets.GREY)])
    scene = Scene.build(mesh, mats, camera=[0.0, 0.0, 6.0])

    rng = np.random.default_rng(13)
    n = 8192
    o = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    alive = jnp.asarray(rng.uniform(size=n) < 0.5)

    full = scene_intersect(scene, o, d)
    gated = scene_intersect(scene, o, d, active=alive)
    a = np.asarray(alive)
    np.testing.assert_array_equal(np.asarray(gated.valid)[a],
                                  np.asarray(full.valid)[a])
    np.testing.assert_array_equal(np.asarray(gated.tri)[a],
                                  np.asarray(full.tri)[a])
    assert not np.asarray(gated.valid)[~a].any()

    occ_full = scene_occluded(scene, o, d, 4.0)
    occ_gated = scene_occluded(scene, o, d, 4.0, active=alive)
    np.testing.assert_array_equal(np.asarray(occ_gated)[a],
                                  np.asarray(occ_full)[a])
    assert not np.asarray(occ_gated)[~a].any()


def test_hist_chunked_matches_scatter():
    """The chunked one-hot matmul fold equals the exact scatter-add.

    Chunking exists so unbounded event streams (stride-1 at many tiles,
    ~17M events) never materialize multi-GB one-hot factors; a small
    chunk override exercises the pad + scan fold on CPU-sized inputs.
    """
    import jax.numpy as jnp

    from light_transport_tpu.ops.pallas.photon_kernel import _hist

    rng = np.random.default_rng(7)
    n_bins = 64 * 64
    e = 10_000  # not a multiple of chunk -> exercises zero-padding
    bins = jnp.asarray(rng.integers(0, n_bins, e), jnp.int32)
    vals = jnp.asarray(rng.uniform(0.0, 1.0, e), jnp.float32)
    exact = np.zeros(n_bins, np.float32)
    np.add.at(exact, np.asarray(bins), np.asarray(vals))
    chunked = np.asarray(_hist(bins, vals, n_bins, chunk=1024))
    one_pass = np.asarray(_hist(bins, vals, n_bins))
    np.testing.assert_allclose(chunked, exact, rtol=0, atol=1e-3)
    np.testing.assert_allclose(chunked, one_pass, rtol=0, atol=1e-3)
    assert chunked.sum() == pytest.approx(float(vals.sum()), rel=1e-6)
