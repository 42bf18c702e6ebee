"""Multi-chip tests on the virtual 8-device CPU mesh (SURVEY.md §4c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from light_transport_tpu.core.config import MediumConfig, PhotonRunConfig
from light_transport_tpu.parallel.mesh import (
    make_mesh,
    render_sharded,
    simulate_sharded,
)
from light_transport_tpu.scene.cornell import cornell_box_scene
from light_transport_tpu.scene.medium import LayeredMedium
from light_transport_tpu.tally.stats import binomial_stderr
from light_transport_tpu.transport.photon import simulate_photons


def medium():
    return LayeredMedium.build([MediumConfig(mu_a=1.0, mu_s=9.0, g=0.5, n=1.0)])


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_simulate_launches_exact_quota():
    cfg = PhotonRunConfig(n_photons=10_001, nr=16, nz=16)  # not divisible by 8
    res = simulate_sharded(medium(), cfg, jax.random.key(0),
                           lanes_per_device=512)
    assert res.n_launched == 10_001
    assert abs(res.energy_total() - 1.0) < 1e-2


def test_sharded_matches_single_device_statistically():
    n = 40_000
    cfg = PhotonRunConfig(n_photons=n, nr=16, nz=16, dr=0.05, dz=0.05)
    res8 = simulate_sharded(medium(), cfg, jax.random.key(1),
                            lanes_per_device=1024)
    res1 = simulate_photons(medium(), cfg, jax.random.key(2), lanes=8192)
    rd8, rd1 = res8.total_reflectance(), res1.total_reflectance()
    se = binomial_stderr(rd1, n) * np.sqrt(2)
    assert abs(rd8 - rd1) < 3 * se + 1e-3, (rd8, rd1, se)
    a8, a1 = res8.total_absorption(), res1.total_absorption()
    assert abs(a8 - a1) < 3 * se + 1e-3, (a8, a1)


def test_sharded_render_matches_unsharded():
    scene, cfg = cornell_box_scene(width=16, height=16, spp=8, max_depth=3)
    mesh = make_mesh()
    img_sharded = np.asarray(render_sharded(scene, cfg, jax.random.key(3),
                                            mesh=mesh))
    from light_transport_tpu.integrators.path_tracer import render_image

    img_ref = np.asarray(render_image(scene, cfg, jax.random.key(3)))
    # identical uniforms and lane layout -> same estimator; tolerance only
    # for cross-sharding float reassociation
    np.testing.assert_allclose(img_sharded, img_ref, atol=2e-5)


def test_sharded_render_honors_sampler_and_dof():
    """render_sharded shares the single-device lane preamble
    (path_tracer._camera_lanes), so cfg.sampler='sobol' and the thin-lens
    aperture must shape the sharded image exactly as the unsharded one
    (they were silently ignored before the preamble was unified)."""
    import dataclasses

    from light_transport_tpu.integrators.path_tracer import render_image

    scene, cfg = cornell_box_scene(width=12, height=12, spp=8, max_depth=2)
    cfg = dataclasses.replace(cfg, sampler="sobol", aperture=0.3,
                              focus_distance=4.0)
    mesh = make_mesh()
    img_sharded = np.asarray(render_sharded(scene, cfg, jax.random.key(3),
                                            mesh=mesh))
    img_ref = np.asarray(render_image(scene, cfg, jax.random.key(3)))
    np.testing.assert_allclose(img_sharded, img_ref, atol=2e-5)


def test_pallas_sharded_cpu_mesh_matches_xla():
    """The flagship Pallas engine's shard_map + pallas_call composition
    (parallel/mesh.simulate_pallas_sharded) executed on the 8-device CPU
    mesh via the threefry-fed interpret fallback, chi²-checked against the
    XLA sharded engine (VERDICT.md r2 item 1: this path must not remain
    TPU-only unexecuted code)."""
    from light_transport_tpu.parallel.mesh import simulate_pallas_sharded
    from light_transport_tpu.tally.stats import chi2_counts, mc_parity_3sigma

    m = LayeredMedium.build(
        [MediumConfig(mu_a=1.0, mu_s=9.0, g=0.7, n=1.37)])
    n = 40_000
    cfg = PhotonRunConfig(n_photons=n, nr=16, nz=16, dr=0.05, dz=0.05)
    mesh = make_mesh(8)
    tp = simulate_pallas_sharded(m, cfg, seed=7, mesh=mesh, k_steps=8)
    tx = simulate_sharded(m, cfg, jax.random.key(9), mesh=mesh,
                          lanes_per_device=4096)
    assert tp.n_launched == n
    assert abs(tp.energy_total() - 1.0) < 5e-3
    a = np.asarray(tp.absorb_rz, np.float64).reshape(8, 2, 8, 2).sum((1, 3))
    b = np.asarray(tx.absorb_rz, np.float64).reshape(8, 2, 8, 2).sum((1, 3))
    chi2, dof = chi2_counts(a.reshape(-1), b.reshape(-1), min_expected=50.0)
    assert chi2 / max(dof, 1) < 1.5, (chi2, dof)
    se = binomial_stderr(tx.total_reflectance(), n) * np.sqrt(2)
    assert mc_parity_3sigma(tp.total_reflectance(), tx.total_reflectance(),
                            se, abs_floor=1e-3)


@pytest.mark.slow
def test_sharded_render_different_device_counts_agree():
    scene, cfg = cornell_box_scene(width=16, height=16, spp=4, max_depth=2)
    img2 = np.asarray(
        render_sharded(scene, cfg, jax.random.key(5), mesh=make_mesh(2))
    )
    img8 = np.asarray(
        render_sharded(scene, cfg, jax.random.key(5), mesh=make_mesh(8))
    )
    np.testing.assert_allclose(img2, img8, atol=2e-5)
