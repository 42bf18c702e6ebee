"""Low-discrepancy sampler (ops/qmc.py): sequence exactness, net
stratification under scrambling/shuffling, range contract, and the
end-to-end variance win over threefry at equal spp."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from light_transport_tpu.ops import qmc


def test_sobol2d_first_points_exact():
    # the canonical base-2 Sobol' dims 0/1 openings
    x, y = qmc.sobol2d(jnp.arange(8))
    pts = np.stack([np.asarray(x), np.asarray(y)], -1) / 2**32
    want = np.array([
        [0, 0], [4, 4], [2, 6], [6, 2], [1, 5], [5, 1], [3, 3], [7, 7],
    ]) / 8.0
    np.testing.assert_array_equal(pts, want)


@pytest.mark.parametrize("seed", [0, 1, 7, 0xDEADBEEF])
def test_scrambled_pair_is_02_net(seed):
    """Owen scrambling + index shuffling must preserve the (0,m,2)-net
    property: every base-2 elementary interval of area 2^-m holds exactly
    one of the first 2^m points, for every rectangle shape."""
    for m in [4, 6]:
        n = 1 << m
        u, v = qmc.scrambled_pair(jnp.zeros(n, jnp.int32), jnp.arange(n),
                                  pair=3, seed=np.uint32(seed))
        u, v = np.asarray(u), np.asarray(v)
        for k in range(m + 1):
            ix = (u * (1 << k)).astype(int)
            iy = (v * (1 << (m - k))).astype(int)
            cells = set((ix * (1 << (m - k)) + iy).tolist())
            assert len(cells) == n, (m, k)


def test_scrambled_pair_decorrelates_pixels_and_pairs():
    n = 1 << 10
    idx = jnp.arange(n)
    z = jnp.zeros(n, jnp.int32)
    u0, _ = qmc.scrambled_pair(z, idx, pair=1, seed=np.uint32(9))
    u1, _ = qmc.scrambled_pair(z + 1, idx, pair=1, seed=np.uint32(9))
    u2, _ = qmc.scrambled_pair(z, idx, pair=2, seed=np.uint32(9))
    c_pix = np.corrcoef(np.asarray(u0), np.asarray(u1))[0, 1]
    c_pair = np.corrcoef(np.asarray(u0), np.asarray(u2))[0, 1]
    assert abs(c_pix) < 0.1 and abs(c_pair) < 0.1
    # and each stream is itself uniform on (0,1)
    assert abs(float(u1.mean()) - 0.5) < 0.02
    assert abs(float(u2.mean()) - 0.5) < 0.02


def test_render_uniforms_shapes_and_range():
    u_aa, u = qmc.render_uniforms(np.uint32(5), height=4, width=6, spp=8,
                                  max_depth=3)
    assert u_aa.shape == (4 * 6 * 8, 2)
    assert u.shape == (4 * 6 * 8, 3, 7)
    for t in (u_aa, u):
        a = np.asarray(t)
        # strictly inside (0, 1): the CV pipeline's logit must stay finite
        assert a.min() > 0.0 and a.max() < 1.0
    # s-major lane layout: lanes of the same pixel differ across samples
    a = np.asarray(u_aa).reshape(8, 24, 2)
    assert np.unique(a[:, 0, 0]).size == 8


def test_render_uniforms_deterministic_and_seed_sensitive():
    a1 = qmc.render_uniforms(np.uint32(5), 2, 2, 4, 2)
    a2 = qmc.render_uniforms(np.uint32(5), 2, 2, 4, 2)
    b = qmc.render_uniforms(np.uint32(6), 2, 2, 4, 2)
    for x, y in zip(a1, a2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert not np.array_equal(np.asarray(a1[0]), np.asarray(b[0]))


def test_qmc_integrates_smooth_function_better():
    """MSE of a smooth 2-D integral at 64 points: the scrambled Sobol' pair
    must beat iid uniforms by a wide margin (the O(1/n) vs O(1/sqrt n)
    gap), averaged over realizations."""
    n, reps = 64, 32
    # E[u*v] = 1/4 ; E[sin(pi u) sin(pi v)] = (2/pi)^2
    f = lambda u, v: u * v
    truth = 0.25
    e_q, e_m = [], []
    for r in range(reps):
        u, v = qmc.scrambled_pair(jnp.full(n, r, jnp.int32), jnp.arange(n),
                                  pair=0, seed=np.uint32(42))
        e_q.append((float(jnp.mean(f(u, v))) - truth) ** 2)
        k = jax.random.fold_in(jax.random.key(0), r)
        um, vm = jax.random.uniform(k, (2, n))
        e_m.append((float(jnp.mean(f(um, vm))) - truth) ** 2)
    assert np.mean(e_q) < np.mean(e_m) / 10.0


def test_sobol_render_beats_uniform_on_cornell():
    """End-to-end: equal-spp Cornell renders, per-image MSE against a
    high-spp reference; the sobol sampler must cut MSE materially.
    Thresholds calibrated in scripts (see PERF.md §sampler)."""
    from light_transport_tpu.integrators.path_tracer import (
        render_image, render_progressive)
    from light_transport_tpu.scene.cornell import cornell_box_scene

    scene, cfg = cornell_box_scene(width=16, height=16, spp=16, max_depth=2)
    ref = np.asarray(render_progressive(scene, cfg, jax.random.key(999),
                                        n_passes=48))
    mse = {}
    for sampler in ["uniform", "sobol"]:
        c = dataclasses.replace(cfg, sampler=sampler)
        errs = [
            ((np.asarray(render_image(scene, c, jax.random.key(s))) - ref)
             ** 2).mean()
            for s in range(3)
        ]
        mse[sampler] = float(np.mean(errs))
    assert mse["sobol"] < 0.75 * mse["uniform"], mse


def test_progressive_sobol_continues_one_point_set():
    """With sampler="sobol", offset passes must produce exactly the
    one-shot point set: the per-sample radiances of two spp=8 passes at
    offsets 0/8 equal the spp=16 render's samples (the averaged images
    differ only by the documented per-pass clip)."""
    from light_transport_tpu.integrators.path_tracer import render_image
    from light_transport_tpu.scene.cornell import cornell_box_scene

    scene, cfg = cornell_box_scene(width=8, height=8, spp=8, max_depth=2)
    c8 = dataclasses.replace(cfg, sampler="sobol")
    c16 = dataclasses.replace(cfg, sampler="sobol", spp=16)
    key = jax.random.key(11)
    _, s0 = render_image(scene, c8, key, return_samples=True)
    _, s1 = render_image(scene, c8, key, return_samples=True,
                         sample_offset=jnp.asarray(8, jnp.int32))
    _, s16 = render_image(scene, c16, key, return_samples=True)
    both = np.concatenate([np.asarray(s0), np.asarray(s1)], axis=2)
    np.testing.assert_allclose(both, np.asarray(s16), atol=1e-6)


def test_sampler_rejects_unknown():
    from light_transport_tpu.integrators.path_tracer import render_image
    from light_transport_tpu.scene.cornell import cornell_box_scene

    scene, cfg = cornell_box_scene(width=4, height=4, spp=1, max_depth=1)
    c = dataclasses.replace(cfg, sampler="halton")
    with pytest.raises(ValueError, match="sampler"):
        render_image(scene, c, jax.random.key(0))


def test_api_rejects_sobol_for_non_path_integrators():
    # whitted/bdpt/cv draw their own threefry streams; api.render must
    # refuse rather than silently ignore the requested sampler
    from light_transport_tpu.api import render
    from light_transport_tpu.scene.cornell import cornell_box_scene

    scene, cfg = cornell_box_scene(width=4, height=4, spp=1, max_depth=1)
    c = dataclasses.replace(cfg, sampler="sobol")
    for integrator in ("whitted", "bdpt"):
        with pytest.raises(ValueError, match="path tracer only"):
            render(scene, c, integrator=integrator)
