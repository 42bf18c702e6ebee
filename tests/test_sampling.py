import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from light_transport_tpu.core import math as lm
from light_transport_tpu.ops import sampling


def uniforms(n, seed=0, k=2):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(rng.random(n).astype(np.float32)) for _ in range(k)]


def test_concentric_disk_in_unit_disk():
    u0, u1 = uniforms(4096)
    dx, dy = sampling.concentric_sample_disk(u0, u1)
    r2 = np.asarray(dx) ** 2 + np.asarray(dy) ** 2
    assert np.all(r2 <= 1.0 + 1e-5)
    # area-uniform: mean r^2 == 1/2 for a uniform disk
    np.testing.assert_allclose(r2.mean(), 0.5, atol=0.02)


def test_concentric_disk_degenerate_center():
    dx, dy = sampling.concentric_sample_disk(
        jnp.asarray([0.5]), jnp.asarray([0.5])
    )
    assert np.isfinite(float(dx[0])) and np.isfinite(float(dy[0]))


def test_cosine_hemisphere_moments():
    n_samples = 1 << 16
    u0, u1 = uniforms(n_samples, seed=1)
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n_samples, 1))
    d, pdf = sampling.cosine_weighted_hemisphere(normal, u0, u1)
    cos = np.asarray(d[:, 2])
    assert np.all(cos >= -1e-6)
    # E[cos] over cosine-weighted hemisphere = 2/3
    np.testing.assert_allclose(cos.mean(), 2.0 / 3.0, atol=0.01)
    np.testing.assert_allclose(np.asarray(pdf), cos / np.pi, atol=1e-4)


def test_cosine_hemisphere_tilted_normal():
    n_samples = 4096
    u0, u1 = uniforms(n_samples, seed=2)
    nvec = lm.normalize(jnp.asarray([[1.0, 2.0, -0.5]]))
    normal = jnp.tile(nvec, (n_samples, 1))
    d, pdf = sampling.cosine_weighted_hemisphere(normal, u0, u1)
    cos = np.asarray(lm.dot(d, normal))
    assert np.all(cos >= -1e-5)
    np.testing.assert_allclose(np.asarray(lm.norm(d)), 1.0, atol=1e-4)


def test_uniform_hemisphere():
    n_samples = 1 << 15
    u0, u1 = uniforms(n_samples, seed=3)
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n_samples, 1))
    d, pdf = sampling.uniform_hemisphere(normal, u0, u1)
    cos = np.asarray(d[:, 2])
    assert np.all(cos >= -1e-6)
    # E[cos] over uniform hemisphere = 1/2
    np.testing.assert_allclose(cos.mean(), 0.5, atol=0.01)
    np.testing.assert_allclose(np.asarray(pdf), 1 / (2 * np.pi), atol=1e-6)


def test_schlick_normal_incidence_matches_fresnel():
    r0 = sampling.schlick_r0(jnp.asarray(1.0), jnp.asarray(1.5))
    np.testing.assert_allclose(float(r0), ((1 - 1.5) / (1 + 1.5)) ** 2)
    fr = sampling.fresnel_dielectric(jnp.asarray(1.0), 1.0, 1.5)
    np.testing.assert_allclose(float(fr), float(r0), atol=1e-6)
    # Schlick at normal incidence equals R0
    np.testing.assert_allclose(
        float(sampling.schlick_reflectance(r0, jnp.asarray(1.0))), float(r0)
    )


def test_fresnel_tir():
    crit = np.arcsin(1 / 1.5)
    fr = sampling.fresnel_dielectric(
        jnp.asarray(np.cos(crit - 0.05)), 1.5, 1.0
    )
    assert float(fr) < 1.0
    fr = sampling.fresnel_dielectric(
        jnp.asarray(np.cos(crit + 0.05)), 1.5, 1.0
    )
    np.testing.assert_allclose(float(fr), 1.0)


def test_fresnel_grazing_goes_to_one():
    fr = sampling.fresnel_dielectric(jnp.asarray(0.001), 1.0, 1.5)
    assert float(fr) > 0.95


def test_hg_mean_cosine_equals_g():
    # E[cos theta] for Henyey-Greenstein is exactly g
    n_samples = 1 << 17
    for g in (0.0, 0.5, 0.9, -0.4):
        (u,) = uniforms(n_samples, seed=int(abs(g) * 100) + 7, k=1)
        cos = np.asarray(
            sampling.sample_henyey_greenstein(jnp.asarray(g, jnp.float32), u)
        )
        se = cos.std() / np.sqrt(n_samples)
        assert abs(cos.mean() - g) < 4 * se + 1e-3, (g, cos.mean())


def test_hg_sample_chi2_against_pdf():
    # bin the sampled cosines, compare counts against the analytic pdf
    n_samples = 1 << 16
    g = 0.7
    (u,) = uniforms(n_samples, seed=11, k=1)
    cos = np.asarray(
        sampling.sample_henyey_greenstein(jnp.asarray(g, jnp.float32), u)
    ).astype(np.float64)
    edges = np.linspace(-1, 1, 41)
    counts, _ = np.histogram(cos, bins=edges)
    # exact CDF of p(c) = 0.5 (1-g^2) (1+g^2-2gc)^{-3/2}:
    #   F(c) = (1-g^2)/(2g) [ (1+g^2-2gc)^{-1/2} - 1/(1+g) ]
    cdf = (1 - g**2) / (2 * g) * (
        (1 + g**2 - 2 * g * edges) ** -0.5 - 1 / (1 + g)
    )
    expected = np.diff(cdf) * n_samples
    mask = expected > 10
    chi2 = np.sum((counts[mask] - expected[mask]) ** 2 / expected[mask])
    dof = mask.sum() - 1
    # 3-sigma-ish bound on the chi2 statistic
    assert chi2 < dof + 4 * np.sqrt(2 * dof), (chi2, dof)


def test_hg_pdf_normalizes():
    # integral of hg over the sphere == 1
    cos = np.linspace(-1, 1, 20001)
    p = np.asarray(
        sampling.henyey_greenstein_pdf(jnp.asarray(cos, jnp.float64), 0.8)
    )
    integral = np.trapezoid(p * 2 * np.pi, cos)
    np.testing.assert_allclose(integral, 1.0, atol=1e-3)


def test_scatter_direction_preserves_cos():
    n_samples = 1024
    u0, u1 = uniforms(n_samples, seed=13)
    d = lm.normalize(jnp.asarray(np.random.default_rng(5).normal(size=(n_samples, 3)).astype(np.float32)))
    cos_target = 2.0 * u0 - 1.0
    new_d = sampling.scatter_direction(d, cos_target, u1)
    got = np.asarray(lm.dot(new_d, d))
    np.testing.assert_allclose(got, np.asarray(cos_target), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lm.norm(new_d)), 1.0, atol=1e-4)


def test_hg_pdf_matches_sampler_convention():
    """advisor r3: henyey_greenstein_pdf carried the reference stub's
    +2g*cos denominator — the density of the *negated* cosine — so pairing
    it with sample_henyey_greenstein/scatter_direction (forward-peaked for
    g > 0) would mis-weight any phase-function MIS/NEE by up to ~180x near
    the forward peak.  Pin pdf <-> sampler consistency directly: histogram
    the sampled cosines against expectations integrated from the pdf."""
    n_samples = 1 << 16
    for g in (0.7, -0.5):
        (u,) = uniforms(n_samples, seed=23 + int(g * 10), k=1)
        cos = np.asarray(
            sampling.sample_henyey_greenstein(jnp.asarray(g, jnp.float32), u)
        ).astype(np.float64)
        edges = np.linspace(-1, 1, 41)
        counts, _ = np.histogram(cos, bins=edges)
        # integrate the pdf over each bin (solid angle element 2*pi*dcos)
        grid = np.linspace(-1, 1, 4001)
        p = np.asarray(sampling.henyey_greenstein_pdf(
            jnp.asarray(grid, jnp.float64), g)) * 2 * np.pi
        cdf = np.concatenate([[0.0], np.cumsum(
            0.5 * (p[1:] + p[:-1]) * np.diff(grid))])
        expected = np.diff(np.interp(edges, grid, cdf)) * n_samples
        mask = expected > 10
        chi2 = np.sum((counts[mask] - expected[mask]) ** 2 / expected[mask])
        dof = mask.sum() - 1
        assert chi2 < dof + 4 * np.sqrt(2 * dof), (g, chi2, dof)
        # forward-peaked for g > 0: pdf at the peak must dwarf the tail
        fwd = float(sampling.henyey_greenstein_pdf(jnp.asarray(0.99), 0.7))
        bwd = float(sampling.henyey_greenstein_pdf(jnp.asarray(-0.99), 0.7))
        assert fwd > 50 * bwd, (fwd, bwd)


def test_hg_sampler_finite_at_g_extremes():
    """advisor r3: |g| = 1 with an extreme uniform hit 0/0 in the inverse
    CDF; the sampler now clamps g away from the delta-function endpoints."""
    for g, u in ((1.0, 0.0), (-1.0, 1.0), (1.0, 1.0), (-1.0, 0.0)):
        c = float(sampling.sample_henyey_greenstein(
            jnp.asarray(g, jnp.float32), jnp.asarray(u, jnp.float32)))
        assert np.isfinite(c) and -1.0 <= c <= 1.0, (g, u, c)
