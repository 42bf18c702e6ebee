"""Sampling and light-transport math — batched, branchless.

Physics contracts (reference):

- concentric disk + Malley cosine-hemisphere: ``concentric_sample_disk`` /
  ``cosine_weighted_hemisphere_sampling`` (src/utils.py:114-161)
- uniform hemisphere: src/utils.py:83-111
- Schlick Fresnel: src/path_tracing.py:118-121 — with the reference's
  ``(1 - cos(theta))**5`` oddity fixed: it takes the cosine *of a dot product
  that already is cos(theta)* (SURVEY.md §7 hard-part 5); we use the standard
  ``(1 - |cos_i|)**5``.
- Henyey-Greenstein phase function: src/medium_samples.py:14-16, plus the
  analytic inverse-CDF sampler the reference never implemented.

Every function maps over arbitrary leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from light_transport_tpu.core import math as lm


def concentric_sample_disk(u0: jnp.ndarray, u1: jnp.ndarray):
    """Shirley-Chiu concentric disk warp; branchless masked form of
    src/utils.py:114-128.  Returns (dx, dy)."""
    ox = 2.0 * u0 - 1.0
    oy = 2.0 * u1 - 1.0
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    denom = jnp.where(use_x, ox, oy)
    num = jnp.where(use_x, oy, ox)
    safe = jnp.where(denom == 0.0, 1.0, denom)
    ratio = jnp.where(denom == 0.0, 0.0, num / safe)
    theta = jnp.where(
        use_x, lm.PI_OVER_4 * ratio, lm.PI_OVER_2 - lm.PI_OVER_4 * ratio
    )
    zero = (ox == 0.0) & (oy == 0.0)
    r = jnp.where(zero, 0.0, r)
    return r * jnp.cos(theta), r * jnp.sin(theta)


def cosine_weighted_hemisphere(normal: jnp.ndarray, u0, u1):
    """Cosine-weighted direction about ``normal`` via Malley's method.

    Returns ``(direction (...,3), pdf (...))`` with pdf = cos(theta)/pi.

    Deliberate deviation from src/utils.py:131-161: the reference mixes the
    *world* z-component of the incoming ray with the *local* z of the sample
    to decide hemisphere flips and pdf zeroing — a frame-confusion quirk.  We
    sample purely in the local frame of the (already shading-oriented)
    normal, which is the estimator the surrounding code intends.
    """
    dx, dy = concentric_sample_disk(u0, u1)
    # double-where sqrt guard: at the disk rim (u0 -> 1, reachable every
    # sample through the glossy branch's rescaled-u0 clip) sqrt'(0) = inf
    # and the masked-out cotangent becomes inf * 0 = NaN, poisoning the
    # shared uniform's gradient in the CV score (tests/test_control_
    # variates.py caught this).  Values are bitwise unchanged.
    z2 = jnp.maximum(0.0, 1.0 - dx * dx - dy * dy)
    pos = z2 > 0.0
    z = jnp.where(pos, jnp.sqrt(jnp.where(pos, z2, 1.0)), 0.0)
    local = jnp.stack([dx, dy, z], axis=-1)
    direction = lm.to_world(local, normal)
    pdf = z * lm.INV_PI
    return direction, pdf


def uniform_hemisphere(normal: jnp.ndarray, u0, u1):
    """Uniform hemisphere sample (contract: src/utils.py:83-111);
    pdf = 1/(2 pi)."""
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - u0 * u0))
    phi = 2.0 * jnp.pi * u1
    local = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), u0], axis=-1)
    direction = lm.to_world(local, normal)
    pdf = jnp.broadcast_to(jnp.asarray(lm.INV_2PI, direction.dtype), u0.shape)
    return direction, pdf


def sample_phong_lobe(axis: jnp.ndarray, shininess, u0, u1):
    """Direction from the normalized Phong lobe about ``axis``:
    p(w) = (n+1)/(2 pi) * cos(alpha)^n with alpha the angle to ``axis``.

    Inverse CDF: cos(alpha) = u0^(1/(n+1)), phi = 2 pi u1.  Promotes the
    reference's Whitted-only Phong specular term (src/brdf.py:36-48) into
    a sampled BSDF lobe.  May return directions below the surface horizon
    for low exponents — callers zero those (cos_theta <= 0) like the
    wrong-hemisphere rule of cosine sampling (src/utils.py:158-160)."""
    cos_a = jnp.power(jnp.clip(u0, 1e-12, 1.0), 1.0 / (shininess + 1.0))
    # double-where sqrt guard (see cosine_weighted_hemisphere): u0 = 1
    # gives cos_a = 1 exactly and sqrt'(0) = inf would NaN the cotangent
    s2 = jnp.maximum(0.0, 1.0 - cos_a * cos_a)
    pos = s2 > 0.0
    sin_a = jnp.where(pos, jnp.sqrt(jnp.where(pos, s2, 1.0)), 0.0)
    phi = 2.0 * jnp.pi * u1
    local = jnp.stack(
        [sin_a * jnp.cos(phi), sin_a * jnp.sin(phi), cos_a], axis=-1)
    return lm.to_world(local, axis)


def phong_pdf(axis: jnp.ndarray, w: jnp.ndarray, shininess):
    """Solid-angle pdf of :func:`sample_phong_lobe`:
    (n+1)/(2 pi) * max(0, dot(axis, w))^n."""
    cos_a = jnp.maximum(lm.dot(axis, w), 0.0)
    # double-where pow guard: d/dc c^n = n c^(n-1) is inf at c = 0 for
    # n < 1 (shininess 0.1 exists in the presets), and the whole back
    # hemisphere sits at c = 0 — evaluate pow at a safe point there
    pos = cos_a > 0.0
    powed = jnp.where(
        pos, jnp.power(jnp.where(pos, cos_a, 1.0), shininess), 0.0)
    return (shininess + 1.0) * lm.INV_2PI * powed


def glossy_mix(kd_rgb: jnp.ndarray, ks_rgb: jnp.ndarray):
    """Specular-lobe selection probability of the modified-Phong BSDF:
    q = lum(ks) / (lum(kd) + lum(ks)), 0 when both are black."""
    kd_l = lm.luminance(kd_rgb)
    ks_l = lm.luminance(ks_rgb)
    return ks_l / jnp.maximum(kd_l + ks_l, 1e-12)


def glossy_pdf(kd_rgb, ks_rgb, shininess, n_s, refl_dir, w):
    """Combined solid-angle pdf of the modified-Phong sampler: the
    luminance-weighted mixture of the cosine lobe about ``n_s`` and the
    Phong lobe about the mirror direction ``refl_dir``."""
    q = glossy_mix(kd_rgb, ks_rgb)
    p_diff = jnp.maximum(lm.dot(n_s, w), 0.0) * lm.INV_PI
    return (1.0 - q) * p_diff + q * phong_pdf(refl_dir, w, shininess)


def glossy_f(kd_rgb, ks_rgb, shininess, refl_dir, w):
    """Modified-Phong BRDF value (Lafortune-Willems normalization):
    f = kd/pi + ks (n+2)/(2 pi) cos(alpha)^n, alpha to the mirror
    direction.  Energy-conserving when kd + ks <= 1 per channel.
    Promotes src/brdf.py:36-48 (Whitted-only in the reference) into the
    path-transport material model."""
    cos_a = jnp.maximum(lm.dot(refl_dir, w), 0.0)
    pos = cos_a > 0.0  # double-where pow guard, see phong_pdf
    spec = (shininess + 2.0) * lm.INV_2PI \
        * jnp.where(pos, jnp.power(jnp.where(pos, cos_a, 1.0), shininess),
                    0.0)
    return kd_rgb * lm.INV_PI + ks_rgb * spec[..., None]


def schlick_r0(n1, n2):
    """R0 = ((n1-n2)/(n1+n2))^2 (src/path_tracing.py:118)."""
    r = (n1 - n2) / (n1 + n2)
    return r * r


def schlick_reflectance(r0, cos_i):
    """Schlick's approximation R = R0 + (1-R0)(1-|cos_i|)^5."""
    m = 1.0 - jnp.abs(cos_i)
    m = jnp.clip(m, 0.0, 1.0)
    return r0 + (1.0 - r0) * m**5


def henyey_greenstein_pdf(cos_theta, g):
    """HG phase function (solid-angle pdf) of the scattering cosine
    ``cos_theta = dot(new_dir, old_dir)``: forward-peaked for g > 0,
    p = (1-g^2) / (4 pi (1+g^2-2g cos)^{3/2}).

    Deviation from the cited contract (src/medium_samples.py:14-16): the
    reference's never-called stub uses ``+2g cos`` in the denominator —
    the density of the *negated* cosine — which would make a pdf
    evaluation disagree with what ``sample_henyey_greenstein`` +
    ``scatter_direction`` actually draw (backward-peaked for g > 0)."""
    denom = 1.0 + g * g - 2.0 * g * cos_theta
    denom = jnp.maximum(denom, 1e-12)
    return lm.INV_4PI * (1.0 - g * g) / (denom * jnp.sqrt(denom))


def sample_henyey_greenstein(g, u):
    """Analytic inverse-CDF sample of HG scattering cosine.

    cos(theta) = (1 + g^2 - ((1-g^2)/(1-g+2gu))^2) / (2g), with the
    isotropic limit cos = 2u - 1 taken branchlessly for |g| ~ 0.
    ``g`` is clamped away from the +/-1 endpoints, where the inverse CDF
    is 0/0 at the extreme uniforms (a delta phase function needs no
    sampling anyway).
    """
    g = jnp.clip(g, -0.999999, 0.999999)
    g_safe = jnp.where(jnp.abs(g) < 1e-3, 1.0, g)
    frac = (1.0 - g * g) / (1.0 - g + 2.0 * g * u)
    cos_aniso = (1.0 + g * g - frac * frac) / (2.0 * g_safe)
    cos_iso = 2.0 * u - 1.0
    cos_theta = jnp.where(jnp.abs(g) < 1e-3, cos_iso, cos_aniso)
    return jnp.clip(cos_theta, -1.0, 1.0)


def scatter_direction(direction, cos_theta, u_phi):
    """Rotate ``direction`` by scattering angle (cos_theta, phi=2*pi*u_phi).

    Spins the new direction in the orthonormal frame of the old one —
    the deflection step of volumetric scattering.
    """
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * jnp.pi * u_phi
    local = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
    return lm.to_world(local, direction)


def fresnel_dielectric(cos_i, n1, n2):
    """Exact unpolarized Fresnel reflectance for a dielectric interface.

    Used by the photon engine at refractive-index boundaries (the MCML
    convention); the surface path tracer uses Schlick for reference parity.
    Returns R in [0, 1]; total internal reflection gives 1.
    """
    cos_i = jnp.clip(jnp.abs(cos_i), 0.0, 1.0)
    sin_t2 = (n1 / n2) ** 2 * (1.0 - cos_i * cos_i)
    tir = sin_t2 >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t2, 0.0))
    rs = (n1 * cos_i - n2 * cos_t) / jnp.maximum(n1 * cos_i + n2 * cos_t, 1e-12)
    rp = (n1 * cos_t - n2 * cos_i) / jnp.maximum(n1 * cos_t + n2 * cos_i, 1e-12)
    r = 0.5 * (rs * rs + rp * rp)
    return jnp.where(tir, 1.0, jnp.clip(r, 0.0, 1.0))
