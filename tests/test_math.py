import jax
import jax.numpy as jnp
import numpy as np
import pytest

from light_transport_tpu.core import math as lm


def rand_vecs(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))


def test_normalize_unit_length():
    v = rand_vecs(128)
    n = lm.normalize(v)
    np.testing.assert_allclose(np.asarray(lm.norm(n)), 1.0, atol=1e-5)


def test_normalize_zero_safe():
    z = jnp.zeros((4, 3))
    out = lm.normalize(z)
    assert np.all(np.isfinite(np.asarray(out)))


def test_cross_matches_numpy():
    a, b = rand_vecs(64, 1), rand_vecs(64, 2)
    np.testing.assert_allclose(
        np.asarray(lm.cross(a, b)), np.cross(np.asarray(a), np.asarray(b)),
        rtol=1e-5, atol=1e-5,
    )


def test_reflect_properties():
    d = lm.normalize(rand_vecs(128, 3))
    n = lm.normalize(rand_vecs(128, 4))
    r = lm.reflect(d, n)
    # angle of incidence == angle of reflection
    np.testing.assert_allclose(
        np.asarray(lm.dot(r, n)), -np.asarray(lm.dot(d, n)), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(lm.norm(r)), 1.0, atol=1e-5)


def test_refract_snell():
    # normal incidence passes straight through
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    t, tir = lm.refract(d, n, jnp.asarray([1.0 / 1.5]))
    assert not bool(tir[0])
    np.testing.assert_allclose(np.asarray(t[0]), [0, 0, -1], atol=1e-6)

    # 45 degrees air->glass: sin(t) = sin(45)/1.5
    s = np.sqrt(0.5)
    d = jnp.asarray([[s, 0.0, -s]])
    t, tir = lm.refract(d, n, jnp.asarray([1.0 / 1.5]))
    sin_t = float(t[0, 0])
    np.testing.assert_allclose(sin_t, s / 1.5, atol=1e-5)

    # beyond critical angle glass->air: TIR
    crit = np.arcsin(1 / 1.5)
    ang = crit + 0.1
    d = jnp.asarray([[np.sin(ang), 0.0, -np.cos(ang)]], dtype=jnp.float32)
    _, tir = lm.refract(d, n, jnp.asarray([1.5]))
    assert bool(tir[0])


def test_orthonormal_frame():
    n = lm.normalize(rand_vecs(256, 5))
    t, b = lm.orthonormal_frame(n)
    for v in (t, b):
        np.testing.assert_allclose(np.asarray(lm.norm(v)), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lm.dot(v, n)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lm.dot(t, b)), 0.0, atol=1e-5)
    # right-handed: t x b == n
    np.testing.assert_allclose(
        np.asarray(lm.cross(t, b)), np.asarray(n), atol=1e-4
    )


def test_to_world_preserves_norm_and_z():
    n = lm.normalize(rand_vecs(64, 6))
    local = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (64, 1))
    w = lm.to_world(local, n)
    np.testing.assert_allclose(np.asarray(w), np.asarray(n), atol=1e-5)


def test_refract_gradient_finite_at_tir():
    """sqrt'(0) at the total-internal-reflection boundary must not leak
    inf/NaN into cotangents (the masked-branch NaN trap): gradients of the
    refracted direction w.r.t. the incoming direction stay finite for
    grazing, boundary, and TIR rays (caught via grad_log_pdf_exact, r5)."""
    import jax

    from light_transport_tpu.core import math as lm

    n = jnp.asarray([[0.0, 0.0, 1.0]] * 3, jnp.float32)
    eta = jnp.asarray([1.5, 1.5, 1.5], jnp.float32)  # dense -> sparse
    # exactly-critical, just-past-critical (TIR), and steep rays
    sin_c = 1.0 / 1.5
    cos_c = float(np.sqrt(1.0 - sin_c * sin_c))
    d = jnp.asarray([
        [sin_c, 0.0, -cos_c],          # k == 0 exactly (boundary)
        [0.9, 0.0, -np.sqrt(1 - 0.81)],  # TIR
        [0.1, 0.0, -np.sqrt(1 - 0.01)],  # refracts
    ], jnp.float32)

    def f(dd):
        t, tir = lm.refract(dd, n, eta)
        return jnp.where(tir[:, None], 0.0, t).sum()

    g = jax.grad(f)(d)
    assert np.all(np.isfinite(np.asarray(g))), g
