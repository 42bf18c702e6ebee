"""Point (delta) light sources: closed-form direct lighting, shadowing,
glossy interaction, Whitted Phong parity, and scene/API plumbing.

The capability makes the reference GUI's 'Point' source option
(app.py:152-158) a first-class light type instead of the tiny-emissive-quad
emulation (models/presets.hard_shadow_scene).  A delta light admits an
EXACT closed form for the path tracer's direct term —
``f(wi) * I * cos(theta) / r^2`` — so these are golden-value tests in the
tests/test_oracle.py sense, not MC comparisons.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from light_transport_tpu.core import rng
from light_transport_tpu.core.config import RenderConfig
from light_transport_tpu.integrators.path_tracer import trace_paths
from light_transport_tpu.ops import sampling
from light_transport_tpu.scene.geometry import TriangleMesh, quad_triangles
from light_transport_tpu.scene.material import Color, Material, MaterialTable
from light_transport_tpu.scene.scene import Scene

ALBEDO = (0.6, 0.4, 0.2)
L_POS = (0.5, 3.0, -0.25)
L_INT = (11.0, 7.0, 5.0)


def _floor_scene(material=None, extra_quads=(), extra_mats=()):
    """A single big quad at y=0 (normal +y) with a point light above it."""
    mat = material or Material(color=Color.of((0, 0, 0), ALBEDO, (0, 0, 0)))
    quads = [quad_triangles([-8, 0, -8], [8, 0, -8], [8, 0, 8], [-8, 0, 8])]
    ids = [np.zeros(2, np.int32)]
    for qi, (q, mi) in enumerate(zip(extra_quads, extra_mats)):
        quads.append(q)
        ids.append(np.full(len(q), 1 + qi, np.int32))
    verts = np.concatenate(quads)
    mesh = TriangleMesh.build(
        verts, np.concatenate(ids), np.zeros(len(verts), bool))
    mats = MaterialTable.build([mat, *extra_mats])
    scene = Scene.build(mesh, mats, camera=[0.0, 5.0, 0.0])
    return scene.with_point_lights([L_POS], [L_INT])


def _down_rays(points_xz, h=4.0):
    """Vertical rays from height ``h`` down onto the floor points."""
    pts = np.asarray(points_xz, np.float64)
    o = np.stack([pts[:, 0], np.full(len(pts), h), pts[:, 1]], -1)
    d = np.tile([0.0, -1.0, 0.0], (len(pts), 1))
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def _analytic_direct(points_xz, f_rgb):
    """f * I * cos(theta) / r^2 at floor points (normal +y, no occluder)."""
    pts = np.asarray(points_xz, np.float64)
    hit = np.stack([pts[:, 0], np.zeros(len(pts)), pts[:, 1]], -1)
    to_l = np.asarray(L_POS) - hit
    r2 = (to_l ** 2).sum(-1)
    cos = to_l[:, 1] / np.sqrt(r2)  # dot(+y, wi)
    return np.asarray(f_rgb) * np.asarray(L_INT) * (cos / r2)[:, None]


def test_point_light_closed_form_diffuse():
    scene = _floor_scene()
    cfg = RenderConfig(width=4, height=4, spp=1, max_depth=1)
    pts = [(0.0, 0.0), (1.5, -2.0), (-3.0, 1.0), (4.0, 4.0)]
    o, d = _down_rays(pts)
    u = jnp.zeros((len(pts), 1, rng.NUM_U))  # depth-1: no bounce uniforms used
    radiance, _ = trace_paths(scene, cfg, o, d, u)
    want = _analytic_direct(pts, np.asarray(ALBEDO) / np.pi)
    # the shading point is lifted eps off the surface before the distance
    # is measured (shadow_o = hit + eps*n_s), a ~1e-4 shift in r
    np.testing.assert_allclose(np.asarray(radiance), want, rtol=5e-4)


# A blocker quad at y=1.5 that sits on the light path of floor point
# (2.5, 0.75) — the segment to L_POS crosses y=1.5 at (1.5, 0.25) — but
# NOT on the vertical camera ray above either test point.
_BLOCKER = quad_triangles([1.2, 1.5, -0.05], [1.8, 1.5, -0.05],
                          [1.8, 1.5, 0.55], [1.2, 1.5, 0.55])
_SHADOWED_PT = (2.5, 0.75)
_LIT_PT = (4.0, 4.0)


def test_point_light_shadowed_lane_is_black():
    """A small blocker quad between the light and one floor point."""
    b_mat = Material(color=Color.of((0, 0, 0), (0.5, 0.5, 0.5), (0, 0, 0)))
    scene = _floor_scene(extra_quads=[_BLOCKER], extra_mats=[b_mat])
    cfg = RenderConfig(width=4, height=4, spp=1, max_depth=1)
    pts = [_SHADOWED_PT, _LIT_PT]
    o, d = _down_rays(pts)
    u = jnp.zeros((len(pts), 1, rng.NUM_U))
    radiance, _ = trace_paths(scene, cfg, o, d, u)
    r = np.asarray(radiance)
    np.testing.assert_allclose(r[0], 0.0, atol=1e-7)
    want = _analytic_direct(pts, np.asarray(ALBEDO) / np.pi)
    np.testing.assert_allclose(r[1], want[1], rtol=5e-4)


def test_point_light_closed_form_glossy():
    """On a glossy floor the direct term evaluates the full modified-Phong
    f toward the light (mirror axis of the incoming vertical ray)."""
    kd, ks, shin = (0.2, 0.3, 0.1), (0.5, 0.4, 0.6), 16.0
    mat = Material(color=Color.of((0, 0, 0), kd, ks), shininess=shin,
                   is_diffuse=False, is_glossy=True)
    scene = _floor_scene(material=mat)
    cfg = RenderConfig(width=4, height=4, spp=1, max_depth=1)
    pts = [(0.0, 0.0), (2.5, 1.0)]
    o, d = _down_rays(pts)
    u = jnp.zeros((len(pts), 1, rng.NUM_U))
    radiance, _ = trace_paths(scene, cfg, o, d, u)
    # mirror of straight-down incidence about +y is straight up
    hit = np.stack([np.asarray(pts)[:, 0], np.zeros(2),
                    np.asarray(pts)[:, 1]], -1)
    to_l = np.asarray(L_POS) - hit
    wi = to_l / np.linalg.norm(to_l, axis=-1, keepdims=True)
    f = np.asarray(sampling.glossy_f(
        jnp.asarray(kd, jnp.float32)[None, :].repeat(2, 0),
        jnp.asarray(ks, jnp.float32)[None, :].repeat(2, 0),
        jnp.asarray(shin, jnp.float32),
        jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32).repeat(2, 0),
        jnp.asarray(wi, jnp.float32)))
    r2 = (to_l ** 2).sum(-1)
    cos = to_l[:, 1] / np.sqrt(r2)
    want = f * np.asarray(L_INT) * (cos / r2)[:, None]
    np.testing.assert_allclose(np.asarray(radiance), want, rtol=5e-4)


def test_zero_intensity_point_light_changes_nothing():
    """The delta term consumes NO uniforms, so a black point light leaves
    the trace bitwise identical to a point-light-free scene."""
    from light_transport_tpu.scene.cornell import cornell_box_scene

    scene, cfg = cornell_box_scene(width=8, height=8, spp=1, max_depth=3)
    n = 32
    key = jax.random.key(5)
    u = rng.path_uniforms(key, n, cfg.max_depth)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 7.9]], jnp.float32), (n, 1))
    d = jnp.asarray(np.random.default_rng(1).normal(size=(n, 3)),
                    jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    r0, _ = trace_paths(scene, cfg, o, d, u)
    s2 = scene.with_point_lights([[0.0, 0.0, 0.0]], [[0.0, 0.0, 0.0]])
    r1, _ = trace_paths(s2, cfg, o, d, u)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))


def test_whitted_point_light_shadow():
    """Whitted Phong-shades toward the point; occluded lanes keep ambient
    only (reference per-light rule, src/render_old.py:70-134)."""
    from light_transport_tpu.integrators.whitted import trace_whitted

    b_mat = Material(color=Color.of((0, 0, 0), (0.5, 0.5, 0.5), (0, 0, 0)))
    amb = (0.05, 0.02, 0.01)
    mat = Material(color=Color.of(amb, ALBEDO, (0.1, 0.1, 0.1)),
                   shininess=32.0)
    scene = _floor_scene(material=mat, extra_quads=[_BLOCKER],
                         extra_mats=[b_mat])
    pts = [_SHADOWED_PT, _LIT_PT]
    o, d = _down_rays(pts)
    img = np.asarray(trace_whitted(scene, o, d, depth=1))
    # shadowed lane: ambient term only = o_amb * light ambient (ones)
    np.testing.assert_allclose(img[0], amb, rtol=1e-5)
    # lit lane: strictly brighter than ambient, finite
    assert np.all(img[1] > np.asarray(amb))
    assert np.all(np.isfinite(img))


def test_point_light_preset_renders():
    from light_transport_tpu.api import render
    from light_transport_tpu.models.presets import point_light_scene

    scene, cfg = point_light_scene(width=16, height=16, spp=2, max_depth=3)
    img = np.asarray(render(scene, cfg, seed=0))
    assert np.all(np.isfinite(img)) and 0.0 < img.mean() < 1.0
    # the hard point-light shadow of the cone must darken some floor pixels
    # relative to the brightest floor region
    assert img.min() < img.max()


def test_with_bvh_preserves_point_lights():
    scene = _floor_scene()
    assert scene.point_lights is not None
    s2 = scene.with_bvh(treelet=False)
    assert s2.point_lights is not None
    np.testing.assert_array_equal(np.asarray(s2.point_lights.position),
                                  np.asarray(scene.point_lights.position))


def test_bdpt_refuses_point_lights():
    from light_transport_tpu.api import render

    scene = _floor_scene()
    cfg = RenderConfig(width=4, height=4, spp=1, max_depth=2)
    with pytest.raises(ValueError, match="point lights"):
        render(scene, cfg, integrator="bdpt")


def test_cv_render_with_point_lights_runs():
    """render_cv rides trace_paths, so the delta term must flow through the
    CV gradient pipeline without NaNs."""
    from light_transport_tpu.integrators.control_variates import render_cv
    from light_transport_tpu.models.presets import point_light_scene

    scene, cfg = point_light_scene(width=6, height=6, spp=2, max_depth=2)
    out = render_cv(scene, cfg, jax.random.key(0))
    img = np.asarray(out.image_cv)
    assert np.all(np.isfinite(img))
