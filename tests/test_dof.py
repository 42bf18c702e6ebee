"""Thin-lens depth of field (RenderConfig.aperture/focus_distance).

The reference camera is a pure pinhole (render loop,
src/path_tracing.py:263-287); the thin-lens extension must leave
aperture=0 renders bitwise unchanged (golden-image tests pin that) and
produce the physical circle-of-confusion behavior: objects on the focal
plane stay sharp, objects away from it blur by an amount growing with the
aperture."""

import dataclasses

import numpy as np
import pytest

import jax

from light_transport_tpu.core.config import RenderConfig
from light_transport_tpu.integrators.path_tracer import render_image
from light_transport_tpu.scene.geometry import TriangleMesh, quad_triangles
from light_transport_tpu.scene.material import Material, MaterialTable, presets
from light_transport_tpu.scene.scene import Scene


def _emitter_scene(half=1.2):
    """A bright square emitter at z=0 facing a camera at z=6 (screen at
    the default f_distance=5); black background."""
    lightq = quad_triangles((-half, -half, 0.0), (half, -half, 0.0),
                            (half, half, 0.0), (-half, half, 0.0))
    mats = MaterialTable.build(
        [Material(color=presets.WHITE, emission=50.0)])
    mesh = TriangleMesh.build(lightq, np.zeros(2, np.int32),
                              np.asarray([True, True]))
    return Scene.build(mesh, mats, camera=[0.0, 0.0, 6.0])


def _lit_count(img):
    return int((np.asarray(img).mean(axis=-1) > 0.05).sum())


def test_dof_focus_sharp_misfocus_blurs():
    scene = _emitter_scene()
    cfg = RenderConfig(width=48, height=48, spp=16, max_depth=1)
    base = _lit_count(render_image(scene, cfg, jax.random.key(0)))
    assert base > 20  # the emitter is visible at all

    # focused on the emitter plane (distance 6): sharp, same footprint
    focused = _lit_count(render_image(
        scene,
        dataclasses.replace(cfg, aperture=0.25, focus_distance=6.0),
        jax.random.key(0)))
    assert abs(focused - base) < 0.3 * base, (focused, base)

    # focused far in front of it: the circle of confusion spreads the
    # emitter's image; more so at a wider aperture
    blurred = _lit_count(render_image(
        scene,
        dataclasses.replace(cfg, aperture=0.25, focus_distance=2.0),
        jax.random.key(0)))
    assert blurred > 1.5 * base, (blurred, base)

    wider = _lit_count(render_image(
        scene,
        dataclasses.replace(cfg, aperture=0.5, focus_distance=2.0),
        jax.random.key(0)))
    assert wider > blurred, (wider, blurred)


def test_dof_energy_roughly_conserved():
    """Blur redistributes the emitter's image, it must not create or
    destroy energy (unclipped comparison would be exact; at emission 50
    the clipped image still sums within a loose band)."""
    scene = _emitter_scene()
    cfg = RenderConfig(width=48, height=48, spp=32, max_depth=1)
    base = float(np.asarray(
        render_image(scene, cfg, jax.random.key(1))).sum())
    blur = float(np.asarray(render_image(
        scene, dataclasses.replace(cfg, aperture=0.3, focus_distance=3.0),
        jax.random.key(1))).sum())
    assert 0.5 * base < blur < 2.0 * base, (blur, base)


def test_api_rejects_dof_for_whitted_and_bdpt():
    # whitted traces one deterministic ray per pixel; bdpt's camera
    # importance assumes a pinhole — api.render must refuse, not silently
    # render pinhole
    from light_transport_tpu.api import render
    from light_transport_tpu.scene.cornell import cornell_box_scene

    scene, cfg = cornell_box_scene(width=4, height=4, spp=1, max_depth=1)
    c = dataclasses.replace(cfg, aperture=0.3, focus_distance=5.0)
    for integrator in ("whitted", "bdpt"):
        with pytest.raises(ValueError, match="aperture"):
            render(scene, c, integrator=integrator)


def test_cv_render_supports_dof():
    """render_cv shares the thin-lens camera (lens uniforms parametrize
    the primary ray like the AA jitter; they are outside the CV gradient
    slot set) — the lens must actually bend rays, and the pinhole stream
    must stay bitwise unchanged at aperture=0."""
    from light_transport_tpu.integrators.control_variates import render_cv

    scene = _emitter_scene()
    cfg = RenderConfig(width=24, height=24, spp=8, max_depth=2)
    pin = render_cv(scene, cfg, jax.random.key(2))
    blur_cfg = dataclasses.replace(cfg, aperture=0.4, focus_distance=2.0)
    blur = render_cv(scene, blur_cfg, jax.random.key(2))
    assert np.isfinite(np.asarray(blur.image_cv)).all()
    # off-plane focus spreads the emitter's footprint, as in the PT test
    assert _lit_count(blur.image_plain) > 1.5 * _lit_count(pin.image_plain)


def test_dof_works_with_sobol_and_adaptive():
    from light_transport_tpu.integrators.adaptive import render_adaptive

    scene = _emitter_scene()
    cfg = RenderConfig(width=24, height=24, spp=8, max_depth=1,
                       sampler="sobol", aperture=0.25, focus_distance=2.0)
    img = np.asarray(render_image(scene, cfg, jax.random.key(0)))
    assert np.isfinite(img).all() and img.max() > 0
    img_a = np.asarray(render_adaptive(scene, cfg, jax.random.key(0),
                                       rounds=2))
    assert np.isfinite(img_a).all() and img_a.max() > 0
