"""Interior participating media in the surface path tracer.

The reference gestures at volumetric transport (``Medium`` enum,
src/constants.py:17-24; unused ``henyey_greenstein``,
src/medium_samples.py:14-16) but never attenuates anything inside its
transmissive objects.  Here Beer-Lambert absorption and HG in-scattering run
along every interior path segment; these tests pin the physics to analytic
values on a slab geometry where the answer is closed-form.
"""

import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from light_transport_tpu.core import rng
from light_transport_tpu.core.config import RenderConfig
from light_transport_tpu.integrators.path_tracer import trace_paths
from light_transport_tpu.scene.geometry import TriangleMesh, quad_triangles
from light_transport_tpu.scene.material import Color, Material, MaterialTable
from light_transport_tpu.scene.scene import Scene

_WHITE = Color.of((0, 0, 0), (1, 1, 1), (1, 1, 1))


def _slab_scene(sigma_a=(0.0, 0.0, 0.0), sigma_s=0.0, g=0.0, thickness=1.0,
                emission=1.0):
    """Camera rays -> glass slab (ior=1: straight transmission) -> emissive
    wall.  Outward normals: front face +z, back face -z, so the segment
    between them registers as interior (backface exit hit)."""
    half = 50.0  # effectively infinite quads
    front = quad_triangles(  # CCW seen from +z -> normal +z
        (-half, -half, 0.0), (half, -half, 0.0),
        (half, half, 0.0), (-half, half, 0.0))
    back = quad_triangles(  # CCW seen from -z -> normal -z
        (-half, -half, -thickness), (-half, half, -thickness),
        (half, half, -thickness), (half, -half, -thickness))
    wall = quad_triangles(  # emissive wall behind, facing +z
        (-half, -half, -5.0), (half, -half, -5.0),
        (half, half, -5.0), (-half, half, -5.0))
    tris = np.concatenate([front, back, wall])
    mat_id = np.asarray([0, 0, 0, 0, 1, 1], np.int32)
    is_light = np.asarray([0, 0, 0, 0, 1, 1], bool)
    glass = Material(color=_WHITE, ior=1.0, transmission=1.0,
                     is_diffuse=False, is_mirror=False,
                     sigma_a=tuple(sigma_a), sigma_s=sigma_s, medium_g=g)
    # black diffuse: the wall emits but does not reflect, so each path
    # scores at most once (emission_mode="always" + a reflective light
    # would double-count re-crossing paths)
    black = Color.of((0, 0, 0), (0, 0, 0), (0, 0, 0))
    light = Material(color=black, emission=emission)
    mesh = TriangleMesh.build(tris, mat_id, is_light)
    return Scene.build(mesh, MaterialTable.build([glass, light]),
                       camera=[0.0, 0.0, 3.0])


def _trace(scene, n=512, max_depth=4, seed=0):
    cfg = RenderConfig(width=1, height=1, spp=1, max_depth=max_depth,
                       emission_mode="always")
    origins = jnp.tile(jnp.asarray([[0.0, 0.0, 3.0]], jnp.float32), (n, 1))
    directions = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32),
                          (n, 1))
    uniforms = rng.path_uniforms(jax.random.key(seed), n, max_depth)
    radiance, _ = trace_paths(scene, cfg, origins, directions, uniforms)
    return np.asarray(radiance)


def test_beer_lambert_exact():
    """Pure absorption: radiance through the slab = E * exp(-sigma_a * L)
    per channel, exactly (perpendicular rays, ior=1, no randomness on the
    transmissive chain)."""
    sa = (0.5, 1.0, 2.0)
    L = 1.25
    scene = _slab_scene(sigma_a=sa, thickness=L)
    rad = _trace(scene, n=64)
    want = np.exp(-np.asarray(sa) * L)
    np.testing.assert_allclose(rad, np.broadcast_to(want, rad.shape),
                               rtol=2e-3)


def test_no_medium_is_identity():
    """sigma_a = 0 reproduces the un-attenuated radiance exactly."""
    scene = _slab_scene(sigma_a=(0.0, 0.0, 0.0))
    rad = _trace(scene, n=32)
    np.testing.assert_allclose(rad, 1.0, rtol=1e-4)


def test_hg_in_scattering_band():
    """Pure scattering (albedo 1): every forward path still reaches the
    (effectively infinite) emissive wall, so mean transmitted radiance lies
    between the unscattered fraction exp(-sigma_s*L) and 1, and scattering
    must actually remove energy from the collimated beam vs sigma_s=0."""
    ss, L = 0.8, 1.0
    scene = _slab_scene(sigma_s=ss, thickness=L)
    rad = _trace(scene, n=4096, max_depth=16).mean(axis=0)
    lo = np.exp(-ss * L)
    assert np.all(rad > lo - 1e-3), (rad, lo)
    assert np.all(rad <= 1.0 + 1e-6)
    # backscatter exists: some energy is lost to camera-side exits
    assert np.all(rad < 0.999), rad


@pytest.mark.slow
def test_scatter_depth_truncation_monotone():
    """Deeper bounce budgets recover more multiply-scattered light."""
    scene = _slab_scene(sigma_s=2.0, thickness=1.0)
    shallow = _trace(scene, n=4096, max_depth=2).mean()
    deep = _trace(scene, n=4096, max_depth=16).mean()
    assert deep > shallow + 0.01, (shallow, deep)


@pytest.mark.slow
def test_anisotropy_forward_bias():
    """g -> 1 scatters forward: transmission through the slab increases
    with g at fixed sigma_s."""
    iso = _trace(_slab_scene(sigma_s=2.0, g=0.0), n=8192,
                 max_depth=16).mean()
    fwd = _trace(_slab_scene(sigma_s=2.0, g=0.9), n=8192,
                 max_depth=16).mean()
    assert fwd > iso + 0.02, (iso, fwd)
