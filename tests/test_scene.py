import jax.numpy as jnp
import numpy as np

from light_transport_tpu.core import rng
from light_transport_tpu.scene.cornell import (
    cornell_box_scene,
    cornell_box_triangles,
    cone_triangles,
    light_triangles,
)
from light_transport_tpu.scene.geometry import TriangleMesh
from light_transport_tpu.scene.lights import sample_light_points
from light_transport_tpu.scene.material import MaterialTable, presets, Material


def test_cornell_box_geometry():
    dim = 7.5
    verts, kind = cornell_box_triangles(dim)
    # 8 quads (right, left, back, bottom + 4 top panels; front face open —
    # the camera looks in through it, src/cornell_box.py has no front wall)
    assert verts.shape == (16, 3, 3)
    # all vertices within the box
    assert np.abs(verts).max() <= dim + 1e-9
    # areas: right+left+back+bottom = 4 walls of (2 dim)^2, plus top panels
    # covering (2 dim)^2 minus the 2x2 light cutout
    mesh = TriangleMesh.build(verts, np.zeros(16, np.int32))
    total = mesh.area().sum()
    expected = 4 * (2 * dim) ** 2 + ((2 * dim) ** 2 - 4.0)
    np.testing.assert_allclose(total, expected, rtol=1e-6)


def test_light_triangles_fill_cutout():
    lv = light_triangles(7.5)
    mesh = TriangleMesh.build(lv, np.zeros(2, np.int32))
    np.testing.assert_allclose(mesh.area().sum(), 4.0, rtol=1e-6)
    assert np.allclose(lv[..., 1], 7.5)  # at ceiling height


def test_cone_closed_surface():
    cone = cone_triangles(radius=2.0, height=5.0)
    mesh = TriangleMesh.build(cone, np.zeros(len(cone), np.int32))
    # cone extends [-2.5, 2.5] along x (pyvista default direction)
    v = mesh.vertices()
    np.testing.assert_allclose(v[..., 0].max(), 2.5, atol=1e-6)
    np.testing.assert_allclose(v[..., 0].min(), -2.5, atol=1e-6)
    assert np.abs(v[..., 1:]).max() <= 2.0 + 1e-6


def test_scene_light_table():
    scene, cfg = cornell_box_scene()
    assert scene.lights.num == 2
    np.testing.assert_allclose(float(scene.lights.total_area), 4.0, rtol=1e-6)
    # radiance = emission * diffuse(white) = 200
    np.testing.assert_allclose(
        np.asarray(scene.lights.radiance), 200.0, rtol=1e-5
    )
    assert cfg.f_distance == 7.5


def test_sample_light_points_on_surface():
    scene, _ = cornell_box_scene()
    n = 4096
    r = np.random.default_rng(0)
    u_pick = jnp.asarray(r.random(n, dtype=np.float32))
    u0 = jnp.asarray(r.random(n, dtype=np.float32))
    u1 = jnp.asarray(r.random(n, dtype=np.float32))
    p, nrm, rad, pdf = sample_light_points(scene.lights, u_pick, u0, u1)
    p = np.asarray(p)
    np.testing.assert_allclose(p[:, 1], 7.5, atol=1e-4)  # on the ceiling
    assert p[:, 0].min() >= -1 - 1e-5 and p[:, 0].max() <= 1 + 1e-5
    assert p[:, 2].min() >= -1 - 1e-5 and p[:, 2].max() <= 1 + 1e-5
    np.testing.assert_allclose(np.asarray(pdf), 0.25, rtol=1e-5)
    # uniform over the union: both quadrants populated
    assert (p[:, 0] > 0).mean() > 0.4 and (p[:, 0] > 0).mean() < 0.6
    assert (p[:, 2] > 0).mean() > 0.4 and (p[:, 2] > 0).mean() < 0.6


def test_material_table_bsdf_codes():
    mats = MaterialTable.build(
        [
            Material(color=presets.WHITE_2),  # diffuse
            presets.BRONZE_MAT,  # mirror
            presets.GLASS_MAT,  # transmissive
            Material(color=presets.WHITE_2, is_diffuse=False),  # none
        ]
    )
    np.testing.assert_array_equal(np.asarray(mats.bsdf), [0, 1, 2, 3])


def test_logit_sigmoid_roundtrip():
    u = jnp.asarray(np.random.default_rng(1).random(100, dtype=np.float32))
    np.testing.assert_allclose(
        np.asarray(rng.sigmoid(rng.logit(u))), np.asarray(u), atol=1e-5
    )


def test_uv_sphere_matches_loop_builder():
    """The vectorized uv_sphere_triangles must reproduce the per-quad loop
    builder (scene/cornell.sphere_triangles) exactly — same band layout,
    same pole-quad degenerate halves skipped."""
    from light_transport_tpu.scene.cornell import sphere_triangles
    from light_transport_tpu.scene.geometry import uv_sphere_triangles

    loop = sphere_triangles(center=(0.5, -1.0, 2.0), radius=1.7,
                            n_theta=7, n_phi=9)
    vec = uv_sphere_triangles(center=(0.5, -1.0, 2.0), radius=1.7,
                              n_theta=7, n_phi=9)
    assert vec.shape == loop.shape
    # the loop interleaves upper/lower per quad; compare as sets of rows
    lv = np.asarray(sorted(loop.reshape(-1, 9).tolist()))
    vv = np.asarray(sorted(vec.reshape(-1, 9).tolist()))
    np.testing.assert_allclose(vv, lv, rtol=0, atol=1e-12)
