import jax.numpy as jnp
import numpy as np

from light_transport_tpu.ops import intersect
from light_transport_tpu.scene.geometry import TriangleMesh


def single_tri_mesh():
    verts = np.asarray(
        [[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]]
    )
    return TriangleMesh.build(verts, [0])


def test_triangle_hit_and_t():
    mesh = single_tri_mesh()
    o = jnp.asarray([[0.2, 0.2, 1.0], [0.2, 0.2, 1.0], [2.0, 2.0, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    hit = intersect.intersect_rays(o, d, mesh)
    assert bool(hit.valid[0])  # straight down onto the triangle
    np.testing.assert_allclose(float(hit.t[0]), 1.0, atol=1e-5)
    assert int(hit.tri[0]) == 0
    assert not bool(hit.valid[1])  # points away
    assert not bool(hit.valid[2])  # outside barycentric range


def test_triangle_edge_and_parallel():
    mesh = single_tri_mesh()
    o = jnp.asarray([[0.5, 0.5, 1.0], [0.0, 0.0, 0.5]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    hit = intersect.intersect_rays(o, d, mesh)
    assert bool(hit.valid[0])  # on the hypotenuse edge (u+v == 1)
    assert not bool(hit.valid[1])  # parallel to the plane


def test_nearest_of_two():
    verts = np.asarray(
        [
            [[-1, -1, -1.0], [1, -1, -1.0], [0, 1, -1.0]],
            [[-1, -1, -3.0], [1, -1, -3.0], [0, 1, -3.0]],
        ]
    )
    mesh = TriangleMesh.build(verts, [0, 0])
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = intersect.intersect_rays(o, d, mesh)
    assert int(hit.tri[0]) == 0
    np.testing.assert_allclose(float(hit.t[0]), 1.0, atol=1e-5)


def test_chunked_matches_unchunked():
    rng = np.random.default_rng(0)
    verts = rng.normal(size=(40, 3, 3))
    mesh = TriangleMesh.build(verts, np.zeros(40, np.int32))
    o = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32)) * 3
    d_np = rng.normal(size=(100, 3)).astype(np.float32)
    d = jnp.asarray(d_np / np.linalg.norm(d_np, axis=-1, keepdims=True))
    h0 = intersect.intersect_rays(o, d, mesh)
    h1 = intersect.intersect_rays(o, d, mesh, ray_chunk=17)
    np.testing.assert_array_equal(np.asarray(h0.valid), np.asarray(h1.valid))
    np.testing.assert_array_equal(np.asarray(h0.tri), np.asarray(h1.tri))
    np.testing.assert_allclose(np.asarray(h0.t), np.asarray(h1.t), rtol=1e-6)
    occ0 = intersect.occluded(o, d, mesh, jnp.full((100,), 2.0))
    occ1 = intersect.occluded(o, d, mesh, jnp.full((100,), 2.0), ray_chunk=17)
    np.testing.assert_array_equal(np.asarray(occ0), np.asarray(occ1))


def test_occluded_respects_max_dist():
    mesh = single_tri_mesh()
    o = jnp.asarray([[0.2, 0.2, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    assert bool(intersect.occluded(o, d, mesh, jnp.asarray([2.0]))[0])
    assert not bool(intersect.occluded(o, d, mesh, jnp.asarray([0.5]))[0])


def test_sphere_intersect():
    o = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 3.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t = intersect.sphere_intersect(o, d, jnp.asarray([0.0, 0.0, 0.0]), 1.0)
    np.testing.assert_allclose(float(t[0]), 4.0, atol=1e-5)
    assert np.isinf(float(t[1]))


def test_plane_intersect():
    o = jnp.asarray([[0.0, 0.0, 2.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t = intersect.plane_intersect(
        o, d, jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, 1.0])
    )
    np.testing.assert_allclose(float(t[0]), 2.0, atol=1e-6)


def test_aabb_intersect():
    o = jnp.asarray([[0.0, 0.0, 5.0], [3.0, 0.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    hit, tn, tf = intersect.aabb_intersect(
        o, d, jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0])
    )
    assert bool(hit[0]) and not bool(hit[1])
    np.testing.assert_allclose(float(tn[0]), 4.0, atol=1e-5)
    np.testing.assert_allclose(float(tf[0]), 6.0, atol=1e-5)
