import os

import jax.numpy as jnp
import numpy as np
import pytest

from light_transport_tpu.accel import bvh as bvh_mod
from light_transport_tpu.ops import intersect
from light_transport_tpu.scene.geometry import TriangleMesh
from light_transport_tpu.scene.objio import load_obj, parse_obj, reference_obj_path


def random_mesh(t, seed=0, spread=4.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, size=(t, 1, 3))
    tri = base + rng.normal(scale=0.4, size=(t, 3, 3))
    return TriangleMesh.build(tri, np.zeros(t, np.int32))


def random_rays(n, seed=1, spread=6.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_build_invariants():
    mesh = random_mesh(200)
    bvh, ordered = bvh_mod.build(mesh)
    count = np.asarray(bvh.count)
    first = np.asarray(bvh.first)
    # leaf prim ranges exactly tile [0, T)
    leaves = count > 0
    spans = sorted(zip(first[leaves], first[leaves] + count[leaves]))
    pos = 0
    for s, e in spans:
        assert s == pos
        pos = e
    assert pos == mesh.num_triangles
    # every node's bounds contain its prims
    verts = ordered.vertices()
    bmin = np.asarray(bvh.bounds_min)
    bmax = np.asarray(bvh.bounds_max)
    for node in np.nonzero(leaves)[0][:50]:
        v = verts[first[node]: first[node] + count[node]]
        assert (v.min(axis=(0, 1)) >= bmin[node] - 1e-3).all()
        assert (v.max(axis=(0, 1)) <= bmax[node] + 1e-3).all()


@pytest.mark.parametrize("t,n", [(1, 64), (7, 128), (300, 512)])
def test_bvh_matches_brute_force(t, n):
    mesh = random_mesh(t, seed=t)
    bvh, ordered = bvh_mod.build(mesh)
    o, d = random_rays(n, seed=t + 1)
    brute = intersect.intersect_rays(o, d, ordered)
    fast = bvh_mod.intersect_bvh(o, d, ordered, bvh)
    np.testing.assert_array_equal(np.asarray(brute.valid), np.asarray(fast.valid))
    hit = np.asarray(brute.valid)
    np.testing.assert_allclose(
        np.asarray(brute.t)[hit], np.asarray(fast.t)[hit], rtol=1e-5
    )
    # same triangle except on exact t-ties between different prims
    if hit.any():
        same = np.asarray(brute.tri)[hit] == np.asarray(fast.tri)[hit]
        assert same.mean() > 0.99


def test_bvh_occlusion_matches_brute_force():
    mesh = random_mesh(123, seed=9)
    bvh, ordered = bvh_mod.build(mesh)
    o, d = random_rays(256, seed=10)
    dist = jnp.full((256,), 5.0)
    brute = intersect.occluded(o, d, ordered, dist)
    fast = bvh_mod.occluded_bvh(o, d, ordered, bvh, dist)
    np.testing.assert_array_equal(np.asarray(brute), np.asarray(fast))


def test_native_builder_matches_numpy():
    from light_transport_tpu.accel import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    mesh = random_mesh(500, seed=3)
    b_nat, m_nat = bvh_mod.build(mesh, use_native=True)
    b_py, m_py = bvh_mod.build(mesh, use_native=False)
    # identical traversal results (trees may differ in tie-breaks)
    o, d = random_rays(256, seed=4)
    h_nat = bvh_mod.intersect_bvh(o, d, m_nat, b_nat)
    h_py = bvh_mod.intersect_bvh(o, d, m_py, b_py)
    np.testing.assert_array_equal(np.asarray(h_nat.valid), np.asarray(h_py.valid))
    hit = np.asarray(h_nat.valid)
    np.testing.assert_allclose(
        np.asarray(h_nat.t)[hit], np.asarray(h_py.t)[hit], rtol=1e-5
    )


def test_parse_obj_cube(tmp_path):
    obj = tmp_path / "cube.obj"
    obj.write_text(
        "\n".join(
            [
                "v 0 0 0", "v 1 0 0", "v 1 1 0", "v 0 1 0",
                "v 0 0 1", "v 1 0 1", "v 1 1 1", "v 0 1 1",
                "f 1 2 3 4",  # quad -> 2 tris
                "f 5/1 6/2 7/3",  # v/vt syntax
                "f -4 -3 -2",  # negative indices
            ]
        )
    )
    verts = parse_obj(str(obj))
    assert verts.shape == (4, 3, 3)
    np.testing.assert_allclose(verts[0][0], [0, 0, 0])
    np.testing.assert_allclose(verts[2][0], [0, 0, 1])  # f 5 6 7
    np.testing.assert_allclose(verts[3][0], [0, 0, 1])  # f -4 -3 -2 == 5 6 7


def test_load_reference_teapot():
    path = reference_obj_path("teapot.obj")
    if path is None:
        pytest.skip("reference assets not mounted")
    mesh, dim = load_obj(path)
    assert mesh.num_triangles > 5000
    assert dim > 0
    bvh, ordered = bvh_mod.build(mesh)
    # a few rays against the teapot: BVH agrees with brute force
    o, d = random_rays(64, seed=5, spread=dim)
    brute = intersect.intersect_rays(o, d, ordered, ray_chunk=64)
    fast = bvh_mod.intersect_bvh(o, d, ordered, bvh)
    np.testing.assert_array_equal(np.asarray(brute.valid), np.asarray(fast.valid))
    hit = np.asarray(brute.valid)
    np.testing.assert_allclose(
        np.asarray(brute.t)[hit], np.asarray(fast.t)[hit], rtol=1e-4
    )
