"""Coherence ray sorting (ops/raysort.py).

The sort is a pure reordering: sorted_apply must return bit-identical
results to the direct call for any elementwise-per-ray function.  TPU-only
perf effects (cull tightening) are covered by test_pallas_engine."""

import numpy as np
import jax.numpy as jnp

from light_transport_tpu.ops import intersect, raysort
from light_transport_tpu.scene.cornell import sphere_triangles
from light_transport_tpu.scene.geometry import TriangleMesh


def _mesh():
    tris = sphere_triangles(center=(0, 0, 0), radius=1.0, n_theta=8,
                            n_phi=16)
    return TriangleMesh.build(tris, np.zeros(len(tris), np.int32))


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_sorted_apply_identity():
    mesh = _mesh()
    n = raysort.MIN_SORT_LANES  # large enough that sorting engages
    o, d = _rays(n)
    direct = intersect.intersect_rays(o, d, mesh)
    via = raysort.sorted_apply(
        lambda oo, dd: intersect.intersect_rays(oo, dd, mesh), mesh, o, d)
    np.testing.assert_array_equal(np.asarray(direct.valid),
                                  np.asarray(via.valid))
    np.testing.assert_array_equal(np.asarray(direct.tri),
                                  np.asarray(via.tri))
    np.testing.assert_array_equal(np.asarray(direct.t), np.asarray(via.t))


def test_sorted_apply_extra_per_ray_args():
    mesh = _mesh()
    n = raysort.MIN_SORT_LANES
    o, d = _rays(n, seed=1)
    md = jnp.asarray(
        np.random.default_rng(2).uniform(0.5, 4.0, n).astype(np.float32))
    direct = intersect.occluded(o, d, mesh, md)
    via = raysort.sorted_apply(
        lambda oo, dd, mm: intersect.occluded(oo, dd, mesh, mm),
        mesh, o, d, md)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(via))


def test_sorted_apply_small_batch_bypass():
    """Below MIN_SORT_LANES the lanes pass through unsorted (and the key
    machinery is never traced)."""
    mesh = _mesh()
    o, d = _rays(64)
    called_with = {}

    def probe(oo, dd):
        called_with["o"] = oo
        return oo

    raysort.sorted_apply(probe, mesh, o, d)
    assert called_with["o"] is o


def test_key_groups_by_direction_then_position():
    """Keys are direction-major: opposite-direction rays never interleave,
    and within one direction cell nearby origins get nearby keys."""
    mesh = _mesh()
    lo, hi = raysort.scene_bounds(mesh)
    n = 512
    rng = np.random.default_rng(3)
    o = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    d_pos = jnp.asarray(np.tile([1.0, 0.0, 0.0], (n, 1)).astype(np.float32))
    d_neg = -d_pos
    k_pos = np.asarray(raysort.ray_sort_key(o, d_pos, lo, hi))
    k_neg = np.asarray(raysort.ray_sort_key(o, d_neg, lo, hi))
    assert k_pos.min() > k_neg.max() or k_neg.min() > k_pos.max()
    # same direction, same origin -> same key
    np.testing.assert_array_equal(
        k_pos, np.asarray(raysort.ray_sort_key(o, d_pos, lo, hi)))


def test_inactive_lanes_sort_last_and_results_identical():
    """With an inactive mask, dead lanes pack after all live lanes (top key
    bit) and sorted_apply still returns input-order results."""
    mesh = _mesh()
    lo, hi = raysort.scene_bounds(mesh)
    n = raysort.MIN_SORT_LANES
    o, d = _rays(n, seed=4)
    rng = np.random.default_rng(5)
    alive = jnp.asarray(rng.uniform(size=n) < 0.4)
    key = np.asarray(raysort.ray_sort_key(o, d, lo, hi, inactive=~alive))
    order = np.argsort(key)
    alive_sorted = np.asarray(alive)[order]
    first_dead = np.argmax(~alive_sorted)
    assert not alive_sorted[first_dead:].any()

    direct = intersect.intersect_rays(o, d, mesh)
    via = raysort.sorted_apply(
        lambda oo, dd: intersect.intersect_rays(oo, dd, mesh), mesh, o, d,
        inactive=~alive)
    np.testing.assert_array_equal(np.asarray(direct.tri), np.asarray(via.tri))
