"""Treelet traversal kernel: exactness of the chunked tables and bit-parity
with the XLA roped walk (interpret mode off-TPU; the Mosaic-compiled path
is validated on hardware by scripts/validate_tpu.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from light_transport_tpu.accel import bvh as bvh_mod
from light_transport_tpu.ops.pallas.treelet_kernel import (
    build_treelet_tables,
    intersect_bvh_treelet,
    intersect_bvh_treelet_queued,
    intersect_bvh_treelet_wavefront,
    occluded_bvh_treelet,
)
from light_transport_tpu.scene.geometry import TriangleMesh


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


def test_tables_reconstruct_exactly():
    mesh = random_mesh(500, seed=3)
    bvh, _ = bvh_mod.build(mesh)
    tables = build_treelet_tables(bvh, T=64)
    m = bvh.num_nodes
    tab = np.asarray(tables.tab, np.float32)  # (n_t, TAB_ROWS, T)
    flat = np.moveaxis(tab, 0, 1).reshape(tab.shape[1], -1)[:, :m]

    def s3(r):
        return flat[r] + flat[r + 1] + flat[r + 2]

    np.testing.assert_array_equal(s3(0), np.asarray(bvh.bounds_min[:, 0]))
    np.testing.assert_array_equal(s3(15), np.asarray(bvh.bounds_max[:, 2]))
    ints = np.asarray(
        jnp.asarray(bvh.node_rec[:, 6:9]).view(jnp.int32)
        if hasattr(jnp.asarray(bvh.node_rec[:, 6:9]), "view")
        else bvh.node_rec[:, 6:9])
    import jax

    ints = np.asarray(jax.lax.bitcast_convert_type(
        bvh.node_rec[:, 6:9], jnp.int32))
    np.testing.assert_array_equal(s3(18).astype(np.int64), ints[:, 0])
    np.testing.assert_array_equal(flat[21].astype(np.int64), ints[:, 1])
    np.testing.assert_array_equal(s3(22).astype(np.int64), ints[:, 2])
    # leaf half: tri 0 component 0 = leaf_rec column 0
    from light_transport_tpu.ops.pallas.treelet_kernel import NODE_ROWS
    lr = NODE_ROWS
    np.testing.assert_array_equal(
        flat[lr] + flat[lr + 1] + flat[lr + 2],
        np.asarray(bvh.leaf_rec[:, 0]))


@pytest.mark.parametrize("t,n,T", [(40, 96, 32), (500, 300, 64),
                                   (2000, 700, 128)])
def test_treelet_matches_roped_walk(t, n, T):
    mesh = random_mesh(t, seed=t)
    bvh, ordered = bvh_mod.build(mesh)
    tables = build_treelet_tables(bvh, T=T)
    o, d = random_rays(n, seed=t + 1)
    ref = bvh_mod.intersect_bvh(o, d, ordered, bvh)
    got = intersect_bvh_treelet(o, d, tables, ray_tile=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.valid),
                                  np.asarray(got.valid))
    np.testing.assert_array_equal(np.asarray(ref.tri), np.asarray(got.tri))
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(got.t))


def test_treelet_dead_lanes_and_stats():
    mesh = random_mesh(300, seed=9)
    bvh, ordered = bvh_mod.build(mesh)
    tables = build_treelet_tables(bvh, T=64)
    o, d = random_rays(200, seed=10)
    tmax = jnp.where(jnp.arange(200) % 3 == 0, -jnp.inf, jnp.inf)
    got, stats = intersect_bvh_treelet(
        o, d, tables, t_max=tmax, ray_tile=128, interpret=True,
        with_stats=True)
    dead = np.arange(200) % 3 == 0
    assert not np.asarray(got.valid)[dead].any()
    # dead lanes fall off the root rope after exactly one visit
    assert (np.asarray(stats["visits"])[dead] == 1).all()
    assert (np.asarray(stats["loads"]) >= 1).all()
    # live lanes must match a reference walk with the same per-lane t_max
    ref = bvh_mod.intersect_bvh(o, d, ordered, bvh, t_max=tmax)
    live = ~dead
    np.testing.assert_array_equal(np.asarray(ref.valid)[live],
                                  np.asarray(got.valid)[live])
    np.testing.assert_array_equal(np.asarray(ref.tri)[live],
                                  np.asarray(got.tri)[live])


def test_treelet_any_hit():
    mesh = random_mesh(500, seed=5)
    bvh, ordered = bvh_mod.build(mesh)
    tables = build_treelet_tables(bvh, T=64)
    o, d = random_rays(300, seed=6)
    dist = jnp.full((300,), 4.0)
    ref = bvh_mod.occluded_bvh(o, d, ordered, bvh, dist)
    got = occluded_bvh_treelet(o, d, tables, dist, ray_tile=128,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("L,P", [(1, 4), (2, 2), (4, 8)])
def test_queued_matches_roped_walk(L, P):
    """The wavefront driver (bounded launches + re-sort by cursor) is
    bit-identical to the XLA walk for every (loads_per_pass,
    passes_per_sync) schedule — scheduling cannot change per-ray walks."""
    mesh = random_mesh(2000, seed=7)
    bvh, ordered = bvh_mod.build(mesh)
    tables = build_treelet_tables(bvh, T=64)
    o, d = random_rays(700, seed=8)
    ref = bvh_mod.intersect_bvh(o, d, ordered, bvh)
    got, st = intersect_bvh_treelet_queued(
        o, d, tables, ray_tile=128, interpret=True, with_stats=True,
        loads_per_pass=L, passes_per_sync=P)
    np.testing.assert_array_equal(np.asarray(ref.valid),
                                  np.asarray(got.valid))
    np.testing.assert_array_equal(np.asarray(ref.tri), np.asarray(got.tri))
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(got.t))
    # re-sorting must CONVERGE lanes: fewer lockstep iterations than the
    # single-launch kernel on the same rays (3979 there, ~2100-2600 here)
    _, st1 = intersect_bvh_treelet(o, d, tables, ray_tile=128,
                                   interpret=True, with_stats=True)
    assert int(st["iters"]) < int(np.asarray(st1["iters"]).sum())
    # per-ray node visits are schedule-invariant
    np.testing.assert_array_equal(np.asarray(st["visits"]),
                                  np.asarray(st1["visits"]))


@pytest.mark.parametrize("mp", [0, 2, 16])
def test_wavefront_jittable_matches_roped_walk(mp):
    """The fully-traceable wavefront (scan of cond-gated passes + one
    unbounded finish launch) is bit-identical at ANY max_passes —
    max_passes is a perf knob, never a correctness bound — and composes
    with jit."""
    import jax

    mesh = random_mesh(2000, seed=7)
    bvh, ordered = bvh_mod.build(mesh)
    tables = build_treelet_tables(bvh, T=64)
    o, d = random_rays(700, seed=8)
    ref = bvh_mod.intersect_bvh(o, d, ordered, bvh)
    got = jax.jit(lambda o, d: intersect_bvh_treelet_wavefront(
        o, d, tables, ray_tile=128, interpret=True, loads_per_pass=2,
        max_passes=mp))(o, d)
    np.testing.assert_array_equal(np.asarray(ref.valid),
                                  np.asarray(got.valid))
    np.testing.assert_array_equal(np.asarray(ref.tri), np.asarray(got.tri))
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(got.t))


def test_wavefront_any_hit():
    mesh = random_mesh(500, seed=5)
    bvh, ordered = bvh_mod.build(mesh)
    tables = build_treelet_tables(bvh, T=64)
    o, d = random_rays(300, seed=6)
    dist = jnp.full((300,), 4.0)
    ref = bvh_mod.occluded_bvh(o, d, ordered, bvh, dist)
    got = intersect_bvh_treelet_wavefront(
        o, d, tables, t_max=dist, any_hit=True, ray_tile=128,
        interpret=True, loads_per_pass=2, max_passes=4)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_queued_any_hit_and_dead_lanes():
    mesh = random_mesh(500, seed=5)
    bvh, ordered = bvh_mod.build(mesh)
    tables = build_treelet_tables(bvh, T=64)
    o, d = random_rays(300, seed=6)
    dist = jnp.full((300,), 4.0)
    ref = bvh_mod.occluded_bvh(o, d, ordered, bvh, dist)
    got = intersect_bvh_treelet_queued(
        o, d, tables, t_max=dist, any_hit=True, ray_tile=128,
        interpret=True, loads_per_pass=2)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    tmax = jnp.where(jnp.arange(300) % 3 == 0, -jnp.inf, jnp.inf)
    got2, st = intersect_bvh_treelet_queued(
        o, d, tables, t_max=tmax, ray_tile=128, interpret=True,
        with_stats=True, loads_per_pass=2)
    dead = np.arange(300) % 3 == 0
    assert not np.asarray(got2.valid)[dead].any()
    assert (np.asarray(st["visits"])[dead] == 1).all()
    ref2 = bvh_mod.intersect_bvh(o, d, ordered, bvh, t_max=tmax)
    live = ~dead
    np.testing.assert_array_equal(np.asarray(ref2.tri)[live],
                                  np.asarray(got2.tri)[live])
    np.testing.assert_array_equal(np.asarray(ref2.t)[live],
                                  np.asarray(got2.t)[live])


@pytest.mark.parametrize("wavefront", [False, True])
def test_dispatch_routes_treelet(monkeypatch, wavefront):
    """Scene.with_treelet() + TPU platform routes scene_intersect /
    scene_occluded through the treelet kernel (forced interpret here) and
    matches the roped-walk dispatch bit-exactly — via either scheduling
    (single-launch or wavefront)."""
    import functools

    import light_transport_tpu.ops.dispatch as dispatch
    import light_transport_tpu.ops.pallas.treelet_kernel as tk
    from light_transport_tpu.scene.material import (
        Material, MaterialTable, presets)
    from light_transport_tpu.scene.scene import Scene

    mesh = random_mesh(400, seed=21)
    mats = MaterialTable.build([Material(color=presets.WHITE_2)])
    scene = Scene.build(mesh, mats, camera=np.zeros(3)).with_bvh()
    o, d = random_rays(300, seed=22)

    ref_hit = dispatch.scene_intersect(scene, o, d)
    ref_occ = dispatch.scene_occluded(scene, o, d, 3.0)

    scene_t = scene.with_treelet(T=64)
    assert scene_t.treelet is not None
    monkeypatch.setattr(dispatch, "_platform", lambda: "tpu")
    # big-mesh regime: the MXU gather-cull bows out, the BVH branch decides
    monkeypatch.setattr(dispatch, "_use_pallas_mxu",
                        lambda *a, **k: False)
    monkeypatch.setattr(dispatch, "TREELET_WAVEFRONT", wavefront)
    monkeypatch.setattr(
        tk, "intersect_bvh_treelet",
        functools.partial(tk.intersect_bvh_treelet, interpret=True))
    monkeypatch.setattr(
        tk, "occluded_bvh_treelet",
        functools.partial(tk.occluded_bvh_treelet, interpret=True))
    monkeypatch.setattr(
        tk, "intersect_bvh_treelet_wavefront",
        functools.partial(tk.intersect_bvh_treelet_wavefront,
                          interpret=True, ray_tile=128, max_passes=3))
    got_hit = dispatch.scene_intersect(scene_t, o, d)
    got_occ = dispatch.scene_occluded(scene_t, o, d, 3.0)
    np.testing.assert_array_equal(np.asarray(ref_hit.valid),
                                  np.asarray(got_hit.valid))
    np.testing.assert_array_equal(np.asarray(ref_hit.tri),
                                  np.asarray(got_hit.tri))
    np.testing.assert_array_equal(np.asarray(ref_hit.t),
                                  np.asarray(got_hit.t))
    np.testing.assert_array_equal(np.asarray(ref_occ), np.asarray(got_occ))


def test_with_bvh_auto_treelet_policy(monkeypatch):
    """with_bvh(treelet="auto") attaches slabs exactly when dispatch would
    use them (TPU backend + past-crossover mesh + format cap + not
    watertight) — VERDICT r4 item 4: big-mesh users get the measured-best
    traversal without knowing to call with_treelet()."""
    import jax

    import light_transport_tpu.ops.dispatch as dispatch
    import light_transport_tpu.scene.scene as scene_mod
    from light_transport_tpu.scene.material import (
        Material, MaterialTable, presets)
    from light_transport_tpu.scene.scene import Scene

    # the literal threshold must track the dispatch crossover it encodes
    assert scene_mod.TREELET_AUTO_MIN_TRIS == dispatch.MXU_MAX_TRIS

    mesh = random_mesh(400, seed=31)
    mats = MaterialTable.build([Material(color=presets.WHITE_2)])
    base = Scene.build(mesh, mats, camera=np.zeros(3))

    # CPU backend (the test env): auto never attaches
    assert base.with_bvh().treelet is None
    # explicit True forces the build on any backend
    assert base.with_bvh(treelet=True).treelet is not None

    # fake a TPU backend + drop the crossover below this mesh: auto fires
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(scene_mod, "TREELET_AUTO_MIN_TRIS", 100)
    assert base.with_bvh().treelet is not None
    # explicit opt-out wins
    assert base.with_bvh(treelet=False).treelet is None
    # watertight scenes brute-force every query — no slabs
    assert base.with_watertight().with_bvh().treelet is None
    # below the crossover: no slabs
    monkeypatch.setattr(scene_mod, "TREELET_AUTO_MIN_TRIS", 10**9)
    assert base.with_bvh().treelet is None
