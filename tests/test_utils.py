import pytest
import dataclasses
import os

import jax
import numpy as np

from light_transport_tpu.core.config import MediumConfig, PhotonRunConfig
from light_transport_tpu.scene.medium import LayeredMedium
from light_transport_tpu.transport.photon import simulate_photons
from light_transport_tpu.utils.checkpoint import (
    accumulate,
    load_tallies,
    save_tallies,
    simulate_resumable,
)
from light_transport_tpu.utils.profiling import StepTimer, compile_and_steady


def medium():
    return LayeredMedium.build([MediumConfig(mu_a=1.0, mu_s=9.0, g=0.5)])


def test_checkpoint_roundtrip(tmp_path):
    cfg = PhotonRunConfig(n_photons=5_000, nr=16, nz=16)
    res = simulate_photons(medium(), cfg, jax.random.key(0), lanes=1024)
    p = str(tmp_path / "ckpt.npz")
    save_tallies(p, res, seed=0, batches_done=3)
    loaded, seed, batches = load_tallies(p)
    assert seed == 0 and batches == 3
    np.testing.assert_array_equal(
        np.asarray(res.absorb_rz), np.asarray(loaded.absorb_rz)
    )


@pytest.mark.slow
def test_resumable_matches_uninterrupted(tmp_path):
    cfg = PhotonRunConfig(n_photons=8_000, nr=16, nz=16)
    p1 = str(tmp_path / "a.npz")
    full = simulate_resumable(medium(), cfg, seed=7, checkpoint_path=p1,
                              n_batches=4, lanes=512)
    # simulate an interruption: run 2 batches into a fresh checkpoint by
    # truncating, then resume
    p2 = str(tmp_path / "b.npz")
    half = simulate_resumable(
        medium(), dataclasses.replace(cfg, n_photons=4_000), seed=7,
        checkpoint_path=p2, n_batches=2, lanes=512,
    )
    # hand-craft the checkpoint as if batches 0-1 of the 4-batch run finished
    save_tallies(p2, half, seed=7, batches_done=2)
    resumed = simulate_resumable(medium(), cfg, seed=7, checkpoint_path=p2,
                                 n_batches=4, lanes=512)
    np.testing.assert_allclose(
        np.asarray(full.refl_r), np.asarray(resumed.refl_r), rtol=1e-6
    )
    assert resumed.n_launched == cfg.n_photons


def test_accumulate():
    cfg = PhotonRunConfig(n_photons=2_000, nr=8, nz=8)
    a = simulate_photons(medium(), cfg, jax.random.key(1), lanes=512)
    b = simulate_photons(medium(), cfg, jax.random.key(2), lanes=512)
    tot = accumulate(a, b)
    assert tot.n_launched == 4_000
    np.testing.assert_allclose(
        np.asarray(tot.absorb_rz),
        np.asarray(a.absorb_rz) + np.asarray(b.absorb_rz),
        rtol=1e-6,
    )


def test_profiling_helpers():
    t = StepTimer()
    for _ in range(3):
        with t.step():
            pass
    assert len(t.times) == 3 and t.steps_per_sec() > 0

    import jax.numpy as jnp

    f = jax.jit(lambda x: x * 2)
    t_compile, t_steady = compile_and_steady(f, jnp.ones(8))
    assert t_compile > 0 and t_steady > 0


def test_presets_importable():
    from light_transport_tpu.models.presets import PRESETS, hg_sweep

    assert set(PRESETS) >= {"demo", "multilayer", "mesh", "full_scale",
                            "lts", "glass"}
    sweep = list(hg_sweep(g_values=(0.5,), mu_a_values=(1.0,),
                          mu_s_values=(10.0,)))
    assert len(sweep) == 1


def test_glass_geometry():
    from light_transport_tpu.scene.glass import design_glass

    mesh = design_glass(resolution=12)
    assert mesh.num_triangles > 100
    v = mesh.vertices()
    assert np.isfinite(v).all()
    # glass body spans radius up to 7, base at y in [-0.5, 0.5]
    r = np.sqrt(v[..., 0] ** 2 + v[..., 2] ** 2)
    np.testing.assert_allclose(r.max(), 7.0, atol=1e-6)
    assert v[..., 1].min() >= -0.5 - 1e-6
    assert v[..., 1].max() <= 12.5 + 1e-6


def test_glass_windings_outward():
    """advisor r3: the glass builders wound their solids inward (cylinder,
    box) or mixed (tube), inverting the tracer's geometric inside/outside
    test — and with it the IOR ratio and interior Beer-Lambert attribution
    — at every glass-scene interface.  Pin the outward convention: a ray
    from far outside toward each solid's centroid must FIRST hit a
    front-facing triangle (dot(n_geo, dir) < 0)."""
    import jax.numpy as jnp

    from light_transport_tpu.ops import intersect
    from light_transport_tpu.scene.geometry import TriangleMesh
    from light_transport_tpu.scene.glass import (
        box_triangles,
        cylinder_triangles,
        tube_triangles,
    )

    solids = {
        "cylinder": (cylinder_triangles(6.0, 8.0, (0, 4.5, 0)), (0, 4.5, 0)),
        "box": (box_triangles((0, 3.0, 0), (5, 5, 5)), (0, 3.0, 0)),
        "tube": (tube_triangles(6.0, 7.0, 12.0, (0, 6.5, 0)), (6.5, 6.5, 0)),
    }
    dirs = np.asarray([[1.0, 0.3, 0.2], [-0.5, -1.0, 0.4],
                       [0.2, 0.1, -1.0], [-1.0, 0.5, -0.5]])
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    for name, (tris, target) in solids.items():
        mesh = TriangleMesh.build(tris, np.zeros(len(tris), np.int32))
        o = jnp.asarray(np.asarray(target) - 60.0 * dirs, jnp.float32)
        d = jnp.asarray(dirs, jnp.float32)
        hit = intersect.intersect_rays(o, d, mesh)
        assert bool(hit.valid.all()), name
        n_geo = np.asarray(mesh.normal)[np.asarray(hit.tri)]
        cos = np.sum(n_geo * dirs, axis=1)
        assert np.all(cos < 0), (name, cos)


def test_checkpoint_suffixless_path_resumes(tmp_path):
    """advisor r3: np.savez appends '.npz' to suffix-less paths while the
    resume existence check used the raw path, so `--checkpoint ckpt`
    runs silently restarted from batch 0 every time.  Saves are also
    atomic now (tmp + os.replace) — no stray tmp file remains."""
    cfg = PhotonRunConfig(n_photons=2_000, nr=8, nz=8)
    res = simulate_photons(medium(), cfg, jax.random.key(0), lanes=512)
    p = str(tmp_path / "ckpt")  # no extension
    save_tallies(p, res, seed=5, batches_done=2)
    assert os.path.exists(p + ".npz")
    assert not os.path.exists(p + ".npz.tmp")
    loaded, seed, batches = load_tallies(p)  # raw path loads too
    assert seed == 5 and batches == 2
    # resumable run sees the checkpoint through the raw path: with
    # batches_done == n_batches nothing re-runs and the result is the
    # checkpointed tallies verbatim
    out = simulate_resumable(medium(), cfg, seed=5, checkpoint_path=p,
                             n_batches=2, lanes=512)
    np.testing.assert_array_equal(np.asarray(out.absorb_rz),
                                  np.asarray(loaded.absorb_rz))


def test_accumulate_counters_exact_many_batches():
    """advisor r3: accumulate() plain-added the two-word exact counters,
    letting the lo word grow past 2^24 after ~256 merges and rounding the
    photon count.  The counter-aware merge keeps it exact."""
    import jax.numpy as jnp

    from light_transport_tpu.tally.tallies import PhotonTallies

    cfg = PhotonRunConfig(n_photons=0, nr=4, nz=4)
    one = PhotonTallies.zeros(cfg)
    # 60,000 launches per batch: 400 plain-added lo words would reach
    # 2.4e7 > 2^24 and round
    one = one.replace(launched=jnp.asarray([0.0, 60_000.0]))
    total = PhotonTallies.zeros(cfg)
    for _ in range(400):
        total = accumulate(total, one)
    assert total.n_launched == 400 * 60_000


def test_pallas_checkpoint_kill_and_resume(tmp_path):
    """Chunk-granular checkpoint/resume of the Pallas quota engine
    (VERDICT r3 item 4): a run killed after N chunks and re-invoked with
    the same arguments must reproduce the uninterrupted run's exact
    launched/steps counters and identical tallies (per-block RNG seeds
    derive from the absolute block index, so the resumed stream replays
    bit-for-bit; runs on the CPU mesh via the threefry interpret kernel)."""
    import dataclasses

    import numpy as np

    from light_transport_tpu.core.config import (
        MediumConfig,
        PhotonRunConfig,
    )
    from light_transport_tpu.ops.pallas.photon_kernel import (
        LANES,
        ROWS,
        simulate_pallas,
    )
    from light_transport_tpu.scene.medium import LayeredMedium

    m = LayeredMedium.build(
        [MediumConfig(mu_a=1.0, mu_s=9.0, g=0.7, n=1.37)], n_above=1.0)
    cfg = PhotonRunConfig(n_photons=40_000, nr=32, nz=32, dr=0.03, dz=0.03,
                          detector_nx=16, detector_extent=0.5,
                          vol_nx=8, vol_ny=8, vol_nz=8,
                          vol_dx=0.12, vol_dy=0.12, vol_dz=0.12,
                          tally_stride=4, vol_stride=8)
    kw = dict(lanes=ROWS * LANES, k_steps=16, chunk_blocks=2)
    ckpt = str(tmp_path / "pallas_run")

    ref = simulate_pallas(m, cfg, seed=5, **kw)

    # "kill" after 2 chunks: bound the host loop, checkpoint every chunk
    partial = simulate_pallas(m, cfg, seed=5, max_blocks=4,
                              checkpoint_path=ckpt, checkpoint_every=1,
                              **kw)
    assert partial.n_launched < cfg.n_photons  # genuinely interrupted
    # resume from the snapshot and run to completion
    resumed = simulate_pallas(m, cfg, seed=5, checkpoint_path=ckpt,
                              checkpoint_every=1, **kw)

    assert resumed.n_launched == ref.n_launched == cfg.n_photons
    assert resumed.n_steps == ref.n_steps
    for name in ("refl_r", "trans_r", "absorb_rz", "detector_xy",
                 "absorb_xyz"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(resumed, name))
        np.testing.assert_array_equal(a, b, err_msg=name)
    assert float(resumed.absorbed) == float(ref.absorbed)

    # a checkpoint from different arguments must be refused, not resumed
    fresh = simulate_pallas(m, cfg, seed=6, checkpoint_path=ckpt,
                            checkpoint_every=1, **kw)
    assert fresh.n_launched == cfg.n_photons
