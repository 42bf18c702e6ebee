"""Multi-chip scaling: photon/pixel batches over a device mesh.

The reference's only parallelism is shared-memory ``numba.prange`` over image
rows (src/path_tracing.py:266-270); there is no distributed backend at all
(SURVEY.md §2).  The TPU-native equivalent: a 1-D ``batch`` mesh axis,
photon/pixel lanes sharded across chips with ``shard_map``, the scene /
medium / material tables replicated, and tally partials reduced with
``jax.lax.psum`` over ICI.  Multi-host runs reuse the same code — the mesh
just spans hosts (DCN) after ``jax.distributed.initialize``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from light_transport_tpu.core.config import PhotonRunConfig, RenderConfig
from light_transport_tpu.scene.medium import LayeredMedium
from light_transport_tpu.scene.scene import Scene
from light_transport_tpu.tally.tallies import PhotonTallies

BATCH = "batch"


def make_mesh(n_devices: Optional[int] = None, axis: str = BATCH) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> Mesh:
    """Initialize multi-host execution and return the global mesh.

    On managed TPU pods ``jax.distributed.initialize()`` discovers the
    topology from the environment; the explicit arguments cover manual
    clusters.  The returned mesh spans all hosts — the same ``batch``-axis
    sharding code then scales over DCN with no further changes.
    """
    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        jax.distributed.initialize()
    return make_mesh()


def simulate_sharded(
    medium: LayeredMedium,
    cfg: PhotonRunConfig,
    key: jax.Array,
    mesh: Optional[Mesh] = None,
    lanes_per_device: int = 16384,
) -> PhotonTallies:
    """Photon run sharded over the mesh: each chip simulates an equal share
    of the photon quota with an independently folded key; tallies are
    psum-reduced over ICI so every chip returns the global result."""
    from light_transport_tpu.transport.photon import simulate_photons

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    share = cfg.n_photons // n_dev
    # device 0 absorbs the remainder so exactly n_photons launch in total
    rem = cfg.n_photons - share * n_dev

    def per_device(key):
        key = key.reshape(())
        idx = jax.lax.axis_index(BATCH)
        my_key = jax.random.fold_in(key, idx)
        my_quota = share + jnp.where(idx == 0, rem, 0)
        local_cfg_photons = int(share + rem)  # static upper bound per chip
        import dataclasses

        local_cfg = dataclasses.replace(cfg, n_photons=local_cfg_photons)
        tallies = _simulate_dynamic_quota(
            medium, local_cfg, my_key, my_quota, lanes_per_device
        )
        return jax.tree.map(lambda x: jax.lax.psum(x, BATCH), tallies)

    keys = jnp.broadcast_to(jax.random.key_data(key), (n_dev,) + jax.random.key_data(key).shape)
    fn = shard_map(
        lambda k: per_device(jax.random.wrap_key_data(k[0])),
        mesh=mesh,
        in_specs=P(BATCH),
        out_specs=P(),  # psum-reduced: replicated output
        check_vma=False,
    )
    return fn(keys)


def _simulate_dynamic_quota(medium, cfg, key, quota, lanes,
                            max_supersteps: int = 100_000):
    """simulate_photons with a traced (dynamic) quota — used per-shard.

    Runs entirely device-side (it executes under ``shard_map``, so the
    host-driven drain compaction of ``simulate_photons`` is unavailable);
    the round body is ``transport.photon._run_rounds`` itself, so the
    superstep loop contract (global-step uniform keying, the exact
    ``max_supersteps`` cap masking) lives in one place."""
    from light_transport_tpu.transport.photon import PhotonState, _run_rounds

    lanes = min(lanes, cfg.n_photons)
    round_len = max(1, cfg.steps_per_batch)

    state = PhotonState.dead(lanes)
    tallies = PhotonTallies.zeros(cfg)
    quota = quota.astype(jnp.int32)
    cap = jnp.asarray(max_supersteps, jnp.int32)

    def cond(carry):
        state, _, quota, step = carry
        return ((quota > 0) | jnp.any(state.alive)) & (step < cap)

    def round_body(carry):
        state, tallies, quota, step = carry
        return _run_rounds.__wrapped__(
            key, state, tallies, quota, step, medium, cfg, round_len, cap)

    _, tallies, _, _ = jax.lax.while_loop(
        cond, round_body, (state, tallies, quota, jnp.asarray(0, jnp.int32))
    )
    return tallies


def simulate_pallas_sharded(
    medium: LayeredMedium,
    cfg: PhotonRunConfig,
    seed: int,
    mesh: Optional[Mesh] = None,
    lanes_per_device: Optional[int] = None,
    k_steps: Optional[int] = None,
    chunk_blocks: int = 4,
    max_blocks: int = 200_000,
) -> PhotonTallies:
    """The fused Pallas photon engine composed with ``shard_map``: each chip
    runs the hardware-PRNG superstep kernel on its lane shard with an exact
    per-tile slice of the launch quota; per-chunk tally deltas psum over ICI.

    On a real TPU the kernel uses the hardware PRNG; on any other backend
    the engine transparently switches to threefry-fed interpret mode
    (ops/pallas/photon_kernel._make_kernel hw_prng=False), so the full
    shard_map + pallas_call composition — quota splitting across
    ``n_dev * n_tiles`` tiles, per-device seeds, psum'd tally deltas, the
    ``more`` reduction — executes and is chi²-tested on the virtual 8-CPU
    mesh (tests/test_sharding.py) and in the driver dryrun, in addition to
    bench.py's on-chip parity check every round.
    """
    from light_transport_tpu.ops.pallas.photon_kernel import (
        K_STEPS,
        LANES,
        ROWS,
        PallasPhotonEngine,
    )

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    lanes = lanes_per_device or ROWS * LANES * 16
    # don't over-provision lanes for small runs
    per_dev_photons = max(cfg.n_photons // n_dev, 1)
    lanes = min(lanes, max(ROWS * LANES,
                           (per_dev_photons // (ROWS * LANES)) * ROWS * LANES))
    eng = PallasPhotonEngine(medium, cfg, lanes, bench_mode=False,
                             k_steps=k_steps or K_STEPS)

    # exact integer split of the launch budget over every tile of the mesh
    total_tiles = n_dev * eng.n_tiles
    base = cfg.n_photons // total_tiles
    rem = cfg.n_photons - base * total_tiles
    assert base + 1 < 2 ** 24, "per-tile quota must stay exact in f32"
    quota = np.full((total_tiles, 1), base, np.float32)
    quota[:rem, 0] += 1.0

    def per_device(state, quota, seed0):
        idx = jax.lax.axis_index(BATCH)

        def body(carry, b):
            state, delta, quota = carry
            state, outs, counters = eng.run_block(
                state, seed0 + idx * 999_983 + b * 65_537, quota)
            delta = eng.accumulate(delta, outs, counters)
            quota = counters[:, 3:4]
            return (state, delta, quota), None

        delta = PhotonTallies.zeros(cfg)
        (state, delta, quota), _ = jax.lax.scan(
            body, (state, delta, quota),
            jnp.arange(chunk_blocks, dtype=jnp.int32))
        delta = jax.tree.map(lambda x: jax.lax.psum(x, BATCH), delta)
        more_local = (jnp.any(quota > 0) | jnp.any(state[6] > 0.0))
        more = jax.lax.psum(more_local.astype(jnp.float32), BATCH) > 0
        return state, delta, quota, more

    chunk = jax.jit(shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(BATCH), P(BATCH), P()),
        out_specs=(P(BATCH), P(), P(BATCH), P()),
        check_vma=False,
    ))

    zero = eng.zero_state()
    state = tuple(jnp.tile(a, (n_dev, 1)) for a in zero)  # (n_dev*rows, L)
    tallies = PhotonTallies.zeros(cfg)
    quota = jnp.asarray(quota)
    merge = jax.jit(lambda a, b: a.merge(b))  # one dispatch, not ~15 eager
    # pipelined host loop (same as simulate_pallas): dispatch chunk c+1
    # before forcing chunk c's `more`, hiding the tunnel round-trip; the one
    # extra all-dead chunk after drain contributes an exactly-zero delta
    prev_more = None
    for c in range(0, max_blocks, chunk_blocks):
        # mask into int32 range: unwrapped, c >= 32768 overflows the
        # jnp.asarray int32 conversion and crashes a long run mid-flight
        state, delta, quota, more = chunk(
            state, quota,
            jnp.asarray((seed + c * 65_537) & 0x7FFFFFFF, jnp.int32))
        tallies = merge(tallies, delta)
        if prev_more is not None and not bool(prev_more):
            break
        prev_more = more
    return tallies


def render_sharded(
    scene: Scene,
    cfg: RenderConfig,
    key: jax.Array,
    mesh: Optional[Mesh] = None,
    ray_chunk: Optional[int] = None,
):
    """Camera render with the lane population sharded over the mesh.

    Pixel/sample lanes are split across chips (pure data parallelism — rays
    are independent); the scene tables replicate.  Output image is gathered
    to every chip.

    The lane preamble is the shared :func:`path_tracer._camera_lanes`, so
    ``cfg.sampler`` (sobol QMC) and ``cfg.aperture`` (thin-lens DOF) apply
    here exactly as in the single-device render — and the pinhole/uniform
    default keeps its original key-split convention (bitwise-identical
    lanes to the unsharded render).
    """
    from light_transport_tpu.integrators.path_tracer import (
        _camera_lanes,
        trace_paths,
    )

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    n = cfg.height * cfg.width * cfg.spp
    pad = (-n) % n_dev

    origins, directions, uniforms = _camera_lanes(scene, cfg, key)
    if pad:
        z3 = jnp.zeros((pad, 3), origins.dtype)
        origins = jnp.concatenate([origins, z3])
        directions = jnp.concatenate(
            [directions, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], z3.dtype), (pad, 1))]
        )
        uniforms = jnp.concatenate(
            [uniforms, jnp.full((pad,) + uniforms.shape[1:], 0.5, uniforms.dtype)]
        )

    def per_device(o, d, u):
        radiance, _ = trace_paths(scene, cfg, o, d, u, ray_chunk=ray_chunk)
        return radiance

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(BATCH), P(BATCH), P(BATCH)),
        out_specs=P(BATCH),
        check_vma=False,
    )
    radiance = fn(origins, directions, uniforms)[:n]
    samples = jnp.moveaxis(
        radiance.reshape(cfg.spp, cfg.height, cfg.width, 3), 0, 2
    )
    return jnp.clip(jnp.mean(samples, axis=2), 0.0, 1.0)


def render_bdpt_sharded(
    scene: Scene,
    cfg: RenderConfig,
    key: jax.Array,
    mesh: Optional[Mesh] = None,
    ray_chunk: Optional[int] = None,
    light_tracing: bool = True,
):
    """BDPT render with camera AND light-subpath lanes sharded over the
    mesh (every (s, t) strategy, all three light-origin families:
    area / point / mixed).

    Lane uniforms are drawn at GLOBAL width with the single-device
    key-split sequence (``bdpt._bdpt_lane_uniforms``), so each lane's
    transport is bitwise-identical to the unsharded render.  Per-lane
    radiance shards over the batch axis like :func:`render_sharded`; the
    t=1 light-tracing splat plane is a per-device partial FILM that psums
    over ICI (summation order differs from the single-device scatter, so
    splat pixels match to float tolerance, not bitwise).  Lanes padded to
    a device multiple carry ``mask=False``: their radiance rows are
    sliced away and their light walks are barred from splatting."""
    from light_transport_tpu.integrators import bdpt as B

    mode, q_point = B._light_family(scene)
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    n = cfg.height * cfg.width * cfg.spp
    pad = (-n) % n_dev

    lanes = B._bdpt_lane_uniforms(scene, cfg, key, mode)
    if pad:
        def padlane(x):
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths)  # mask pads False, uniforms pad 0

        lanes = {k: padlane(v) for k, v in lanes.items()}
        # keep pad-lane camera rays well-formed (unit direction, away
        # from the film) — their output is masked/sliced regardless
        lanes["d"] = lanes["d"].at[n:].set(
            jnp.asarray([0.0, 0.0, 1.0], lanes["d"].dtype))

    def per_device(lane_shard):
        rad, splat = B._bdpt_body(scene, cfg, lane_shard, ray_chunk,
                                  light_tracing, mode, q_point)
        return rad, jax.lax.psum(splat, BATCH)

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(BATCH),),
        out_specs=(P(BATCH), P()),
        check_vma=False,
    )
    radiance, splat = fn(lanes)
    return B._bdpt_assemble(cfg, radiance[:n], splat)
