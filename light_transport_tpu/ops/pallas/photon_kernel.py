"""Fused Pallas photon-superstep kernel (the SURVEY.md §7 hard-part-6 work).

The XLA superstep (transport/photon.py) round-trips the full SoA state
through HBM once per hop and pays threefry for its uniforms.  This kernel
runs ``K_STEPS`` hop-drop-spin supersteps per invocation with the photon
state resident in VMEM, draws uniforms from the TPU hardware PRNG
(``pltpu.prng_random_bits``), and keeps every op branchless on the VPU.

Tally scatter is *deferred*: each lane emits one ``(flat_bin, weight)``
event per step into a dense output stream, and the host-side wrapper
scatter-adds the stream into the tally grids with one XLA scatter (measured
cheap).  Bin layout: ``[0, nr*nz)`` absorption, ``[nr*nz, nr*nz+nr)``
reflectance by exit radius, ``[+nr, +2nr)`` transmittance.

Physics is identical to transport/photon.superstep (same MCML hop/drop/
spin/Fresnel/roulette rules, same carried optical depth); the RNG stream
differs (hardware PRNG vs threefry), so results agree statistically, not
bitwise — the equivalence test is chi-squared, like every MC parity check.
Used by the benchmark and by ``simulate_pallas`` (per-tile launch quotas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from light_transport_tpu.core.config import PhotonRunConfig
from light_transport_tpu.scene.medium import LayeredMedium
from light_transport_tpu.tally.tallies import PhotonTallies

ROWS = 64  # sublanes per tile -> 64*128 = 8192 lanes per program
LANES = 128
K_STEPS = 16  # supersteps fused per kernel invocation

_TWO_NEG24 = float(2.0 ** -24)


def _u01(shape):
    """Uniform in [0, 1) from 24 high bits of the hardware PRNG.

    The raw bits arrive as int32; bitcast to uint32 before shifting or the
    arithmetic shift sign-extends and half the uniforms land in [-0.5, 0).
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # logical shift in uint32, then reinterpret as int32 (< 2^24, so always
    # non-negative) — Mosaic has no uint32->f32 cast
    hi24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return hi24.astype(jnp.float32) * _TWO_NEG24


def _gather_layer(table, layer, num_layers):
    """Select-chain gather from a tiny per-layer table (static L)."""
    out = jnp.full(layer.shape, table[0], jnp.float32)
    for l in range(1, num_layers):
        out = jnp.where(layer == l, table[l], out)
    return out


def _make_kernel(medium_host: dict, cfg: PhotonRunConfig, bench_mode: bool,
                 k_steps: int = K_STEPS):
    """Bake the (tiny, static) medium tables into the kernel as constants."""
    num_layers = len(medium_host["mu_t"])
    mu_t = tuple(float(x) for x in medium_host["mu_t"])
    mu_a = tuple(float(x) for x in medium_host["mu_a"])
    g_tab = tuple(float(x) for x in medium_host["g"])
    n_tab = tuple(float(x) for x in medium_host["n"])
    z_top = tuple(float(x) for x in medium_host["z_top"])
    z_bot = tuple(float(x) for x in medium_host["z_bot"])
    n_above = float(medium_host["n_above"])
    n_below = float(medium_host["n_below"])
    # launch specular reflection (normal incidence)
    r_sp = ((n_above - n_tab[0]) / (n_above + n_tab[0])) ** 2
    w0 = 1.0 - r_sp
    nr, nz = cfg.nr, cfg.nz
    inv_dr, inv_dz = 1.0 / cfg.dr, 1.0 / cfg.dz
    absorb_bins = nr * nz
    wthresh = cfg.weight_threshold
    rr_surv = cfg.rr_survive

    def tab(vals, layer):
        out = jnp.full(layer.shape, vals[0], jnp.float32)
        for l in range(1, num_layers):
            out = jnp.where(layer == l, vals[l], out)
        return out

    nx_det = cfg.detector_nx
    det_half = cfg.detector_extent
    det_scale = (nx_det / (2.0 * det_half)) if nx_det > 0 else 0.0

    def kernel(seed_ref, quota_ref, px, py, pz, dx, dy, dz, w_ref, tau_ref,
               layer_ref, opx, opy, opz, odx, ody, odz, ow, otau, olayer,
               bins_ref, vals_ref, det_bins_ref, det_vals_ref, counters_ref):
        pid = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + pid * 7919)

        launched = jnp.zeros((), jnp.float32)
        spec = jnp.zeros((), jnp.float32)
        steps = jnp.zeros((), jnp.float32)
        absorbed = jnp.zeros((), jnp.float32)
        quota = quota_ref[pid, 0]  # per-tile launch budget (f32)

        x, y, z = px[:], py[:], pz[:]
        ux, uy, uz = dx[:], dy[:], dz[:]
        w, tau = w_ref[:], tau_ref[:]
        layer = layer_ref[:]

        for step in range(k_steps):
            # ---- respawn dead lanes (w == 0 marks dead) --------------------
            dead = w <= 0.0
            if bench_mode:
                can = dead
                n_r = jnp.sum(can.astype(jnp.float32))
            else:
                # per-tile quota: 1-based rank of each dead lane (row-major).
                # cumsum has no Pallas TPU lowering, so the prefix sums run
                # as triangular matmuls on the MXU (triangles built from
                # iota compares — captured constants aren't allowed).
                df = dead.astype(jnp.float32)
                triu = (
                    jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
                    <= jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
                ).astype(jnp.float32)
                tril_strict = (
                    jax.lax.broadcasted_iota(jnp.int32, (ROWS, ROWS), 0)
                    > jax.lax.broadcasted_iota(jnp.int32, (ROWS, ROWS), 1)
                ).astype(jnp.float32)
                lane_cum = jnp.dot(df, triu,
                                   preferred_element_type=jnp.float32)
                row_tot = lane_cum[:, LANES - 1:LANES]
                row_prefix = jnp.dot(tril_strict, row_tot,
                                     preferred_element_type=jnp.float32)
                order = lane_cum + row_prefix
                can = dead & (order <= quota)
                n_r = jnp.sum(can.astype(jnp.float32))
                quota = quota - n_r
            x = jnp.where(can, 0.0, x)
            y = jnp.where(can, 0.0, y)
            z = jnp.where(can, 0.0, z)
            ux = jnp.where(can, 0.0, ux)
            uy = jnp.where(can, 0.0, uy)
            uz = jnp.where(can, 1.0, uz)
            w = jnp.where(can, w0, w)
            tau = jnp.where(can, 0.0, tau)
            layer = jnp.where(can, 0, layer)
            launched += n_r
            spec += n_r * r_sp
            alive = w > 0.0
            steps += jnp.sum(alive.astype(jnp.float32))

            u_tau = _u01(x.shape)
            u_hg = _u01(x.shape)
            u_phi = _u01(x.shape)
            u_fr = _u01(x.shape)
            u_rr = _u01(x.shape)

            # ---- hop -------------------------------------------------------
            mu_t_l = tab(mu_t, layer)
            mu_a_l = tab(mu_a, layer)
            g_l = tab(g_tab, layer)
            tau_new = jnp.where(tau > 0.0, tau, -jnp.log1p(-u_tau))
            s = tau_new / jnp.maximum(mu_t_l, 1e-12)
            zb = jnp.where(uz > 0.0, tab(z_bot, layer), tab(z_top, layer))
            safe_uz = jnp.where(jnp.abs(uz) < 1e-12, 1.0, uz)
            db = jnp.where(jnp.abs(uz) < 1e-12, jnp.inf,
                           jnp.maximum((zb - z) / safe_uz, 0.0))
            hits_b = alive & (db < s)
            dist = jnp.minimum(s, db)
            x = jnp.where(alive, x + ux * dist, x)
            y = jnp.where(alive, y + uy * dist, y)
            z = jnp.where(alive, z + uz * dist, z)
            tau = jnp.where(hits_b, tau_new - db * mu_t_l, 0.0)

            # grid bin of the event position
            r = jnp.sqrt(x * x + y * y)
            ir = jnp.clip((r * inv_dr).astype(jnp.int32), 0, nr - 1)
            iz = jnp.clip((z * inv_dz).astype(jnp.int32), 0, nz - 1)

            # ---- drop + spin (scatter lanes) --------------------------------
            scat = alive & ~hits_b
            dw = jnp.where(scat, w * mu_a_l / jnp.maximum(mu_t_l, 1e-12), 0.0)
            w = w - dw
            absorbed += jnp.sum(dw)

            g_safe = jnp.where(jnp.abs(g_l) < 1e-3, 1.0, g_l)
            frac = (1.0 - g_l * g_l) / (1.0 - g_l + 2.0 * g_l * u_hg)
            cos_t = jnp.clip(
                jnp.where(
                    jnp.abs(g_l) < 1e-3,
                    2.0 * u_hg - 1.0,
                    (1.0 + g_l * g_l - frac * frac) / (2.0 * g_safe),
                ),
                -1.0, 1.0,
            )
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
            phi = 2.0 * np.pi * u_phi
            cp, sp = jnp.cos(phi), jnp.sin(phi)
            # rotate about current direction (branchless frame)
            sgn = jnp.where(uz >= 0.0, 1.0, -1.0)
            a = -1.0 / (sgn + uz)
            b = ux * uy * a
            t1x = 1.0 + sgn * ux * ux * a
            t1y = sgn * b
            t1z = -sgn * ux
            t2x = b
            t2y = sgn + uy * uy * a
            t2z = -uy
            ndx = sin_t * cp * t1x + sin_t * sp * t2x + cos_t * ux
            ndy = sin_t * cp * t1y + sin_t * sp * t2y + cos_t * uy
            ndz = sin_t * cp * t1z + sin_t * sp * t2z + cos_t * uz

            # roulette after drop
            low = scat & (w < wthresh)
            surv = u_rr < rr_surv
            w = jnp.where(low & surv, w / rr_surv, w)
            w = jnp.where(low & ~surv, 0.0, w)

            # ---- boundary lanes ---------------------------------------------
            going_down = uz > 0.0
            next_layer = jnp.where(going_down, layer + 1, layer - 1)
            n1 = tab(n_tab, layer)
            n2 = jnp.full(layer.shape, n_above, jnp.float32)
            for l in range(num_layers):
                n2 = jnp.where(next_layer == l, n_tab[l], n2)
            n2 = jnp.where(next_layer < 0, n_above, n2)
            n2 = jnp.where(next_layer >= num_layers, n_below, n2)
            cos_i = jnp.abs(uz)
            sin_t2 = (n1 / n2) ** 2 * (1.0 - cos_i * cos_i)
            tir = sin_t2 >= 1.0
            cos_tr = jnp.sqrt(jnp.maximum(1.0 - sin_t2, 0.0))
            rs = (n1 * cos_i - n2 * cos_tr) / jnp.maximum(
                n1 * cos_i + n2 * cos_tr, 1e-12)
            rp = (n1 * cos_tr - n2 * cos_i) / jnp.maximum(
                n1 * cos_tr + n2 * cos_i, 1e-12)
            refl_p = jnp.where(tir, 1.0, jnp.clip(0.5 * (rs * rs + rp * rp),
                                                  0.0, 1.0))
            do_refl = u_fr < refl_p
            exits = hits_b & ~do_refl & (
                (next_layer < 0) | (next_layer >= num_layers))
            exit_top = exits & ~going_down
            transmit_in = hits_b & ~do_refl & ~exits
            eta = n1 / n2

            # ---- merge direction / layer / weight ---------------------------
            ux = jnp.where(scat, ndx, jnp.where(hits_b & ~do_refl, ux * eta, ux))
            uy = jnp.where(scat, ndy, jnp.where(hits_b & ~do_refl, uy * eta, uy))
            new_uz_b = jnp.where(do_refl, -uz, jnp.sign(uz) * cos_tr)
            uz = jnp.where(scat, ndz, jnp.where(hits_b, new_uz_b, uz))
            layer = jnp.where(transmit_in, next_layer, layer)

            # tally event stream: absorb OR exit per lane
            flat = jnp.where(
                scat, ir * nz + iz,
                jnp.where(exit_top, absorb_bins + ir,
                          absorb_bins + nr + ir))
            val = jnp.where(scat, dw, jnp.where(exits, w, 0.0))
            bins_ref[step] = jnp.where(val > 0, flat, 0)
            vals_ref[step] = val
            if nx_det > 0:
                ix = jnp.clip(((x + det_half) * det_scale).astype(jnp.int32),
                              0, nx_det - 1)
                iy = jnp.clip(((y + det_half) * det_scale).astype(jnp.int32),
                              0, nx_det - 1)
                det_bins_ref[step] = jnp.where(exit_top, ix * nx_det + iy, 0)
                det_vals_ref[step] = jnp.where(exit_top, w, 0.0)
            elif step == 0:
                # detector disabled: the streams are 1-step placeholders
                det_bins_ref[0] = jnp.zeros_like(flat)
                det_vals_ref[0] = jnp.zeros_like(val)
            w = jnp.where(exits, 0.0, w)  # lane dies on exit

            # nudge off the interface
            z = jnp.where(hits_b & (w > 0.0), z + jnp.sign(uz) * 1e-6, z)

        opx[:] = x
        opy[:] = y
        opz[:] = z
        odx[:] = ux
        ody[:] = uy
        odz[:] = uz
        ow[:] = w
        otau[:] = tau
        olayer[:] = layer
        counters_ref[pid, 0] = launched
        counters_ref[pid, 1] = spec
        counters_ref[pid, 2] = steps
        counters_ref[pid, 3] = quota
        counters_ref[pid, 4] = absorbed

    return kernel


class PallasPhotonEngine:
    """Wraps the fused kernel: state management + deferred tally scatter."""

    def __init__(self, medium: LayeredMedium, cfg: PhotonRunConfig,
                 lanes: int, bench_mode: bool = True,
                 k_steps: int = K_STEPS):
        assert lanes % (ROWS * LANES) == 0, (lanes, ROWS * LANES)
        self.cfg = cfg
        self.lanes = lanes
        self.n_tiles = lanes // (ROWS * LANES)
        self.bench_mode = bench_mode
        self.k_steps = k_steps
        med = {
            "mu_t": np.asarray(medium.mu_t), "mu_a": np.asarray(medium.mu_a),
            "g": np.asarray(medium.g), "n": np.asarray(medium.n),
            "z_top": np.asarray(medium.z_top), "z_bot": np.asarray(medium.z_bot),
            "n_above": np.asarray(medium.n_above),
            "n_below": np.asarray(medium.n_below),
        }
        self.kernel = _make_kernel(med, cfg, bench_mode, k_steps)
        self.total_bins = cfg.nr * cfg.nz + 2 * cfg.nr

    def zero_state(self):
        shape = (self.n_tiles * ROWS, LANES)
        z = jnp.zeros(shape, jnp.float32)
        return (z, z, z, z, z, z + 1.0, z, z, jnp.zeros(shape, jnp.int32))

    @functools.partial(jax.jit, static_argnums=0)
    def run_block(self, state, seed, quota_per_tile):
        """k_steps supersteps. Returns (state, events, counters) where
        events = (bins, vals, det_bins, det_vals) streams."""
        n_rows = self.n_tiles * ROWS
        px, py, pz, dx, dy, dz, w, tau, layer = state
        row_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        det_steps = self.k_steps if self.cfg.detector_nx > 0 else 1
        out_specs = (
            [row_spec] * 8
            + [pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)]
            + [
                pl.BlockSpec((self.k_steps, ROWS, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((self.k_steps, ROWS, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((det_steps, ROWS, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((det_steps, ROWS, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ]
        )
        f32 = jnp.float32
        out_shape = (
            [jax.ShapeDtypeStruct((n_rows, LANES), f32)] * 8
            + [jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32)]
            + [
                jax.ShapeDtypeStruct((self.k_steps, n_rows, LANES), jnp.int32),
                jax.ShapeDtypeStruct((self.k_steps, n_rows, LANES), f32),
                jax.ShapeDtypeStruct((det_steps, n_rows, LANES), jnp.int32),
                jax.ShapeDtypeStruct((det_steps, n_rows, LANES), f32),
                jax.ShapeDtypeStruct((self.n_tiles, 5), f32),
            ]
        )
        in_specs = (
            [
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ]
            + [row_spec] * 8
            + [pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)]
        )
        quota_arr = jnp.broadcast_to(
            jnp.asarray(quota_per_tile, jnp.float32).reshape(-1, 1),
            (self.n_tiles, 1),
        ) if jnp.ndim(quota_per_tile) == 0 else quota_per_tile
        outs = pl.pallas_call(
            self.kernel,
            grid=(self.n_tiles,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
        )(
            jnp.asarray([seed], jnp.int32),
            quota_arr,
            px, py, pz, dx, dy, dz, w, tau, layer,
        )
        new_state = outs[:9]
        bins, vals = outs[9], outs[10]
        det_bins, det_vals = outs[11], outs[12]
        counters = outs[13]
        return new_state, (bins, vals, det_bins, det_vals), counters

    def accumulate(self, tallies: PhotonTallies, events, counters):
        bins, vals, det_bins, det_vals = events
        flat = jnp.zeros((self.total_bins,), jnp.float32)
        flat = flat.at[bins.reshape(-1)].add(vals.reshape(-1))
        if self.cfg.detector_nx > 0:
            nx = self.cfg.detector_nx
            det = jnp.zeros((nx * nx,), jnp.float32)
            det = det.at[det_bins.reshape(-1)].add(det_vals.reshape(-1))
            tallies = tallies.replace(
                detector_xy=tallies.detector_xy + det.reshape(nx, nx)
            )
        nrnz = self.cfg.nr * self.cfg.nz
        return tallies.replace(
            absorb_rz=tallies.absorb_rz + flat[:nrnz].reshape(
                self.cfg.nr, self.cfg.nz),
            refl_r=tallies.refl_r + flat[nrnz:nrnz + self.cfg.nr],
            trans_r=tallies.trans_r + flat[nrnz + self.cfg.nr:],
            launched=tallies.launched + counters[:, 0].sum(),
            specular=tallies.specular + counters[:, 1].sum(),
            steps=tallies.steps + counters[:, 2].sum(),
            absorbed=tallies.absorbed + counters[:, 4].sum(),
        )


def bench_pallas(medium: LayeredMedium, cfg: PhotonRunConfig, seed: int,
                 lanes: int, n_blocks: int, k_steps: int = K_STEPS):
    """Throughput run: n_blocks * k_steps supersteps with free respawn."""
    eng = PallasPhotonEngine(medium, cfg, lanes, bench_mode=True,
                             k_steps=k_steps)

    @jax.jit
    def run(seed0):
        state = eng.zero_state()
        tallies = PhotonTallies.zeros(cfg)

        def body(carry, b):
            state, tallies = carry
            state, events, counters = eng.run_block(
                state, seed0 + b * 65537, jnp.inf
            )
            tallies = eng.accumulate(tallies, events, counters)
            return (state, tallies), None

        (state, tallies), _ = jax.lax.scan(
            body, (state, tallies), jnp.arange(n_blocks, dtype=jnp.int32)
        )
        return tallies

    return run(seed)


def simulate_pallas(medium: LayeredMedium, cfg: PhotonRunConfig, seed: int,
                    lanes: int = ROWS * LANES * 16,
                    max_blocks: int = 50_000,
                    k_steps: int = K_STEPS):
    """Unbiased run of cfg.n_photons via per-tile launch quotas.

    Host-driven block loop: each block is one jitted kernel call plus the
    tally fold; the termination check (quota drained and all lanes dead)
    reads two scalars back per block.  Wrapping the loop in a device-side
    while_loop triggers pathologically slow XLA/Mosaic compiles, and the
    ~10 ms/block dispatch overhead is irrelevant for an unbiased runner.
    """
    lanes = min(lanes, max(ROWS * LANES,
                           (cfg.n_photons // (ROWS * LANES)) * ROWS * LANES))
    eng = PallasPhotonEngine(medium, cfg, lanes, bench_mode=False,
                             k_steps=k_steps)
    base = cfg.n_photons // eng.n_tiles
    rem = cfg.n_photons - base * eng.n_tiles
    quota = np.full((eng.n_tiles, 1), base, np.float32)
    quota[:rem, 0] += 1.0  # exact integer split of the launch budget

    @jax.jit
    def block(state, tallies, quota, seed0):
        state, events, counters = eng.run_block(state, seed0, quota)
        tallies = eng.accumulate(tallies, events, counters)
        quota = counters[:, 3:4]
        alive = jnp.any(state[6] > 0.0)
        more = jnp.any(quota > 0) | alive
        return state, tallies, quota, more

    state = eng.zero_state()
    tallies = PhotonTallies.zeros(cfg)
    quota = jnp.asarray(quota)
    for b in range(max_blocks):
        state, tallies, quota, more = block(
            state, tallies, quota, seed + b * 65537
        )
        if not bool(more):
            break
    return tallies
