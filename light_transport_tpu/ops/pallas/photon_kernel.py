"""Fused Pallas photon-superstep kernel (the SURVEY.md §7 hard-part-6 work).

The XLA superstep (transport/photon.py) round-trips the full SoA state
through HBM once per hop and pays threefry for its uniforms.  This kernel
runs ``k_steps`` hop-drop-spin supersteps per invocation with the photon
state resident in VMEM, draws uniforms from the TPU hardware PRNG
(``pltpu.prng_random_bits``), and keeps every op branchless on the VPU.

Physics is identical to transport/photon.superstep (same MCML hop/drop/
spin/Fresnel/roulette rules, same carried optical depth); the RNG stream
differs (hardware PRNG vs threefry), so results agree statistically, not
bitwise — the equivalence test is chi-squared, like every MC parity check
(tests/test_pallas_engine.py).

Tally architecture (v2 — what closed the round-1 58x gap between bench-mode
and unbiased throughput):

* **Respawn at block start only** (quota mode).  Round 1 ranked dead lanes
  against the launch quota every step via MXU prefix-sum matmuls; once per
  ``k_steps`` amortizes that to noise.  Lanes that die mid-block idle until
  the next block — a few percent occupancy for typical lifetimes of
  hundreds of steps (and ``steps`` counts only live lanes, so the metric
  stays honest).
* **Exit records, not exit streams.**  With block-start respawn a lane can
  exit at most once per block, so exits (diffuse reflectance/transmittance
  by radius + the cartesian detector image) are one ``(bin, weight)``
  record per lane per block instead of one stream slot per lane per STEP —
  ~k_steps x fewer scattered events, and exits stay exact at every step.
* **Strided absorption streams.**  The (r,z) grid and the 3-D fluence
  volume are deposited every ``cfg.tally_stride``-th superstep with the
  deposit scaled by the stride — statistically unbiased (stratified
  thinning of the per-step deposit sequence), while the scalar ``absorbed``
  accumulator and the photon weights remain exact every step.  Stride 1
  reproduces the MCML convention bit-for-bit in expectation and is the
  default for parity runs.
* **Histogram accumulation on the MXU.**  XLA scatter-add sustains only
  ~0.15 G events/s on v5e; a factorized one-hot matmul histogram
  (``A += onehot(ir)^T @ (w * onehot(iz))``) is ~10x faster for grids up
  to ~16k bins (measured), so the host-side fold picks matmul or scatter
  by grid size.
* **Exact counters.** Per-tile per-block event counts are < 2^24 (exact in
  f32); the fold into the global tally uses the two-word counters from
  tally/tallies.py, so ``launched``/``steps`` are exact at any scale (the
  round-1 f32 counters recorded 99,999,952 of 1e8 launches).
"""

from __future__ import annotations

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from light_transport_tpu.core.config import PhotonRunConfig
from light_transport_tpu.scene.medium import LayeredMedium
from light_transport_tpu.tally.tallies import (
    PhotonTallies,
    counter_from_sum,
    counter_merge,
    counter_value,
)

ROWS = 64  # sublanes per tile -> 64*128 = 8192 lanes per program
LANES = 128
K_STEPS = 32  # supersteps fused per kernel invocation

_TWO_NEG24 = float(2.0 ** -24)

# matmul-histogram threshold: factorized one-hot beats XLA scatter-add up to
# roughly this many bins (measured on v5e: 3 ms vs 28 ms at 4M events, 64x64)
_HIST_MM_MAX_BINS = 16384

# events per one-hot matmul pass: the (E, n0) and (E, 128) one-hot factors
# materialize, so an unbounded E OOMs HBM (a stride-1 stream at 32 tiles is
# ~17M events -> ~10 GB of f32 one-hots).  2^21 events bounds the factor
# temporaries at ~1.3 GB while keeping per-pass fixed costs amortized.
_HIST_MM_CHUNK = 1 << 21


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


def _n_draws(k_steps: int, bench_mode: bool, vol_phase: bool = False) -> int:
    """Uniforms consumed per lane per block (5 per superstep + the strided-
    deposit phase draw(s) in quota mode) — the off-TPU fallback pre-draws
    exactly this many with threefry."""
    if bench_mode:
        return 5 * k_steps
    return 5 * k_steps + 1 + (1 if vol_phase else 0)


def _onehot_pair_flush(acc_ref, ib, jb, vals, ni: int, nj_pad: int,
                       scratch=None):
    """acc_ref[(ni, nj_pad)] += 2-D histogram of per-lane (ib, jb, vals).

    The scatter that XLA would emit costs ~10 ns/entry (PERF.md fold
    attribution); here each (ROWS, LANES) tile row becomes two one-hot
    factors contracted on the MXU: ``acc += onehot_i(ib_row) @
    (vals_row * onehot_j(jb_row))^T`` — nr*LANES*nz MACs per row, ~40x
    cheaper than the scatter at full-scale grids.  bf16 one-hots are
    exact; the value factor is split hi/lo into two bf16 passes so the
    product is accurate to ~2^-16 relative (the f32 VMEM accumulator
    then carries exact sums).  Lanes with vals == 0 contribute nothing,
    so unset/pending-empty lanes need no masking.

    Cost shape (measured r4, full_scale rz grid, per k=128 block at 64
    tiles): this per-row form measures 10.5 ms — VPU-bound on factor
    construction (~5.6) + accumulator adds (~4.4), MXU ~5.6 partially
    hidden.  Four "improvements" measured SLOWER or neutral and were
    reverted; kept as notes so they aren't re-tried blind:
    - i-blocked occupancy masking via @pl.when: +1.4 ms (conditional
      regions break the software pipelining; acc slices round-trip VMEM);
    - packing 8 rows into one K=1024 dot via bf16 VMEM scratch: +1.0 ms
      (the dot reads the same scratch the next group's build overwrites —
      a WAR hazard that serializes build against contraction);
    - packing via in-register (8,128)->(1,1024) reshape of the RECORDS
      (no scratch staging): rz unchanged (10.65 vs 10.5 same-phase), the
      small exit flush +1.2 ms — the sublane-to-lane relayout costs what
      the 7/8 fewer accumulator adds save;
    - lax.fori unroll of the step loop (1 vs 32): no change.
    """
    si_ref, sj_ref, sv_ref = scratch[:3]
    si_ref[:], sj_ref[:], sv_ref[:] = ib, jb, vals
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (ni, LANES), 0)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (nj_pad, LANES), 0)
    dn = (((1,), (1,)), ((), ()))  # contract the lane dim of both factors
    group = 8  # f32/i32 sublane tile height — keeps dynamic slices aligned

    def row_group(g, acc):
        ib_g = si_ref[pl.ds(g * group, group), :]
        jb_g = sj_ref[pl.ds(g * group, group), :]
        v_g = sv_ref[pl.ds(g * group, group), :]
        # hi/lo value split once per group; the per-row selects run in f32
        # layout (a bool mask against an i32-tiled iota cannot feed a
        # bf16-layout select — Mosaic rejects the (8,128)->(16,128)
        # relayout) and convert after (both halves are exactly bf16)
        vhi_g = v_g.astype(jnp.bfloat16).astype(jnp.float32)
        vlo_g = v_g - vhi_g
        for r in range(group):
            a = (iota_i == ib_g[r:r + 1, :]).astype(jnp.bfloat16)
            m = iota_j == jb_g[r:r + 1, :]
            v_hi = jnp.where(m, vhi_g[r:r + 1, :], 0.0).astype(jnp.bfloat16)
            v_lo = jnp.where(m, vlo_g[r:r + 1, :], 0.0).astype(jnp.bfloat16)
            p = jax.lax.dot_general(a, v_hi, dn,
                                    preferred_element_type=jnp.float32)
            p = p + jax.lax.dot_general(a, v_lo, dn,
                                        preferred_element_type=jnp.float32)
            acc = acc + p
        return acc

    acc = jax.lax.fori_loop(0, ROWS // group, row_group,
                            jnp.zeros((ni, nj_pad), jnp.float32))
    acc_ref[:] = acc_ref[:] + acc


def _flush_group(acc_ref, ir_ref, iz_ref, v_ref, g, ni: int, nj_pad: int):
    """One 8-row group of the rz one-hot flush, reading STAGED records
    from persistent VMEM scratch — the unit of the r5 interleaved flush
    (VERDICT r4 item 3 / BACKLOG): window ``wi-1``'s records are flushed
    one group at a time between window ``wi``'s step chunks, so the
    flush's MXU contractions overlap the step loop's VPU physics instead
    of serializing after it.  Identical math to one ``row_group`` of
    :func:`_onehot_pair_flush` (same bf16 hi/lo split, f32 accumulator);
    only the accumulation ORDER into ``acc_ref`` differs (per-group adds
    instead of one block add), a pure f32 re-association."""
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (ni, LANES), 0)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (nj_pad, LANES), 0)
    dn = (((1,), (1,)), ((), ()))
    group = 8
    ib_g = ir_ref[pl.ds(g * group, group), :]
    jb_g = iz_ref[pl.ds(g * group, group), :]
    v_g = v_ref[pl.ds(g * group, group), :]
    vhi_g = v_g.astype(jnp.bfloat16).astype(jnp.float32)
    vlo_g = v_g - vhi_g
    acc = None
    for r in range(group):
        a = (iota_i == ib_g[r:r + 1, :]).astype(jnp.bfloat16)
        m = iota_j == jb_g[r:r + 1, :]
        v_hi = jnp.where(m, vhi_g[r:r + 1, :], 0.0).astype(jnp.bfloat16)
        v_lo = jnp.where(m, vlo_g[r:r + 1, :], 0.0).astype(jnp.bfloat16)
        p = jax.lax.dot_general(a, v_hi, dn,
                                preferred_element_type=jnp.float32)
        p = p + jax.lax.dot_general(a, v_lo, dn,
                                    preferred_element_type=jnp.float32)
        acc = p if acc is None else acc + p
    acc_ref[:] = acc_ref[:] + acc


def _make_kernel(medium_host: dict, cfg: PhotonRunConfig, bench_mode: bool,
                 k_steps: int = K_STEPS, stride: int = 1,
                 vol_stride: int = 0, hw_prng: bool = True,
                 unroll: int = 1,
                 rz_mm: bool = False, nz_pad: int = 0,
                 det_mm: bool = False, det_pad: int = 0,
                 ex_mm: bool = False,
                 ablate: frozenset = frozenset(),
                 interleave: bool = False):
    """Bake the (tiny, static) medium tables into the kernel as constants.

    ``hw_prng=False`` is the off-TPU fallback (VERDICT.md r2 item 1): the
    kernel draws its uniforms from an extra input ref filled with threefry
    samples instead of ``pltpu.prng_random_bits`` (which has no CPU
    lowering), so the identical kernel body — and the shard_map composition
    around it — executes under ``pallas_call(..., interpret=True)`` on the
    virtual CPU mesh."""
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
    # derived per-layer tables baked at trace time: the VPU-bound step loop
    # (PERF.md §block-count asymptote) replaces per-step divides with table
    # lookups — 1/mu_t (hop length), mu_a/mu_t (drop fraction), the HG
    # constants, and eta = n1/n2 for each crossing direction (which also
    # lets rs/rp be computed in the eta-normalized form, dropping the n2
    # select chain entirely)
    inv_mu_t = tuple(1.0 / max(m, 1e-12) for m in mu_t)
    albedo_a = tuple(a / max(m, 1e-12) for a, m in zip(mu_a, mu_t))
    one_m_g2 = tuple(1.0 - gg * gg for gg in g_tab)
    one_p_g2 = tuple(1.0 + gg * gg for gg in g_tab)
    inv_2g = tuple(0.5 / (1.0 if abs(gg) < 1e-3 else gg) for gg in g_tab)

    def _n_of(l):
        if l < 0:
            return n_above
        if l >= num_layers:
            return n_below
        return n_tab[l]

    eta_dn = tuple(n_tab[l] / _n_of(l + 1) for l in range(num_layers))
    eta_up = tuple(n_tab[l] / _n_of(l - 1) for l in range(num_layers))
    nr, nz = cfg.nr, cfg.nz
    inv_dr, inv_dz = 1.0 / cfg.dr, 1.0 / cfg.dz
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
    vol_on = cfg.vol_nx > 0
    inv_vdx = 1.0 / cfg.vol_dx
    inv_vdy = 1.0 / cfg.vol_dy
    inv_vdz = 1.0 / cfg.vol_dz
    vol_stride = vol_stride or stride
    sep_vol_phase = vol_on and (vol_stride != stride)
    # --- slim windowed mode (rz_mm) step-body shape -------------------------
    # In the windowed mode every per-step tally op that can move to a window
    # or block boundary does (r4; PERF.md §per-step diet): deposits carry
    # *positions* (4 selects) instead of computing sqrt/clip/cast bins every
    # step; exits carry a death code (2 selects) with exit/detector bins
    # computed once per block from the frozen death position; the
    # steps/absorbed counters accumulate elementwise and reduce once per
    # block.  Deposit steps, positions and RNG order are identical to the
    # flat stream path, so grids match it bitwise (bins) / to bf16-split
    # precision (rz one-hot fold) — pinned by
    # tests/test_photon.py::test_mxu_histogram_accumulation_equivalent.
    slim = rz_mm
    # vol deposit selection inside the stride-window loop: with
    # vol_stride == stride the vol deposit IS the rz deposit (same phase
    # draw); with an integral ratio R the flat path's
    # ``phase_v == step % vol_stride`` splits exactly into
    # ``(phase_v // stride == wi % R) & (phase_v % stride == si)``;
    # otherwise (non-integral ratio — never produced by the presets) the
    # legacy per-step stream write stays
    vol_shared = vol_on and not sep_vol_phase
    vol_windowed = vol_on and sep_vol_phase and (vol_stride % stride == 0)
    vol_legacy = vol_on and sep_vol_phase and (vol_stride % stride != 0)
    vol_ratio = (vol_stride // stride) if vol_windowed else 1
    # ``ablate`` (measurement only, quota windowed mode): skip recording +
    # folding the named components so their costs can be measured one at a
    # time on hardware (scripts/bench_quota_ablation.py) — physics,
    # counters and RNG order are unchanged
    ab_rz = "rz" in ablate
    ab_det = "det" in ablate
    ab_vol = "vol" in ablate
    ab_exits = "exits" in ablate
    # interleaved rz flush (r5): stage each window's deposit records in
    # persistent VMEM scratch and flush them during the NEXT window, one
    # 8-row group per step chunk — the flush's MXU contractions and
    # factor builds overlap the step loop instead of serializing after it.
    # Requires the stride to split evenly into ROWS//8 chunks.
    inter_rz = (bool(interleave) and rz_mm and not ab_rz
                and k_steps % stride == 0 and stride % (ROWS // 8) == 0)
    # per-window respawn (cfg.respawn_windows): quota-ranked respawn of
    # roulette/absorption-dead lanes every N stride windows.  Lanes that
    # died by EXIT stay dead until block end, so the once-per-block
    # exit/detector record semantics (and their single flush) survive —
    # flushing exits per window instead measured +13 ms/block (the 512²
    # detector one-hot is ~3 ms per flush), eating the occupancy win.
    respawn_w = int(cfg.respawn_windows) if (slim and not bench_mode) else 0
    # NOTE (r4, measured and REVERTED — do not re-try blind): recovering
    # the exit-dead lanes' idle time (occupancy 0.789 -> 0.860 at 5e7)
    # via saved exit slots LOSES on net.  Two variants, same-phase A/B at
    # the full_scale preset:
    # - in-window respawn every N steps via lax.cond in the step loop:
    #   +5.6 ms/block STATIC (the cond breaks Mosaic's software
    #   pipelining; N=8 and N=16 cost identically) -> steady -8%;
    # - window-boundary-only respawn with two-slot exit records (3 extra
    #   (64,128) loop carries + ~6 selects/step + doubled ex/det flush,
    #   no cond): +4.6 ms/block (register pressure in the register-bound
    #   step loop) -> steady -5.5%.
    # The exit-record position must freeze SOMEWHERE until the block
    # flush, and every place to put it costs more than the 7% occupancy
    # it buys.

    def kernel_body(seed_ref, quota_ref, u_ref, px, py, pz, dx, dy, dz,
                    w_ref, tau_ref, layer_ref, opx, opy, opz, odx, ody, odz,
                    ow, otau, olayer,
                    exit_bin_ref, exit_val_ref, det_bin_ref, det_val_ref,
                    rz_bins_ref, rz_vals_ref, vol_bins_ref, vol_vals_ref,
                    *tail_refs):
        # trailing refs: optional MXU-histogram accumulators, counters,
        # then (in mm mode) 3 VMEM scratch rows shared by the flushes —
        # Mosaic can't dynamic_slice values, so the flush row loop reads
        # its 8-row groups back out of a ref
        t_i = 0
        rz_acc_ref = det_acc_ref = ex_acc_ref = mm_scratch = None
        if rz_mm:
            rz_acc_ref = tail_refs[t_i]
            t_i += 1
        if det_mm:
            det_acc_ref = tail_refs[t_i]
            t_i += 1
        if ex_mm:
            ex_acc_ref = tail_refs[t_i]
            t_i += 1
        counters_ref = tail_refs[t_i]
        pend_scr = None
        if rz_mm or det_mm or ex_mm:
            mm_scratch = tail_refs[t_i + 1:t_i + 4]
            if inter_rz:
                # persistent staging for the interleaved rz flush: the
                # PREVIOUS window's (ir, iz, val*stride) records, flushed
                # one 8-row group per step chunk of the CURRENT window.
                # Scratch persists across grid programs, so the pipeline
                # drains across tiles; the last program flushes the tail.
                pend_scr = tail_refs[t_i + 4:t_i + 7]
        pid = pl.program_id(0)
        if hw_prng:
            pltpu.prng_seed(seed_ref[0] + pid * 7919)
        # the in-VMEM histogram accumulators are shared by every grid
        # program (constant index_map -> the block is revisited, staying
        # resident across programs); program 0 owns the zero-init
        if rz_mm:
            @pl.when(pid == 0)
            def _zero_rz():
                rz_acc_ref[:] = jnp.zeros((nr, nz_pad), jnp.float32)
                if inter_rz:
                    # empty staging for the first window's flush (val 0 =
                    # no contribution; bins then point at bin 0 harmlessly)
                    pend_scr[0][:] = jnp.zeros((ROWS, LANES), jnp.int32)
                    pend_scr[1][:] = jnp.zeros((ROWS, LANES), jnp.int32)
                    pend_scr[2][:] = jnp.zeros((ROWS, LANES), jnp.float32)
        if det_mm:
            @pl.when(pid == 0)
            def _zero_det():
                det_acc_ref[:] = jnp.zeros((nx_det, det_pad), jnp.float32)
        if ex_mm:
            @pl.when(pid == 0)
            def _zero_ex():
                ex_acc_ref[:] = jnp.zeros((2 * nr, LANES), jnp.float32)

        # the kernel consumes uniforms in a fixed static order, so the
        # fallback can hand them out from u_ref by a python counter (the
        # pre-loop phase draws) plus a step-indexed slot (the 5 in-loop
        # draws at n_phase + 5*step + j)
        draw_ctr = [0]
        n_phase = 0 if bench_mode else (2 if sep_vol_phase else 1)

        def u01(shape):
            if hw_prng:
                return _u01(shape)
            i = draw_ctr[0]
            draw_ctr[0] += 1
            return u_ref[i]

        def u01_step(step, j, shape):
            if hw_prng:
                return _u01(shape)
            return u_ref[n_phase + step * 5 + j]

        launched = jnp.zeros((), jnp.float32)
        spec = jnp.zeros((), jnp.float32)
        steps = jnp.zeros((), jnp.float32)
        absorbed = jnp.zeros((), jnp.float32)
        quota = quota_ref[pid, 0]  # per-tile launch budget (f32, < 2^24)

        x, y, z = px[:], py[:], pz[:]
        ux, uy, uz = dx[:], dy[:], dz[:]
        w, tau = w_ref[:], tau_ref[:]
        layer = layer_ref[:]

        zero_f = jnp.zeros(x.shape, jnp.float32)
        zero_i = jnp.zeros(x.shape, jnp.int32)
        # per-lane once-per-block exit records (quota mode)
        ex_bin, ex_val = zero_i, zero_f
        de_bin, de_val = zero_i, zero_f

        def respawn(x, y, z, ux, uy, uz, w, tau, layer, quota,
                    launched, spec, eligible=None):
            dead = w <= 0.0
            if eligible is not None:
                dead = dead & eligible
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
            return (x, y, z, ux, uy, uz, w, tau, layer, quota,
                    launched + n_r, spec + n_r * r_sp)

        phase = phase_v = phase_lo = phase_hi = zero_i
        if not bench_mode:
            (x, y, z, ux, uy, uz, w, tau, layer, quota, launched,
             spec) = respawn(x, y, z, ux, uy, uz, w, tau, layer, quota,
                             launched, spec)
            # per-lane random phase for the strided spatial deposits: every
            # step must be sampled with probability exactly 1/stride.  A
            # fixed phase is badly biased — respawn aligns all photons to
            # step 0, so their 0th/stride-th/... life-steps would always be
            # the sampled ones (measured +4.8% on the absorb grids).
            phase = jnp.minimum((u01(x.shape) * float(stride))
                                .astype(jnp.int32), stride - 1)
            if sep_vol_phase:
                phase_v = jnp.minimum((u01(x.shape) * float(vol_stride))
                                      .astype(jnp.int32), vol_stride - 1)
            else:
                phase_v = phase
            if vol_windowed:
                # decompose the vol phase once per block: window index
                # within the vol window + step index within the window
                phase_hi = phase_v // stride
                phase_lo = phase_v - phase_hi * stride
            # stream slots accumulate read-modify-write inside the step
            # loop, so zero them up front (pallas outputs start undefined);
            # the MXU-histogram path replaces the rz stream with a 1-slot
            # placeholder zeroed at the end
            if not rz_mm:
                for s_i in range(k_steps // stride):
                    rz_bins_ref[s_i] = zero_i
                    rz_vals_ref[s_i] = zero_f
            for s_i in range(k_steps // vol_stride if vol_on else 1):
                vol_bins_ref[s_i] = zero_i
                vol_vals_ref[s_i] = zero_f

        def step_body(step, carry, si=None, takev=None):
            # ``si`` = step index within the current stride window and
            # ``takev`` = per-lane "this window feeds the vol deposit" mask
            # (both only in slim/windowed mode, where the loop is
            # restructured into stride windows and deposits are carried as
            # pending position records instead of written to stream slots)
            if slim:
                (x, y, z, ux, uy, uz, w, tau, layer, quota, launched, spec,
                 steps, absorbed, dwx, p_x, p_y, p_z, p_val) = carry[:19]
                pv = carry[19:]
            else:
                (x, y, z, ux, uy, uz, w, tau, layer, quota, launched, spec,
                 steps, absorbed, ex_bin, ex_val, de_bin, de_val) = carry
            if bench_mode:
                # free respawn every step: occupancy stays at 100% so the
                # throughput metric measures the superstep itself
                (x, y, z, ux, uy, uz, w, tau, layer, quota, launched,
                 spec) = respawn(x, y, z, ux, uy, uz, w, tau, layer, quota,
                                 launched, spec)
            alive = w > 0.0
            if slim:
                # elementwise accumulator, reduced once per block (counts
                # are integers < 2^24, so the sum is exact in any order)
                steps += alive.astype(jnp.float32)
            else:
                steps += jnp.sum(alive.astype(jnp.float32))

            u_tau = u01_step(step, 0, x.shape)
            u_hg = u01_step(step, 1, x.shape)
            u_phi = u01_step(step, 2, x.shape)
            u_fr = u01_step(step, 3, x.shape)
            u_rr = u01_step(step, 4, x.shape)

            # ---- hop -------------------------------------------------------
            mu_t_l = tab(mu_t, layer)
            g_l = tab(g_tab, layer)
            tau_new = jnp.where(tau > 0.0, tau, -jnp.log1p(-u_tau))
            s = tau_new * tab(inv_mu_t, layer)
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

            if not slim:
                # grid bin of the event position (slim mode computes bins
                # once per window/block from carried positions instead)
                r = jnp.sqrt(x * x + y * y)
                ir = jnp.clip((r * inv_dr).astype(jnp.int32), 0, nr - 1)
                iz = jnp.clip((z * inv_dz).astype(jnp.int32), 0, nz - 1)

            # ---- drop + spin (scatter lanes) --------------------------------
            scat = alive & ~hits_b
            dw = jnp.where(scat, w * tab(albedo_a, layer), 0.0)
            w = w - dw
            if slim:
                absorbed += dw
            else:
                absorbed += jnp.sum(dw)

            frac = tab(one_m_g2, layer) / (1.0 - g_l + 2.0 * g_l * u_hg)
            cos_t = jnp.clip(
                jnp.where(
                    jnp.abs(g_l) < 1e-3,
                    2.0 * u_hg - 1.0,
                    (tab(one_p_g2, layer) - frac * frac)
                    * tab(inv_2g, layer),
                ),
                -1.0, 1.0,
            )
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
            phi = 2.0 * np.pi * u_phi
            # sin from cos + the half-range sign of phi (saves the second
            # polynomial expansion; phi is uniform so the pairing is exact)
            cp = jnp.cos(phi)
            sp = jnp.sqrt(jnp.maximum(0.0, 1.0 - cp * cp))
            sp = jnp.where(u_phi <= 0.5, sp, -sp)
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
            w = jnp.where(low & surv, w * (1.0 / rr_surv), w)
            w = jnp.where(low & ~surv, 0.0, w)

            # ---- boundary lanes ---------------------------------------------
            # eta = n1/n2 comes from the direction-keyed bake-time tables;
            # rs/rp are the eta-normalized Fresnel forms (divide both the
            # numerator and denominator of the textbook expressions by n2)
            going_down = uz > 0.0
            next_layer = jnp.where(going_down, layer + 1, layer - 1)
            eta = jnp.where(going_down, tab(eta_dn, layer),
                            tab(eta_up, layer))
            cos_i = jnp.abs(uz)
            sin_t2 = eta * eta * (1.0 - cos_i * cos_i)
            tir = sin_t2 >= 1.0
            cos_tr = jnp.sqrt(jnp.maximum(1.0 - sin_t2, 0.0))
            rs = (eta * cos_i - cos_tr) / jnp.maximum(
                eta * cos_i + cos_tr, 1e-12)
            rp = (eta * cos_tr - cos_i) / jnp.maximum(
                eta * cos_tr + cos_i, 1e-12)
            refl_p = jnp.where(tir, 1.0, jnp.clip(0.5 * (rs * rs + rp * rp),
                                                  0.0, 1.0))
            do_refl = u_fr < refl_p
            exits = hits_b & ~do_refl & (
                (next_layer < 0) | (next_layer >= num_layers))
            exit_top = exits & ~going_down
            transmit_in = hits_b & ~do_refl & ~exits

            # ---- merge direction / layer / weight ---------------------------
            ux = jnp.where(scat, ndx, jnp.where(hits_b & ~do_refl, ux * eta, ux))
            uy = jnp.where(scat, ndy, jnp.where(hits_b & ~do_refl, uy * eta, uy))
            new_uz_b = jnp.where(do_refl, -uz, jnp.sign(uz) * cos_tr)
            uz = jnp.where(scat, ndz, jnp.where(hits_b, new_uz_b, uz))
            layer = jnp.where(transmit_in, next_layer, layer)

            if not bench_mode and slim:
                # slim per-step tally work: selects only.  Exit/detector
                # bins come from the frozen death position at block end;
                # deposit bins from the carried positions at window end.
                if not ab_exits:
                    # sign-encoded death record: +w = exited top, -w =
                    # exited bottom, 0 = no exit this block (exiting lanes
                    # always carry w > 0: alive requires it and boundary
                    # lanes don't drop weight)
                    dwx = jnp.where(exits,
                                    jnp.where(exit_top, w, -w), dwx)
                if (not ab_rz) or (vol_shared and not ab_vol):
                    # pending deposit position: same phase-matched step and
                    # same (x, y, z, dw) as the flat stream path, so the
                    # window-end bins are bitwise identical to the per-step
                    # bins they replace
                    sel = scat & (phase == si)
                    p_x = jnp.where(sel, x, p_x)
                    p_y = jnp.where(sel, y, p_y)
                    p_z = jnp.where(sel, z, p_z)
                    p_val = jnp.where(sel, dw, p_val)
                if vol_windowed and not ab_vol:
                    pv_x, pv_y, pv_z, pv_val = pv
                    sel_v = scat & takev & (phase_lo == si)
                    pv_x = jnp.where(sel_v, x, pv_x)
                    pv_y = jnp.where(sel_v, y, pv_y)
                    pv_z = jnp.where(sel_v, z, pv_z)
                    pv_val = jnp.where(sel_v, dw, pv_val)
                    pv = (pv_x, pv_y, pv_z, pv_val)
                if vol_legacy and not ab_vol:
                    svidx = step // vol_stride
                    sel_v = scat & (phase_v == (step % vol_stride))
                    vx = jnp.clip(
                        (x * inv_vdx + 0.5 * cfg.vol_nx).astype(jnp.int32),
                        0, cfg.vol_nx - 1)
                    vy = jnp.clip(
                        (y * inv_vdy + 0.5 * cfg.vol_ny).astype(jnp.int32),
                        0, cfg.vol_ny - 1)
                    vz = jnp.clip((z * inv_vdz).astype(jnp.int32),
                                  0, cfg.vol_nz - 1)
                    vol_bins_ref[svidx] = jnp.where(
                        sel_v, (vx * cfg.vol_ny + vy) * cfg.vol_nz + vz,
                        vol_bins_ref[svidx])
                    vol_vals_ref[svidx] = jnp.where(
                        sel_v, dw * float(vol_stride), vol_vals_ref[svidx])
            elif not bench_mode:
                # exit records: with block-start respawn a lane exits at most
                # once per block, so one (bin, weight) slot per lane suffices
                ex_bin = jnp.where(exits,
                                   jnp.where(exit_top, ir, nr + ir), ex_bin)
                ex_val = jnp.where(exits, w, ex_val)
                if nx_det > 0:
                    ix = jnp.clip(((x + det_half) * det_scale)
                                  .astype(jnp.int32), 0, nx_det - 1)
                    iy = jnp.clip(((y + det_half) * det_scale)
                                  .astype(jnp.int32), 0, nx_det - 1)
                    de_bin = jnp.where(exit_top, ix * nx_det + iy, de_bin)
                    de_val = jnp.where(exit_top, w, de_val)
                # strided spatial deposit: within each window of ``stride``
                # steps, a lane deposits on the one step matching its random
                # phase, scaled by the stride — every step is sampled with
                # probability exactly 1/stride, so the estimate is unbiased
                # (the absorbed scalar above stays exact regardless).  Slots
                # were zeroed before the loop; writes are read-modify-write
                # at a dynamic slot index.
                sidx = step // stride
                sel = scat if stride == 1 else (
                    scat & (phase == (step % stride)))
                rz_bins_ref[sidx] = jnp.where(sel, ir * nz + iz,
                                              rz_bins_ref[sidx])
                rz_vals_ref[sidx] = jnp.where(sel, dw * float(stride),
                                              rz_vals_ref[sidx])
                if vol_on:
                    # independent (usually coarser) stride for the 2M-bin
                    # volume: its fold is scatter-bound at ~10 ns/event
                    svidx = step // vol_stride
                    sel_v = scat if vol_stride == 1 else (
                        scat & (phase_v == (step % vol_stride)))
                    vx = jnp.clip(
                        (x * inv_vdx + 0.5 * cfg.vol_nx).astype(jnp.int32),
                        0, cfg.vol_nx - 1)
                    vy = jnp.clip(
                        (y * inv_vdy + 0.5 * cfg.vol_ny).astype(jnp.int32),
                        0, cfg.vol_ny - 1)
                    vz = jnp.clip((z * inv_vdz).astype(jnp.int32),
                                  0, cfg.vol_nz - 1)
                    vol_bins_ref[svidx] = jnp.where(
                        sel_v, (vx * cfg.vol_ny + vy) * cfg.vol_nz + vz,
                        vol_bins_ref[svidx])
                    vol_vals_ref[svidx] = jnp.where(
                        sel_v, dw * float(vol_stride), vol_vals_ref[svidx])

            w = jnp.where(exits, 0.0, w)  # lane dies on exit

            # nudge off the interface
            z = jnp.where(hits_b & (w > 0.0), z + jnp.sign(uz) * 1e-6, z)
            if slim:
                out = (x, y, z, ux, uy, uz, w, tau, layer, quota, launched,
                       spec, steps, absorbed, dwx,
                       p_x, p_y, p_z, p_val) + tuple(pv)
            else:
                out = (x, y, z, ux, uy, uz, w, tau, layer, quota, launched,
                       spec, steps, absorbed, ex_bin, ex_val, de_bin, de_val)
            return out

        if slim:
            # windowed loop: each window of ``stride`` steps carries one
            # pending (x, y, z, val) deposit record per lane (a lane's phase
            # matches exactly one step per window — the same once-per-window
            # semantics as the stream slot it replaces); bins are computed
            # once at window end and flushed into the shared VMEM histogram
            # via MXU one-hot contractions.  RNG draw order is identical to
            # the flat loop (no draws in the flush).
            carry0 = (x, y, z, ux, uy, uz, w, tau, layer, quota, launched,
                      spec, zero_f, zero_f,  # steps/absorbed accumulators
                      zero_f,                # sign-encoded exit record
                      zero_f, zero_f, zero_f, zero_f)  # p_x, p_y, p_z, p_val
            n_pv = 4 if (vol_windowed and not ab_vol) else 0
            carry0 = carry0 + (zero_f,) * n_pv

            def window_body(wi, carry):
                if respawn_w:
                    # quota-ranked respawn at (every respawn_w-th) window
                    # start, ONLY for lanes that did not exit this block
                    # (dwx == 0) — exited lanes keep their frozen death
                    # position for the block-end record flush.  Block
                    # start is covered by the pre-loop respawn.
                    do_r = (wi > 0) & (wi % respawn_w == 0)
                    rs = respawn(*carry[:12], eligible=carry[14] == 0.0)
                    carry = tuple(
                        jnp.where(do_r, rs[i], carry[i]) for i in range(12)
                    ) + carry[12:]
                # reset the per-window pendings (the exit record and the
                # counters persist across windows)
                carry = carry[:15] + (zero_f,) * (4 + n_pv)
                takev = (phase_hi == (wi % vol_ratio)) if n_pv else None

                if inter_rz:
                    # step chunks with one staged-group flush between each:
                    # the records flushed here are the PREVIOUS window's
                    # (zeros on the very first window of program 0 — val 0
                    # contributes nothing), so the MXU contractions overlap
                    # this window's VPU physics
                    n_grp = ROWS // 8
                    sub = stride // n_grp

                    def chunk(g, c):
                        def inner(si, cc):
                            s_in = g * sub + si
                            return step_body(wi * stride + s_in, cc, s_in,
                                             takev)
                        c = jax.lax.fori_loop(0, sub, inner, c,
                                              unroll=unroll)
                        _flush_group(rz_acc_ref, pend_scr[0], pend_scr[1],
                                     pend_scr[2], g, nr, nz_pad)
                        return c

                    carry = jax.lax.fori_loop(0, n_grp, chunk, carry)
                else:
                    def inner(si, c):
                        return step_body(wi * stride + si, c, si, takev)

                    carry = jax.lax.fori_loop(0, stride, inner, carry,
                                              unroll=unroll)
                p_x, p_y, p_z, p_val = carry[15:19]
                if not ab_rz:
                    r = jnp.sqrt(p_x * p_x + p_y * p_y)
                    ir = jnp.clip((r * inv_dr).astype(jnp.int32), 0, nr - 1)
                    iz = jnp.clip((p_z * inv_dz).astype(jnp.int32),
                                  0, nz - 1)
                    if inter_rz:
                        # stage for the next window's interleaved flush
                        # (WAR on pend_scr: every group was read above)
                        pend_scr[0][:] = ir
                        pend_scr[1][:] = iz
                        pend_scr[2][:] = p_val * float(stride)
                    else:
                        _onehot_pair_flush(rz_acc_ref, ir, iz,
                                           p_val * float(stride), nr,
                                           nz_pad, mm_scratch)
                if (vol_shared or n_pv) and not ab_vol:
                    if vol_shared:
                        vx_s, vy_s, vz_s, vv = p_x, p_y, p_z, p_val
                        svidx = wi
                    else:
                        vx_s, vy_s, vz_s, vv = carry[19:23]
                        svidx = wi // vol_ratio
                    vx = jnp.clip(
                        (vx_s * inv_vdx + 0.5 * cfg.vol_nx)
                        .astype(jnp.int32), 0, cfg.vol_nx - 1)
                    vy = jnp.clip(
                        (vy_s * inv_vdy + 0.5 * cfg.vol_ny)
                        .astype(jnp.int32), 0, cfg.vol_ny - 1)
                    vz = jnp.clip((vz_s * inv_vdz).astype(jnp.int32),
                                  0, cfg.vol_nz - 1)
                    vbin = (vx * cfg.vol_ny + vy) * cfg.vol_nz + vz
                    vval = vv * float(vol_stride)
                    if vol_shared:
                        # the slot belongs to this window alone: overwrite
                        vol_bins_ref[svidx] = vbin
                        vol_vals_ref[svidx] = vval
                    else:
                        # ``vol_ratio`` windows share the slot; each lane's
                        # deposit comes from its ``takev`` window (slots
                        # were zeroed before the loop)
                        vol_bins_ref[svidx] = jnp.where(
                            takev, vbin, vol_bins_ref[svidx])
                        vol_vals_ref[svidx] = jnp.where(
                            takev, vval, vol_vals_ref[svidx])
                return carry

            carry = jax.lax.fori_loop(0, k_steps // stride, window_body,
                                      carry0)
            if inter_rz:
                # drain: the LAST program flushes the final staged window
                # (earlier programs leave it for the next program's first
                # window — the pipeline runs straight through the grid)
                @pl.when(pid == pl.num_programs(0) - 1)
                def _drain_rz():
                    def dg(g, _):
                        _flush_group(rz_acc_ref, pend_scr[0], pend_scr[1],
                                     pend_scr[2], g, nr, nz_pad)
                        return 0
                    jax.lax.fori_loop(0, ROWS // 8, dg, 0)
            (x, y, z, ux, uy, uz, w, tau, layer, quota, launched, spec,
             steps_a, absorbed_a, dwx) = carry[:15]
            steps = jnp.sum(steps_a)
            absorbed = jnp.sum(absorbed_a)
            # block-end exit/detector records: a lane exits at most once
            # per block and its position freezes at death, so the bins of
            # the final state ARE the exit bins (bitwise identical to the
            # per-step records they replace)
            ex_bin, ex_val = zero_i, zero_f
            de_bin, de_val = zero_i, zero_f
            if not ab_exits:
                top = dwx > 0.0
                r = jnp.sqrt(x * x + y * y)
                ir = jnp.clip((r * inv_dr).astype(jnp.int32), 0, nr - 1)
                ex_bin = jnp.where(top, ir, nr + ir)
                ex_val = jnp.abs(dwx)  # 0 (no exit) contributes nothing
                if ex_mm:
                    # once-per-block 1-D histogram of the exit records on
                    # the MXU (column 0 of a (2nr, LANES) accumulator) —
                    # replaces the host-side _hist fold of lanes-per-block
                    # events whose chunk padding dominated its cost
                    _onehot_pair_flush(ex_acc_ref, ex_bin, zero_i, ex_val,
                                       2 * nr, LANES, mm_scratch)
                if nx_det > 0 and not ab_det:
                    ix = jnp.clip(((x + det_half) * det_scale)
                                  .astype(jnp.int32), 0, nx_det - 1)
                    iy = jnp.clip(((y + det_half) * det_scale)
                                  .astype(jnp.int32), 0, nx_det - 1)
                    de_bin = jnp.where(top, ix * nx_det + iy, 0)
                    de_val = jnp.where(top, dwx, 0.0)
        else:
            carry0 = (x, y, z, ux, uy, uz, w, tau, layer, quota, launched,
                      spec, steps, absorbed, ex_bin, ex_val, de_bin, de_val)
            carry = jax.lax.fori_loop(0, k_steps, step_body, carry0,
                                      unroll=unroll)
            (x, y, z, ux, uy, uz, w, tau, layer, quota, launched, spec,
             steps, absorbed, ex_bin, ex_val, de_bin, de_val) = carry[:18]

        opx[:] = x
        opy[:] = y
        opz[:] = z
        odx[:] = ux
        ody[:] = uy
        odz[:] = uz
        ow[:] = w
        otau[:] = tau
        olayer[:] = layer
        exit_bin_ref[:] = ex_bin
        exit_val_ref[:] = ex_val
        det_bin_ref[:] = de_bin
        det_val_ref[:] = de_val
        if det_mm and not ab_det:
            # exit records are once-per-lane-per-block (exited lanes are
            # excluded from mid-block respawn), so the detector image
            # accumulates with a single MXU flush per program
            de_ix = de_bin // nx_det
            de_iy = de_bin - de_ix * nx_det
            _onehot_pair_flush(det_acc_ref, de_ix, de_iy, de_val,
                               nx_det, det_pad, mm_scratch)
        if bench_mode:
            # streams unused: emit zeros into the 1-step placeholders
            rz_bins_ref[0] = zero_i
            rz_vals_ref[0] = zero_f
            vol_bins_ref[0] = zero_i
            vol_vals_ref[0] = zero_f
        elif rz_mm:
            rz_bins_ref[0] = zero_i
            rz_vals_ref[0] = zero_f
        counters_ref[pid, 0] = launched
        counters_ref[pid, 1] = spec
        counters_ref[pid, 2] = steps
        counters_ref[pid, 3] = quota
        counters_ref[pid, 4] = absorbed

    if hw_prng:
        def kernel(seed_ref, quota_ref, *rest):
            kernel_body(seed_ref, quota_ref, None, *rest)
        return kernel
    return kernel_body


def _hist_mm(bins, vals, n_bins: int):
    """One factorized one-hot matmul pass over <= _HIST_MM_CHUNK events."""
    n1 = 128 if n_bins % 128 == 0 else 1
    n0 = n_bins // n1
    i0 = bins // n1
    oh0 = (i0[:, None] == jnp.arange(n0)[None, :]).astype(jnp.float32)
    if n1 == 1:
        return (oh0 * vals[:, None]).sum(axis=0)
    i1 = bins - i0 * n1
    oh1 = (i1[:, None] == jnp.arange(n1)[None, :]).astype(jnp.float32)
    # TPU f32 matmuls round operands to bf16 by default; a hi/lo split
    # of the value factor recovers ~2^-16 relative accuracy (measured:
    # single-pass was 8.7e-4 off the exact scatter fold, split 9e-6)
    v = oh1 * vals[:, None]
    v_hi = v.astype(jnp.bfloat16).astype(jnp.float32)
    out = jnp.dot(oh0.T, v_hi, preferred_element_type=jnp.float32)
    out = out + jnp.dot(oh0.T, v - v_hi,
                        preferred_element_type=jnp.float32)
    return out.reshape(-1)


def _hist(bins, vals, n_bins: int, chunk: int = _HIST_MM_CHUNK):
    """Scatter-add (bins, vals) -> (n_bins,), picking the fast path.

    For small grids a factorized one-hot matmul runs on the MXU ~10x faster
    than XLA's scatter-add (measured v5e: 3 ms vs 28 ms at 4M events into
    64x64).  The one-hot entries are exact 0/1 and each event contributes
    one product, so the result differs from scatter only in summation order.
    Event batches beyond ``chunk`` are folded in fixed-size passes so the
    one-hot temporaries stay memory-bounded (a stride-1 stream at 32 tiles
    is ~17M events; unchunked, its one-hot factors alone exceed HBM).
    """
    bins = bins.reshape(-1)
    vals = vals.reshape(-1)
    if n_bins <= _HIST_MM_MAX_BINS:
        e = bins.shape[0]
        if e <= chunk:
            return _hist_mm(bins, vals, n_bins)
        pad = (-e) % chunk
        if pad:
            # bin 0 with value 0 contributes exactly nothing
            bins = jnp.concatenate([bins, jnp.zeros((pad,), bins.dtype)])
            vals = jnp.concatenate([vals, jnp.zeros((pad,), vals.dtype)])
        bc = bins.reshape(-1, chunk)
        vc = vals.reshape(-1, chunk)

        def body(acc, bv):
            b, v = bv
            return acc + _hist_mm(b, v, n_bins), None

        out, _ = jax.lax.scan(body, jnp.zeros((n_bins,), jnp.float32),
                              (bc, vc))
        return out
    return jnp.zeros((n_bins,), jnp.float32).at[bins].add(vals)


class PallasPhotonEngine:
    """Wraps the fused kernel: state management + deferred tally fold."""

    def __init__(self, medium: LayeredMedium, cfg: PhotonRunConfig,
                 lanes: int, bench_mode: bool = True,
                 k_steps: int = K_STEPS, hw_prng: bool | None = None,
                 unroll: int = 1,
                 rz_mm: bool | None = None, det_mm: bool | None = None,
                 ablate: frozenset = frozenset(),
                 interleave_flush: bool = False):
        assert lanes % (ROWS * LANES) == 0, (lanes, ROWS * LANES)
        self.cfg = cfg
        self.lanes = lanes
        self.n_tiles = lanes // (ROWS * LANES)
        self.bench_mode = bench_mode
        # hardware PRNG on a real TPU; threefry-fed interpret mode elsewhere
        # (same kernel body — lets the CPU mesh execute the full shard_map +
        # pallas_call composition, VERDICT.md r2 item 1)
        if hw_prng is None:
            hw_prng = jax.default_backend() in ("tpu", "axon")
        self.hw_prng = bool(hw_prng)
        self.stride = max(1, int(cfg.tally_stride))
        self.vol_stride = max(1, int(cfg.vol_stride or self.stride))
        # strided deposit windows must tile the block exactly; round the
        # block up rather than assert so configs with strides above the
        # default K_STEPS (e.g. the full_scale preset's vol_stride=64)
        # run out of the box on every entry point
        need = math.lcm(self.stride, self.vol_stride)
        if k_steps % need:
            k_steps = ((k_steps + need - 1) // need) * need
        self.k_steps = k_steps
        assert k_steps % self.stride == 0, (k_steps, self.stride)
        assert k_steps % self.vol_stride == 0, (k_steps, self.vol_stride)
        self.sep_vol_phase = (cfg.vol_nx > 0
                              and self.vol_stride != self.stride
                              and not bench_mode)
        # MXU-histogram accumulation (VERDICT.md r2 item 2): fold the
        # strided (r,z) deposits and the once-per-block detector records
        # into shared VMEM grids inside the kernel instead of streaming
        # (bin, val) events to an XLA scatter-add.  Measured cheaper per
        # stride window than the scatter it replaces (PERF.md) and frees
        # the stream's VMEM slots, so it is on whenever the grid fits and
        # deposits are strided; stride 1 keeps the stream path (the MCML
        # every-step bit-convention used by small parity runs).
        self.nz_pad = ((cfg.nz + LANES - 1) // LANES) * LANES
        self.det_pad = ((cfg.detector_nx + LANES - 1) // LANES) * LANES \
            if cfg.detector_nx > 0 else 0
        if rz_mm is None:
            rz_mm = (not bench_mode and self.stride >= 2
                     and cfg.nr * self.nz_pad * 4 <= (4 << 20))
        if det_mm is None:
            det_mm = (not bench_mode and 0 < cfg.detector_nx
                      and cfg.detector_nx * self.det_pad * 4 <= (4 << 20))
        self.rz_mm = bool(rz_mm) and not bench_mode
        self.det_mm = (bool(det_mm) and not bench_mode
                       and cfg.detector_nx > 0)
        # in-kernel exit-record histogram: rides the slim windowed mode
        # (the block-end exit bins are already in registers there)
        self.ex_mm = self.rz_mm
        if cfg.respawn_windows and not bench_mode and not self.rz_mm:
            raise ValueError(
                "respawn_windows requires the windowed tally mode "
                "(tally_stride >= 2 with the rz grid small enough for the "
                "in-kernel MXU folds)")
        med = {
            "mu_t": np.asarray(medium.mu_t), "mu_a": np.asarray(medium.mu_a),
            "g": np.asarray(medium.g), "n": np.asarray(medium.n),
            "z_top": np.asarray(medium.z_top), "z_bot": np.asarray(medium.z_bot),
            "n_above": np.asarray(medium.n_above),
            "n_below": np.asarray(medium.n_below),
        }
        # the step loop runs as an in-kernel fori_loop (Mosaic compiles one
        # step body instead of k_steps copies — the unrolled variant cost
        # ~23 s of compile at k=64); Mosaic only allows unroll=1 or the
        # full trip count, and the trip count of the inner loop is
        # ``stride`` in rz_mm (windowed) mode, ``k_steps`` otherwise —
        # validate here so a bad value fails with a clear message instead
        # of a Mosaic NotImplementedError at TPU compile time (ADVICE r3)
        inner_trip = self.stride if self.rz_mm else self.k_steps
        unroll = min(int(unroll), inner_trip)
        if unroll not in (1, inner_trip):
            raise ValueError(
                f"unroll={unroll}: Mosaic fori_loop supports only unroll=1 "
                f"or the full inner trip count ({inner_trip} here — the "
                f"{'stride window' if self.rz_mm else 'k_steps loop'})")
        self.ablate = frozenset(ablate)
        # interleaved rz flush (r5 A/B knob): stage each window's deposit
        # records and flush them between the NEXT window's step chunks —
        # overlap instead of serialization.  Same per-record math as
        # _onehot_pair_flush; grids differ only by f32 add re-association.
        self.interleave = (bool(interleave_flush) and self.rz_mm
                           and "rz" not in self.ablate
                           and self.stride % (ROWS // 8) == 0)
        if interleave_flush and not self.interleave:
            raise ValueError(
                f"interleave_flush requires the windowed rz_mm mode with "
                f"tally_stride a multiple of {ROWS // 8} "
                f"(got rz_mm={self.rz_mm}, stride={self.stride}, "
                f"ablate={sorted(self.ablate)})")
        self.kernel = _make_kernel(med, cfg, bench_mode, k_steps,
                                   stride=self.stride,
                                   vol_stride=self.vol_stride,
                                   hw_prng=self.hw_prng,
                                   unroll=unroll,
                                   rz_mm=self.rz_mm, nz_pad=self.nz_pad,
                                   det_mm=self.det_mm,
                                   det_pad=self.det_pad,
                                   ex_mm=self.ex_mm,
                                   ablate=self.ablate,
                                   interleave=self.interleave)

    def zero_state(self):
        shape = (self.n_tiles * ROWS, LANES)
        z = jnp.zeros(shape, jnp.float32)
        return (z, z, z, z, z, z + 1.0, z, z, jnp.zeros(shape, jnp.int32))

    @functools.partial(jax.jit, static_argnums=0)
    def run_block(self, state, seed, quota_per_tile):
        """One block = block-start respawn + k_steps supersteps.

        Returns (state, outs, counters) where outs = (exit_bin, exit_val,
        det_bin, det_val, rz_bins, rz_vals, vol_bins, vol_vals) followed by
        the optional MXU-histogram accumulator grids — the (nr, nz_pad) rz
        grid when ``rz_mm`` and the (detector_nx, det_pad) detector grid
        when ``det_mm`` — which ``accumulate`` pops positionally in that
        order.
        """
        n_rows = self.n_tiles * ROWS
        px, py, pz, dx, dy, dz, w, tau, layer = state
        row_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        n_stream = ((self.k_steps // self.stride)
                    if not (self.bench_mode or self.rz_mm) else 1)
        n_vol = ((self.k_steps // self.vol_stride)
                 if (self.cfg.vol_nx > 0 and not self.bench_mode) else 1)

        def stream_spec(steps):
            return pl.BlockSpec((steps, ROWS, LANES), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)

        f32, i32 = jnp.float32, jnp.int32
        # the MXU-histogram accumulators map every grid program to the same
        # block (constant index_map), so the VMEM block is revisited and
        # carries the running sum across tiles; program 0 zeroes it
        acc_specs, acc_shapes = [], []
        if self.rz_mm:
            acc_specs.append(pl.BlockSpec((self.cfg.nr, self.nz_pad),
                                          lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            acc_shapes.append(
                jax.ShapeDtypeStruct((self.cfg.nr, self.nz_pad), f32))
        if self.det_mm:
            acc_specs.append(pl.BlockSpec(
                (self.cfg.detector_nx, self.det_pad), lambda i: (0, 0),
                memory_space=pltpu.VMEM))
            acc_shapes.append(jax.ShapeDtypeStruct(
                (self.cfg.detector_nx, self.det_pad), f32))
        if self.ex_mm:
            acc_specs.append(pl.BlockSpec((2 * self.cfg.nr, LANES),
                                          lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            acc_shapes.append(
                jax.ShapeDtypeStruct((2 * self.cfg.nr, LANES), f32))
        out_specs = (
            [row_spec] * 8
            + [row_spec]  # layer
            + [row_spec] * 4  # exit_bin/exit_val/det_bin/det_val
            + [stream_spec(n_stream), stream_spec(n_stream),
               stream_spec(n_vol), stream_spec(n_vol)]
            + acc_specs
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        )
        out_shape = (
            [jax.ShapeDtypeStruct((n_rows, LANES), f32)] * 8
            + [jax.ShapeDtypeStruct((n_rows, LANES), i32)]
            + [jax.ShapeDtypeStruct((n_rows, LANES), i32),
               jax.ShapeDtypeStruct((n_rows, LANES), f32),
               jax.ShapeDtypeStruct((n_rows, LANES), i32),
               jax.ShapeDtypeStruct((n_rows, LANES), f32)]
            + [jax.ShapeDtypeStruct((n_stream, n_rows, LANES), i32),
               jax.ShapeDtypeStruct((n_stream, n_rows, LANES), f32),
               jax.ShapeDtypeStruct((n_vol, n_rows, LANES), i32),
               jax.ShapeDtypeStruct((n_vol, n_rows, LANES), f32)]
            + acc_shapes
            + [jax.ShapeDtypeStruct((self.n_tiles, 5), f32)]
        )
        in_specs = (
            [
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ]
            + ([] if self.hw_prng else
               [pl.BlockSpec((_n_draws(self.k_steps, self.bench_mode,
                                       self.sep_vol_phase),
                              ROWS, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)])
            + [row_spec] * 8
            + [row_spec]
        )
        quota_arr = jnp.broadcast_to(
            jnp.asarray(quota_per_tile, jnp.float32).reshape(-1, 1),
            (self.n_tiles, 1),
        ) if jnp.ndim(quota_per_tile) == 0 else quota_per_tile
        u_args = ()
        if not self.hw_prng:
            # threefry stand-in for the hardware PRNG: same per-block seed
            # feeds an independent stream per (draw, row, lane)
            key = jax.random.fold_in(jax.random.key(0),
                                     jnp.asarray(seed, jnp.int32))
            u_args = (jax.random.uniform(
                key, (_n_draws(self.k_steps, self.bench_mode,
                               self.sep_vol_phase), n_rows, LANES),
                jnp.float32),)
        scratch_shapes = []
        if self.rz_mm or self.det_mm or self.ex_mm:
            scratch_shapes = [pltpu.VMEM((ROWS, LANES), i32),
                              pltpu.VMEM((ROWS, LANES), i32),
                              pltpu.VMEM((ROWS, LANES), f32)]
            if self.interleave:
                # persistent staging for the interleaved rz flush
                scratch_shapes += [pltpu.VMEM((ROWS, LANES), i32),
                                   pltpu.VMEM((ROWS, LANES), i32),
                                   pltpu.VMEM((ROWS, LANES), f32)]
        outs = pl.pallas_call(
            self.kernel,
            grid=(self.n_tiles,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=scratch_shapes,
            interpret=not self.hw_prng,
        )(
            jnp.asarray([seed], jnp.int32),
            quota_arr,
            *u_args,
            px, py, pz, dx, dy, dz, w, tau, layer,
        )
        new_state = outs[:9]
        return new_state, outs[9:-1], outs[-1]

    def accumulate(self, tallies: PhotonTallies, outs, counters):
        (exit_bin, exit_val, det_bin, det_val,
         rz_bins, rz_vals, vol_bins, vol_vals) = outs[:8]
        accs = list(outs[8:])
        cfg = self.cfg
        ab = self.ablate
        if not self.bench_mode:
            rz_acc = accs.pop(0) if self.rz_mm else None
            det_acc = accs.pop(0) if self.det_mm else None
            ex_acc = accs.pop(0) if self.ex_mm else None
            if "exits" not in ab:
                if self.ex_mm:
                    ex = ex_acc[:, 0]
                else:
                    ex = _hist(exit_bin, exit_val, 2 * cfg.nr)
                tallies = tallies.replace(
                    refl_r=tallies.refl_r + ex[:cfg.nr],
                    trans_r=tallies.trans_r + ex[cfg.nr:])
            if "rz" not in ab:
                if self.rz_mm:
                    rz = rz_acc[:, :cfg.nz].reshape(-1)
                else:
                    rz = _hist(rz_bins, rz_vals, cfg.nr * cfg.nz)
                tallies = tallies.replace(
                    absorb_rz=tallies.absorb_rz
                    + rz.reshape(cfg.nr, cfg.nz))
            if cfg.detector_nx > 0 and "det" not in ab and "exits" not in ab:
                nx = cfg.detector_nx
                if self.det_mm:
                    det = det_acc[:, :nx].reshape(-1)
                else:
                    det = _hist(det_bin, det_val, nx * nx)
                tallies = tallies.replace(
                    detector_xy=tallies.detector_xy
                    + det.reshape(nx, nx))
            if cfg.vol_nx > 0 and "vol" not in ab:
                # plain scatter-add: a sort-then-scatter variant with the
                # indices_are_sorted hint measured 41.9 vs 27.1 ms/block
                # end-to-end on full_scale (argsort of ~1M keys costs far
                # more than the sortedness hint recovers) — PERF.md
                nb = cfg.vol_nx * cfg.vol_ny * cfg.vol_nz
                vol = _hist(vol_bins, vol_vals, nb)
                tallies = tallies.replace(
                    absorb_xyz=tallies.absorb_xyz
                    + vol.reshape(cfg.vol_nx, cfg.vol_ny, cfg.vol_nz))
        return tallies.replace(
            launched=counter_merge(tallies.launched,
                                   counter_from_sum(counters[:, 0])),
            specular=tallies.specular + counters[:, 1].sum(),
            steps=counter_merge(tallies.steps,
                                counter_from_sum(counters[:, 2])),
            absorbed=tallies.absorbed + counters[:, 4].sum(),
        )


def bench_pallas(medium: LayeredMedium, cfg: PhotonRunConfig, seed: int,
                 lanes: int, n_blocks: int, k_steps: int = K_STEPS):
    """Throughput run: n_blocks * k_steps supersteps with free respawn.

    Bench mode respawns every step (100% occupancy) and keeps only the
    exact scalar counters — it measures the superstep kernel itself.  The
    unbiased quota engine below is the one that produces physics.
    """
    # bench mode fully unrolls the step loop: Mosaic's unroll=1 fori costs
    # ~25% steady throughput (cross-step ILP), which the quota engine
    # gladly trades for a 23 s -> 1.5 s compile, but the throughput metric
    # should measure the kernel at its best (compile time is excluded)
    eng = PallasPhotonEngine(medium, cfg, lanes, bench_mode=True,
                             k_steps=k_steps, unroll=k_steps)

    @jax.jit
    def run(seed0):
        state = eng.zero_state()
        tallies = PhotonTallies.zeros(cfg)

        def body(carry, b):
            state, tallies = carry
            state, outs, counters = eng.run_block(
                state, seed0 + b * 65537, jnp.inf
            )
            tallies = eng.accumulate(tallies, outs, counters)
            return (state, tallies), None

        (state, tallies), _ = jax.lax.scan(
            body, (state, tallies), jnp.arange(n_blocks, dtype=jnp.int32)
        )
        return tallies

    return run(seed)


def simulate_pallas(medium: LayeredMedium, cfg: PhotonRunConfig, seed: int,
                    lanes: int = ROWS * LANES * 16,
                    max_blocks: int = 200_000,
                    k_steps: int = K_STEPS,
                    chunk_blocks: int = 4,
                    unroll: int = 1,
                    timings: dict = None,
                    checkpoint_path: str = None,
                    checkpoint_every: int = 16,
                    _ablate: frozenset = frozenset(),
                    interleave_flush: bool = False):
    """Unbiased run of cfg.n_photons via per-tile launch quotas.

    Host-driven loop over jitted *chunks* of ``chunk_blocks`` blocks (each
    block = one kernel call + tally fold, composed with lax.scan): the
    termination check reads one scalar back per chunk, so the ~27 ms tunnel
    round-trip is amortized.  Wrapping the whole run in a device-side
    while_loop triggers pathologically slow XLA/Mosaic compiles (PERF.md).

    ``checkpoint_path``: snapshot (state, tallies, quota, chunk index,
    seed) every ``checkpoint_every`` chunks through the atomic-npz
    checkpoint store (utils/checkpoint).  A killed run re-invoked with the
    same arguments resumes at the last snapshot and — because per-block
    RNG seeds derive from the absolute block index — reproduces the
    uninterrupted run's counters and tallies exactly.  Each snapshot
    forces a device->host fetch of the full state (~30 MB at 64 tiles
    over the tunnel), so size ``checkpoint_every`` to taste.
    """
    lanes = min(lanes, max(ROWS * LANES,
                           (cfg.n_photons // (ROWS * LANES)) * ROWS * LANES))
    eng = PallasPhotonEngine(medium, cfg, lanes, bench_mode=False,
                             k_steps=k_steps, unroll=unroll,
                             ablate=_ablate,
                             interleave_flush=interleave_flush)
    base = cfg.n_photons // eng.n_tiles
    rem = cfg.n_photons - base * eng.n_tiles
    assert base + 1 < 2 ** 24, "per-tile quota must stay exact in f32"
    quota = np.full((eng.n_tiles, 1), base, np.float32)
    quota[:rem, 0] += 1.0  # exact integer split of the launch budget

    @jax.jit
    def chunk(state, tallies, quota, seed0):
        def body(carry, b):
            state, tallies, quota = carry
            state, outs, counters = eng.run_block(
                state, seed0 + b * 65537, quota)
            tallies = eng.accumulate(tallies, outs, counters)
            quota = counters[:, 3:4]
            return (state, tallies, quota), None

        (state, tallies, quota), _ = jax.lax.scan(
            body, (state, tallies, quota),
            jnp.arange(chunk_blocks, dtype=jnp.int32))
        more = jnp.any(quota > 0) | jnp.any(state[6] > 0.0)
        return state, tallies, quota, more

    state = eng.zero_state()
    tallies = PhotonTallies.zeros(cfg)
    quota = jnp.asarray(quota)
    start_c = 0
    fp = ""
    if checkpoint_path:
        from light_transport_tpu.utils.checkpoint import (
            load_pallas_checkpoint,
            save_pallas_checkpoint,
        )

        # everything that must match for the resumed RNG streams, shapes
        # and fold semantics to line up with the interrupted run
        fp = (f"pallas-v1|seed={seed}|lanes={lanes}|k={eng.k_steps}"
              f"|cb={chunk_blocks}|hw={eng.hw_prng}|cfg={cfg}")
        loaded = load_pallas_checkpoint(checkpoint_path, fp)
        if loaded is not None:
            state, tallies, quota, start_c = loaded
    t0 = time.perf_counter()
    t1 = s1 = None
    # pipelined host loop: dispatch chunk c+1 (async) BEFORE forcing chunk
    # c's `more` scalar, so the ~27 ms tunnel round-trip of the termination
    # read overlaps device work instead of stalling it.  Termination lags
    # one chunk (one extra all-dead chunk executes after drain — dead lanes
    # cost no counted steps).
    prev_more = None
    prev_tallies = tallies
    c1 = 0
    chunks_done = 0
    for c in range(start_c, max_blocks, chunk_blocks):
        # mask the python-int seed into int32 range: at c >= 32768 the
        # unwrapped product exceeds 2^31-1 and jnp.asarray would raise
        # OverflowError mid-run (in-kernel b*65537 arithmetic wraps as
        # int32 silently, which is fine for a seed)
        state, tallies, quota, more = chunk(
            state, tallies, quota, (seed + c * 65537) & 0x7FFFFFFF)
        if prev_more is not None:
            done = not bool(prev_more)  # syncs chunk c-1 only
        else:
            done = False
        if t1 is None:
            jax.block_until_ready(more)
            # first chunk includes the XLA/Mosaic compile; steady-state
            # throughput (the reference's own "do not report compile time"
            # convention, examples/ray-tracing.ipynb cells 12/14) is
            # measured from here
            t1 = time.perf_counter()
            s1 = counter_value(tallies.steps)
            c1 = c + chunk_blocks
        if done:
            tallies = prev_tallies  # chunk c was dispatched past the drain
            break
        prev_more, prev_tallies = more, tallies
        chunks_done += 1
        if checkpoint_path and chunks_done % checkpoint_every == 0:
            # post-chunk-c snapshot; a snapshot taken on the all-dead
            # chunk past the drain is harmless (it adds no events)
            save_pallas_checkpoint(checkpoint_path, state, tallies, quota,
                                   c + chunk_blocks, seed, fp)
    if timings is not None and t1 is not None:
        s_end = counter_value(tallies.steps)
        t_end = time.perf_counter()
        timings["compile_plus_first_chunk_s"] = t1 - t0
        timings["steady_s"] = t_end - t1
        timings["steady_steps"] = s_end - s1
        timings["steady_steps_per_sec"] = (
            (s_end - s1) / max(t_end - t1, 1e-9))
        # lane occupancy over the steady region: counted (live-lane) steps
        # per lane-step executed.  Off-by-one-chunk at the drain (the
        # pipelined loop dispatches one chunk past termination; its lanes
        # are dead and count no steps) — fine for a diagnostic.
        steady_blocks = (c + chunk_blocks) - c1
        lane_steps = steady_blocks * eng.lanes * eng.k_steps
        timings["steady_blocks"] = steady_blocks
        timings["steady_occupancy"] = (s_end - s1) / max(lane_steps, 1)
        timings["ms_per_block"] = (t_end - t1) / max(steady_blocks, 1) * 1e3
    return tallies
