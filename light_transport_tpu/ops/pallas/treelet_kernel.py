"""Treelet-resident Pallas BVH traversal for incoherent rays on big meshes.

The XLA roped walk (accel/bvh.intersect_bvh) is gather-issue-rate bound:
every visit gathers a 64 B node row from HBM at ~75 ns/row, ~40x off HBM
bandwidth (PERF.md §mesh-scale).  This kernel removes the per-visit HBM
gather entirely:

- The flat roped BVH is cut into **treelets = contiguous DFS ranges** of
  ``T`` nodes.  The roped walk's cursor is *strictly increasing* in DFS
  order (left child is ``node+1``, the rope always points forward), so a
  ray passes through each treelet at most once, in ascending order — no
  revisits, no per-ray treelet queues.
- Per ray-tile (grid dimension), the kernel walks the tile's whole
  traversal in ONE launch: DMA the current treelet's table HBM->VMEM,
  advance every lane inside that treelet in lockstep until none remain,
  hop to the next treelet = min cursor over live lanes.
- Node records are fetched from the VMEM-resident table with a one-hot
  matmul on the MXU: ``(128, T) table  @  (T, R) one-hot -> (128, R)``
  feature rows — a gather at MXU speed instead of 75 ns/row scalar issue.

Exactness: the MXU multiplies bf16, so every table value is split into
three pre-scaled bf16 chunks whose f32 sum reconstructs the original
**bit-exactly** (floats: hi/mid/lo mantissa windows; ints < 2^24: 8-bit
digits scaled by 256^j).  The one-hot factor is exactly 0/1, each output
row has exactly one nonzero term, and the reconstruction sums three
disjoint-mantissa f32 values — no rounding anywhere, so the kernel is
bit-identical to the XLA walk (asserted in tests/test_treelet.py).

Reference contract: same traversal semantics as accel/bvh.intersect_bvh,
itself replacing ``intersect_bvh`` (src/bvh_new.py:413-482).

Table row layout, node half (rows 0..31 of a (160, T) treelet slab — kept
to 32 rows so the per-iteration node-fetch matmul contracts 32xT, not the
leaf half too):
  rows 3c+j, c in 0..5, j in 0..2:  bounds chunk j of
        [min.x, min.y, min.z, max.x, max.y, max.z][c]
  rows 18..20: ``first`` int chunks   rows 22..24: ``skip`` int chunks
  row 21: leaf prim count (small int, exact in bf16)
Leaf half (rows 32..159): tri k (< max_leaf), component c (v0,e1,e2
flattened, 0..8), chunk j -> row 32 + 27k + 3c + j.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from light_transport_tpu.ops.intersect import Hit, T_EPS

DEFAULT_T = 512  # nodes per treelet
DEFAULT_R = 256  # rays per tile


NODE_ROWS = 32   # 25 used; 32 keeps the fetch matmul one MXU pass deep
LEAF_ROWS = 128  # 27 * max_leaf (<= 4) used
TAB_ROWS = NODE_ROWS + LEAF_ROWS


@struct.dataclass
class TreeletTables:
    """Chunked bf16 treelet slabs for the kernel: (n_treelets, 160, T)."""

    tab: jnp.ndarray
    T: int = struct.field(pytree_node=False, default=DEFAULT_T)
    num_nodes: int = struct.field(pytree_node=False, default=0)
    max_leaf: int = struct.field(pytree_node=False, default=4)

    @property
    def n_treelets(self) -> int:
        return self.tab.shape[0]


def _trunc_bf16(x):
    """Truncate f32 to its top 16 bits (an exact-in-bf16 value), by integer
    mantissa masking.  Round-to-nearest via ``astype(bf16)`` is NOT safe
    here: the TPU compile path sets ``--xla_allow_excess_precision=true``,
    which lets XLA elide f32->bf16->f32 convert round-trips inside a jit —
    the residual ``x - hi`` then folds to zero and the tables silently
    carry bf16 precision only (measured: every same-tri hit off at ~2^-8
    relative).  Bit masking keeps the split value-exact under any
    precision-propagation regime."""
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.int32)
        & jnp.int32(np.int32(np.uint32(0xFFFF0000))),
        jnp.float32)


def _chunk3_float(x):
    """f32 -> three disjoint-mantissa windows (each exact in bf16); the
    f32 sum of the three reconstructs x bit-exactly (8+8+8 >= 24 bits)."""
    h = _trunc_bf16(x)
    r1 = x - h          # exact: needs only the 16 mantissa bits h dropped
    m = _trunc_bf16(r1)
    r2 = r1 - m         # exact: <= 8 significant bits remain
    return (h.astype(jnp.bfloat16), m.astype(jnp.bfloat16),
            r2.astype(jnp.bfloat16))


def _chunk3_int(x):
    """int32 in [0, 2^24) -> three pre-scaled bf16 digits (sum = value)."""
    c0 = (x & 255).astype(jnp.float32)
    c1 = (((x >> 8) & 255) << 8).astype(jnp.float32)
    c2 = (((x >> 16) & 255) << 16).astype(jnp.float32)
    return (c0.astype(jnp.bfloat16), c1.astype(jnp.bfloat16),
            c2.astype(jnp.bfloat16))


def build_treelet_tables(bvh, T: int = DEFAULT_T) -> TreeletTables:
    """Pack a built BVH (accel/bvh.BVH) into chunked treelet slabs.

    Runs on device with jnp ops (no host round-trips over the tunnel);
    160 bf16 rows = ~320 B/node of extra HBM (0.83 GB at 2.6M nodes).

    Index-range contract: ``first + k`` (leaf prim indices) must stay
    below 2^24 or _chunk3_int silently drops the high bits.  Checked
    here when the BVH arrays are concrete; Scene.with_treelet() also
    enforces it statically from the mesh triangle count (a mesh with
    max_leaf=4 can hold up to ~2x num_nodes triangles, so the node-count
    check alone does not cover it)."""
    m = bvh.num_nodes
    if m >= (1 << 24):
        raise ValueError(f"treelet tables need node count < 2^24, got {m}")
    if not isinstance(jnp.asarray(bvh.node_rec), jax.core.Tracer):
        ints_chk = jax.lax.bitcast_convert_type(bvh.node_rec[:, 6:9],
                                                jnp.int32)
        max_prim = int(jnp.max(ints_chk[:, 0] + ints_chk[:, 1]))
        if max_prim > (1 << 24):
            raise ValueError(
                f"treelet tables need leaf prim indices < 2^24, got "
                f"{max_prim} (mesh too large for the bf16 int split)")
    max_leaf = bvh.max_leaf
    if 27 * max_leaf > LEAF_ROWS:
        raise ValueError(f"max_leaf {max_leaf} > 4 overflows the leaf slab")
    n_t = -(-m // T)
    mp = n_t * T
    pad = mp - m

    ints = jax.lax.bitcast_convert_type(bvh.node_rec[:, 6:9], jnp.int32)
    first, count, skip = ints[:, 0], ints[:, 1], ints[:, 2]
    if pad:
        z = jnp.zeros((pad,), jnp.int32)
        first = jnp.concatenate([first, z])
        count = jnp.concatenate([count, z])
        # padded nodes are unreachable; point their rope at M (= done)
        skip = jnp.concatenate([skip, jnp.full((pad,), m, jnp.int32)])

    def padf(a):
        return jnp.concatenate([a, jnp.zeros((pad, a.shape[1]), a.dtype)]) \
            if pad else a

    bmin = padf(bvh.bounds_min)
    bmax = padf(bvh.bounds_max)
    leaf = padf(bvh.leaf_rec[:, :9 * max_leaf])

    rows = []
    for c in range(6):
        comp = bmin[:, c] if c < 3 else bmax[:, c - 3]
        rows.extend(_chunk3_float(comp))
    rows.extend(_chunk3_int(first))
    rows.append(jnp.minimum(count, 255).astype(jnp.bfloat16))
    rows.extend(_chunk3_int(skip))
    node_half = jnp.stack(rows)  # (25, mp)
    node_half = jnp.concatenate(
        [node_half,
         jnp.zeros((NODE_ROWS - node_half.shape[0], mp), jnp.bfloat16)])

    lrows = []
    for c in range(9 * max_leaf):
        lrows.extend(_chunk3_float(leaf[:, c]))
    leaf_half = jnp.stack(lrows)  # (27*max_leaf, mp)
    leaf_half = jnp.concatenate(
        [leaf_half,
         jnp.zeros((LEAF_ROWS - leaf_half.shape[0], mp), jnp.bfloat16)])

    tab = jnp.concatenate([node_half, leaf_half])  # (TAB_ROWS, mp)
    tab = jnp.moveaxis(tab.reshape(TAB_ROWS, n_t, T), 1, 0)
    return TreeletTables(tab=tab, T=T, num_nodes=m, max_leaf=max_leaf)


def _sum3(q, r):
    return q[r:r + 1, :] + q[r + 1:r + 2, :] + q[r + 2:r + 3, :]


def _cross_rows(a, b):
    """Cross product of two (3, R) row stacks."""
    return jnp.concatenate([
        a[1:2] * b[2:3] - a[2:3] * b[1:2],
        a[2:3] * b[0:1] - a[0:1] * b[2:3],
        a[0:1] * b[1:2] - a[1:2] * b[0:1],
    ])


def _dot_rows(a, b):
    return jnp.sum(a * b, axis=0, keepdims=True)


def _kernel(feats_ref, *refs, T, M, max_leaf, any_hit, resume=False,
            max_loads=0):
    """Treelet walk over one ray tile.

    ``resume=False``: start every lane at the root (one-launch mode).
    ``resume=True`` (wavefront mode): two extra state refs precede
    ``tab_hbm`` — (8, R) f32 [row 0 best_t] and (8, R) i32 [row 0 cursor,
    row 1 best_tri]; the walk resumes from them and the updated cursor is
    written out so the wavefront driver can re-sort lanes by treelet
    between launches.  ``max_loads > 0`` additionally stops the launch
    after that many treelet residencies (0 = walk to completion)."""
    if resume:
        sf_ref, si_ref, tab_hbm, bt_ref, bi_ref, buf, loc_ref, sem = refs
    else:
        tab_hbm, bt_ref, bi_ref, buf, loc_ref, sem = refs
    R = feats_ref.shape[1]
    o = feats_ref[0:3, :]
    d = feats_ref[3:6, :]
    inv = feats_ref[6:9, :]
    tmin = feats_ref[9:10, :]

    # int while-carries must start CONCRETE, not splat: a splat zeros init
    # gets the replicated layout, layout inference pins the carry to it,
    # and the body's updated (concrete) value then needs an impossible
    # concrete->replicated relayout ("Invalid relayout ... replicated in
    # destination but not in source").  Deriving the inits from a VMEM
    # load gives them a concrete layout.
    zrow = feats_ref[11:12, :].astype(jnp.int32)  # zeros, concrete layout
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, R), 0)  # loop-invariant
    if resume:
        cursor0 = si_ref[0:1, :]
        best_tri0 = si_ref[1:2, :]
        best_t0 = sf_ref[0:1, :]
    else:
        cursor0 = zrow
        best_t0 = feats_ref[10:11, :]
        best_tri0 = zrow - 1
    visits0 = zrow

    def outer_cond(c):
        live = jnp.any(c[0] < M)
        if max_loads:
            return live & (c[4] < max_loads)
        return live

    def outer_body(c):
        cursor, best_t, best_tri, visits, loads, iters, leafs = c
        cm = jnp.where(cursor < M, cursor, M)
        # Mosaic can't full-reduce a (1, R) i32 (relayout to replicated
        # fails); stack to the probe-proven (8, R) shape first
        curmin = jnp.min(jnp.concatenate([cm] * 8))
        tid = curmin // T
        base = tid * T
        # the last treelet's node range extends past M with padding; a
        # finished lane (cursor == M) must not count as in-treelet or it
        # walks padded nodes (rope = M) forever
        end = jnp.minimum(base + T, M)
        cp = pltpu.make_async_copy(tab_hbm.at[tid], buf, sem)
        cp.start()
        cp.wait()

        def inner_cond(ic):
            cur = ic[0]
            return jnp.any((cur >= base) & (cur < end))

        def inner_body(ic):
            cursor, best_t, best_tri, visits, iters, leafs = ic
            in_t = (cursor >= base) & (cursor < end)
            # round-trip through VMEM: a while-carry (1, R) i32 has a
            # fixed non-replicated layout, and Mosaic can't relayout it
            # for the (T, R) broadcast below; a fresh load can pick the
            # replicated layout the broadcast wants
            loc_ref[:] = jnp.where(in_t, cursor - base, T)
            local = loc_ref[:]
            onehot = (iota == local).astype(jnp.bfloat16)  # (T, R)
            qn = jnp.dot(buf[0:NODE_ROWS, :], onehot,
                         preferred_element_type=jnp.float32)  # (32, R)
            bmin = jnp.concatenate([_sum3(qn, 0), _sum3(qn, 3),
                                    _sum3(qn, 6)])
            bmax = jnp.concatenate([_sum3(qn, 9), _sum3(qn, 12),
                                    _sum3(qn, 15)])
            first = _sum3(qn, 18).astype(jnp.int32)
            count = qn[21:22, :]  # f32, exact small int
            skip = _sum3(qn, 22).astype(jnp.int32)

            # slab test — op-for-op the XLA walk's _slab
            t1 = (bmin - o) * inv
            t2 = (bmax - o) * inv
            tn = jnp.max(jnp.minimum(t1, t2), axis=0, keepdims=True)
            tf = jnp.min(jnp.maximum(t1, t2), axis=0, keepdims=True)
            tn = jnp.maximum(tn, 0.0)
            hit_box = (tn <= tf) & (tn <= best_t) & (tf >= 0.0) & in_t
            is_leaf = (count > 0.0) & hit_box

            def leaf_pass(args):
                best_t, best_tri = args
                ql = jnp.dot(buf[NODE_ROWS:TAB_ROWS, :], onehot,
                             preferred_element_type=jnp.float32)
                for k in range(max_leaf):
                    b = 27 * k
                    v0 = jnp.concatenate(
                        [_sum3(ql, b), _sum3(ql, b + 3), _sum3(ql, b + 6)])
                    e1 = jnp.concatenate(
                        [_sum3(ql, b + 9), _sum3(ql, b + 12),
                         _sum3(ql, b + 15)])
                    e2 = jnp.concatenate(
                        [_sum3(ql, b + 18), _sum3(ql, b + 21),
                         _sum3(ql, b + 24)])
                    # Möller-Trumbore — op-for-op the XLA walk's _mt_single
                    pvec = _cross_rows(d, e2)
                    det = _dot_rows(e1, pvec)
                    ok = jnp.abs(det) > 1e-12
                    invd = jnp.where(
                        ok, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
                    tvec = o - v0
                    u = _dot_rows(tvec, pvec) * invd
                    qvec = _cross_rows(tvec, e1)
                    v = _dot_rows(d, qvec) * invd
                    t = _dot_rows(e2, qvec) * invd
                    valid = (ok & (u >= 0) & (u <= 1) & (v >= 0)
                             & (u + v <= 1) & (t > tmin) & (t < best_t))
                    take = is_leaf & (float(k) < count) & valid \
                        & (t < best_t)
                    best_t = jnp.where(take, t, best_t)
                    best_tri = jnp.where(take, first + k, best_tri)
                return best_t, best_tri

            any_leaf = jnp.any(is_leaf)
            best_t, best_tri = jax.lax.cond(
                any_leaf, leaf_pass, lambda a: a, (best_t, best_tri))
            iters = iters + 1
            leafs = leafs + any_leaf.astype(jnp.int32)

            nxt = jnp.where(hit_box & (count == 0.0), cursor + 1, skip)
            if any_hit:
                nxt = jnp.where(best_tri >= 0, M, nxt)
            cursor = jnp.where(in_t, nxt, cursor)
            visits = visits + in_t.astype(jnp.int32)
            return cursor, best_t, best_tri, visits, iters, leafs

        cursor, best_t, best_tri, visits, iters, leafs = jax.lax.while_loop(
            inner_cond, inner_body,
            (cursor, best_t, best_tri, visits, iters, leafs))
        return cursor, best_t, best_tri, visits, loads + 1, iters, leafs

    cursor, best_t, best_tri, visits, loads, iters, leafs = \
        jax.lax.while_loop(
            outer_cond, outer_body,
            (cursor0, best_t0, best_tri0, visits0, jnp.int32(0),
             jnp.int32(0), jnp.int32(0)))

    # Mosaic wants >=(8, 128) output blocks; row 0 carries the payload,
    # rows 1-2 of the int block carry the stats.  Concatenate instead of
    # broadcast_to: Mosaic can't relayout a concrete (1, R) vector to the
    # replicated layout a sublane broadcast wants.
    z1 = jnp.zeros((1, R), jnp.int32)
    bt_ref[:] = jnp.concatenate(
        [best_t, jnp.zeros((7, R), jnp.float32)])
    if resume:
        bi_ref[:] = jnp.concatenate(
            [best_tri, cursor, visits, z1 + loads, z1 + iters, z1 + leafs,
             jnp.zeros((2, R), jnp.int32)])
    else:
        bi_ref[:] = jnp.concatenate(
            [best_tri, visits, z1 + loads, z1 + iters, z1 + leafs,
             jnp.zeros((3, R), jnp.int32)])


def _make_feats(origins, directions, t_min, t_max, R):
    """(16, n_pad) per-ray feature rows, padded to a tile multiple with
    dead lanes (empty ray interval)."""
    n = origins.shape[0]
    n_pad = -(-n // R) * R
    tmin_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    tmax_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    inv_d = 1.0 / jnp.where(jnp.abs(directions) < 1e-20,
                            jnp.where(directions < 0, -1e-20, 1e-20),
                            directions)
    feats = jnp.concatenate([
        origins.T, directions.T, inv_d.T, tmin_b[None, :], tmax_b[None, :],
        jnp.zeros((5, n), jnp.float32),
    ])  # (16, n)
    if n_pad != n:
        # pad lanes carry the live-lane inv_d convention for direction
        # (0, 0, 1): inv = (1e20, 1e20, 1.0).  The values never matter —
        # t_max = -inf gives an empty interval, so the lane dies at the
        # root — but keeping them formula-consistent avoids a trap if the
        # dead-lane convention ever changes.
        pad = jnp.zeros((16, n_pad - n), jnp.float32)
        pad = pad.at[5, :].set(1.0)        # direction z=1
        pad = pad.at[6, :].set(1e20)       # inv of x=0 (clamped)
        pad = pad.at[7, :].set(1e20)       # inv of y=0 (clamped)
        pad = pad.at[8, :].set(1.0)        # inv of z=1
        pad = pad.at[10, :].set(-jnp.inf)  # dead: empty interval
        feats = jnp.concatenate([feats, pad], axis=1)
    return feats, n_pad


def intersect_bvh_treelet(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    tables: TreeletTables,
    t_min=T_EPS,
    t_max=jnp.inf,
    any_hit: bool = False,
    ray_tile: int = DEFAULT_R,
    interpret: bool = False,
    with_stats: bool = False,
):
    """Nearest-hit (or any-hit occlusion mask) treelet-kernel traversal.

    Bit-identical to accel/bvh.intersect_bvh on the same BVH.  Lanes whose
    ``t_max`` is -inf are dead (dispatch gating convention): they fall off
    the root's rope after one visit and report no hit."""
    n = origins.shape[0]
    R = ray_tile
    feats, n_pad = _make_feats(origins, directions, t_min, t_max, R)
    n_tiles = n_pad // R
    T = tables.T
    kern = functools.partial(_kernel, T=T, M=tables.num_nodes,
                             max_leaf=tables.max_leaf, any_hit=any_hit)
    bt, bi = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((16, R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # treelet slabs in HBM
        ],
        out_specs=(
            pl.BlockSpec((8, R), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, R), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8 * n_tiles, R), jnp.float32),
            jax.ShapeDtypeStruct((8 * n_tiles, R), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TAB_ROWS, T), jnp.bfloat16),
            pltpu.VMEM((1, R), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(feats, tables.tab)
    bt = bt.reshape(n_tiles, 8, R)
    bi = bi.reshape(n_tiles, 8, R)
    best_t = bt[:, 0, :].reshape(-1)[:n]
    best_tri = bi[:, 0, :].reshape(-1)[:n]
    valid = best_tri >= 0
    hit = Hit(t=jnp.where(valid, best_t, jnp.inf), tri=best_tri,
              valid=valid)
    if any_hit:
        hit = valid
    if with_stats:
        return hit, {"visits": bi[:, 1, :].reshape(-1)[:n],
                     "loads": bi[:, 2, 0], "iters": bi[:, 3, 0],
                     "leafs": bi[:, 4, 0]}
    return hit


def occluded_bvh_treelet(origins, directions, tables, max_dist,
                         t_min=T_EPS, ray_tile: int = DEFAULT_R,
                         interpret: bool = False):
    return intersect_bvh_treelet(
        origins, directions, tables, t_min=t_min, t_max=max_dist,
        any_hit=True, ray_tile=ray_tile, interpret=interpret)


# ---------------------------------------------------------------------------
# Wavefront (queued) traversal: re-sort lanes by resident treelet between
# bounded kernel launches.
#
# The single-launch kernel is iteration-bound on incoherent rays: lanes in
# a tile sit in DIFFERENT treelets, the min-cursor hop serializes them, and
# lockstep occupancy collapses to ~4% on the 4.2M-tri bounce regime
# (PERF.md §treelet).  The fix is scheduling, not the kernel: bound each
# launch to ``loads_per_pass`` treelet residencies, return each lane's
# cursor, and re-sort lanes by cursor between launches so a tile's lanes
# converge to the SAME resident treelet.  The rope cursor is strictly
# increasing in DFS order, so sorted-by-cursor stays near-sorted and every
# pass strictly advances the global min cursor (no livelock; mixed tiles
# still progress through the kernel's min-cursor hop).
#
# Scheduling never changes per-ray results: each lane's walk is a
# deterministic function of (ray, BVH), so the wavefront output is
# bit-identical to the single-launch kernel and the XLA roped walk.
# ---------------------------------------------------------------------------


# bounded: every distinct ray-batch size (n_tiles) pins another
# pallas_call / jitted executable; long-running renders with varying
# wavefront widths would otherwise grow these caches without limit
@functools.lru_cache(maxsize=32)
def _resume_call(T, M, max_leaf, any_hit, R, n_tiles, max_loads,
                 interpret):
    """pallas_call for one resume-mode launch (cached per static config)."""
    kern = functools.partial(_kernel, T=T, M=M, max_leaf=max_leaf,
                             any_hit=any_hit, resume=True,
                             max_loads=max_loads)
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((16, R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, R), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, R), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # treelet slabs in HBM
        ],
        out_specs=(
            pl.BlockSpec((8, R), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, R), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8 * n_tiles, R), jnp.float32),
            jax.ShapeDtypeStruct((8 * n_tiles, R), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TAB_ROWS, T), jnp.bfloat16),
            pltpu.VMEM((1, R), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )


def _make_pass(T, M, max_leaf, any_hit, R, n_tiles, max_loads, interpret):
    """One wavefront pass: sort lanes by cursor, resume the bounded walk.

    Pure traced function of (tab, carry) — usable inside jit/scan."""
    call = _resume_call(T, M, max_leaf, any_hit, R, n_tiles, max_loads,
                        interpret)

    def one_pass(tab, carry):
        feats, best_t, cursor, best_tri, orig, vis, it_a, ld_a, lf_a = carry
        # done lanes key to +inf so they pack last; ties keep order
        key = jnp.where(cursor < M, cursor, jnp.int32(0x7FFFFFFF))
        perm = jnp.argsort(key)
        feats = feats[:, perm]
        best_t, cursor, best_tri = (best_t[perm], cursor[perm],
                                    best_tri[perm])
        orig, vis = orig[perm], vis[perm]
        sf = jnp.zeros((n_tiles, 8, R), jnp.float32)
        sf = sf.at[:, 0, :].set(best_t.reshape(n_tiles, R))
        si = jnp.zeros((n_tiles, 8, R), jnp.int32)
        si = si.at[:, 0, :].set(cursor.reshape(n_tiles, R))
        si = si.at[:, 1, :].set(best_tri.reshape(n_tiles, R))
        bt, bi = call(feats, sf.reshape(8 * n_tiles, R),
                      si.reshape(8 * n_tiles, R), tab)
        bt = bt.reshape(n_tiles, 8, R)
        bi = bi.reshape(n_tiles, 8, R)
        best_t = bt[:, 0, :].reshape(-1)
        best_tri = bi[:, 0, :].reshape(-1)
        cursor = bi[:, 1, :].reshape(-1)
        vis = vis + bi[:, 2, :].reshape(-1)
        ld_a = ld_a + jnp.sum(bi[:, 3, 0])
        it_a = it_a + jnp.sum(bi[:, 4, 0])
        lf_a = lf_a + jnp.sum(bi[:, 5, 0])
        return (feats, best_t, cursor, best_tri, orig, vis,
                it_a, ld_a, lf_a)

    return one_pass


@functools.lru_cache(maxsize=32)
def _queued_chunk(T, M, max_leaf, any_hit, R, n_tiles, loads_per_pass,
                  passes_per_sync, interpret):
    """Jitted ``passes_per_sync``-pass wavefront chunk for one static
    config (cached so repeated calls reuse the compiled executable)."""
    one_pass = _make_pass(T, M, max_leaf, any_hit, R, n_tiles,
                          loads_per_pass, interpret)

    def sync_chunk(carry, tab):
        return jax.lax.scan(lambda c, _: (one_pass(tab, c), None),
                            carry, None, length=passes_per_sync)[0]

    return sync_chunk if interpret else jax.jit(sync_chunk)


def _wavefront_init(feats, n_pad):
    z = jnp.int32(0)
    return (feats,
            feats[10, :],                                  # best_t = tmax
            jnp.zeros((n_pad,), jnp.int32),                # cursor at root
            jnp.full((n_pad,), -1, jnp.int32),
            jnp.arange(n_pad, dtype=jnp.int32),
            jnp.zeros((n_pad,), jnp.int32), z, z, z)


def _wavefront_finish(carry, n, any_hit, with_stats, passes):
    _, best_t, cursor, best_tri, orig, vis, it_a, ld_a, lf_a = carry
    n_pad = orig.shape[0]
    inv = jnp.zeros((n_pad,), jnp.int32).at[orig].set(
        jnp.arange(n_pad, dtype=jnp.int32))
    best_t = best_t[inv][:n]
    best_tri = best_tri[inv][:n]
    valid = best_tri >= 0
    hit = Hit(t=jnp.where(valid, best_t, jnp.inf), tri=best_tri,
              valid=valid)
    if any_hit:
        hit = valid
    if with_stats:
        return hit, {"visits": vis[inv][:n], "loads": ld_a,
                     "iters": it_a, "leafs": lf_a, "passes": passes}
    return hit


def intersect_bvh_treelet_wavefront(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    tables: TreeletTables,
    t_min=T_EPS,
    t_max=jnp.inf,
    any_hit: bool = False,
    ray_tile: int = DEFAULT_R,
    interpret: bool = False,
    with_stats: bool = False,
    loads_per_pass: int = 1,
    max_passes: int = 12,
):
    """Fully-traceable wavefront traversal (usable inside jit / scan /
    shard_map, unlike the host-driven :func:`intersect_bvh_treelet_queued`).

    Runs ``max_passes`` cond-gated sorted passes of ``loads_per_pass``
    treelet residencies, then ONE unbounded resume launch that walks any
    stragglers to completion — so ``max_passes`` is purely a performance
    knob, never a correctness bound.  Bit-identical to the XLA roped walk
    and both other treelet drivers."""
    n = origins.shape[0]
    R = ray_tile
    feats, n_pad = _make_feats(origins, directions, t_min, t_max, R)
    n_tiles = n_pad // R
    M = tables.num_nodes
    args = (tables.T, M, tables.max_leaf, any_hit, R, n_tiles)
    one_pass = _make_pass(*args, loads_per_pass, interpret)
    finish = _make_pass(*args, 0, interpret)  # unbounded resume launch

    def step(carry, _):
        alive = jnp.any(carry[2] < M)
        carry = jax.lax.cond(alive, lambda c: one_pass(tables.tab, c),
                             lambda c: c, carry)
        return carry, None

    carry = _wavefront_init(feats, n_pad)
    if max_passes > 0:
        carry, _ = jax.lax.scan(step, carry, None, length=max_passes)
    carry = finish(tables.tab, carry)
    return _wavefront_finish(carry, n, any_hit, with_stats,
                             max_passes + 1)


def intersect_bvh_treelet_queued(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    tables: TreeletTables,
    t_min=T_EPS,
    t_max=jnp.inf,
    any_hit: bool = False,
    ray_tile: int = DEFAULT_R,
    interpret: bool = False,
    with_stats: bool = False,
    loads_per_pass: int = 4,
    passes_per_sync: int = 8,
    max_sync_rounds: int = 4096,
):
    """Wavefront treelet traversal: sorted passes of bounded launches.

    Same contract as :func:`intersect_bvh_treelet` (bit-identical hits,
    dead lanes via ``t_max = -inf``).  ``loads_per_pass`` bounds treelet
    residencies per launch; ``passes_per_sync`` passes run inside one
    ``lax.scan`` dispatch between host-side all-done checks (a while_loop
    around pallas_call compiles pathologically slowly — CLAUDE.md)."""
    from light_transport_tpu.core.hostio import host_get

    n = origins.shape[0]
    R = ray_tile
    feats, n_pad = _make_feats(origins, directions, t_min, t_max, R)
    n_tiles = n_pad // R
    M = tables.num_nodes
    chunk = _queued_chunk(tables.T, M, tables.max_leaf, any_hit, R,
                          n_tiles, loads_per_pass, passes_per_sync,
                          interpret)

    carry = _wavefront_init(feats, n_pad)
    passes = 0
    for _ in range(max_sync_rounds):
        carry = chunk(carry, tables.tab)
        passes += passes_per_sync
        if not bool(host_get(jnp.any(carry[2] < M))):
            break
    else:
        raise RuntimeError(
            f"treelet wavefront did not converge in "
            f"{max_sync_rounds * passes_per_sync} passes")

    return _wavefront_finish(carry, n, any_hit, with_stats, passes)
