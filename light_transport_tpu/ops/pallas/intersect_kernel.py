"""Pallas MXU ray-triangle intersection kernel.

The XLA version of the MXU intersector (ops/intersect.intersect_rays_mxu)
routes the Möller–Trumbore determinants through the systolic array but then
materializes the (rays, 4*tris) product in HBM, making it bandwidth-bound.
This kernel fuses everything: per (ray-tile, tri-tile) grid step it

  1. matmuls the (R, 16) ray features against the (16, 4*Tt) triangle
     weights entirely in VMEM,
  2. applies the masked Möller-Trumbore validity tests on the VPU,
  3. folds the results into per-ray running minima held in VMEM across the
     tri-tile grid dimension (the standard reduction-dim revisiting
     pattern).

To avoid in-kernel cross-lane argmin, the running minimum is kept per lane
column: output (R, 128) where column c tracks triangles with
(tri_index mod 128) == c; the final 128-way argmin runs outside the kernel
on an (N, 128) array — negligible.

Ray feature layout (16-padded): [d(3), o x d(3), o(3), 1, pad(6)].
Triangle weights: four (16, T) blocks (det, u_num, v_num, t_num), see
ops/intersect.mxu_tri_features.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from light_transport_tpu.core import math as lm
from light_transport_tpu.ops.intersect import DET_EPS, Hit
from light_transport_tpu.scene.geometry import TriangleMesh

RAY_TILE = 128
TRI_TILE = 512  # must be a multiple of 128
BIG = 3.0e38  # sentinel "no hit" distance (finite so min() stays clean)


def pack_tri_weights(mesh: TriangleMesh):
    """(16, 4, T_padded) f32 triangle weights (see mxu_tri_features), padded
    so T is a multiple of TRI_TILE; padding columns produce det=0 -> always
    invalid."""
    v0 = jnp.asarray(mesh.v0)
    e1 = jnp.asarray(mesh.e1)
    e2 = jnp.asarray(mesh.e2)
    n2 = lm.cross(e1, e2)
    k0 = lm.dot(v0, n2)
    t = v0.shape[0]
    t_pad = ((t + TRI_TILE - 1) // TRI_TILE) * TRI_TILE
    w = jnp.zeros((16, 4, t_pad), jnp.float32)
    w = w.at[0:3, 0, :t].set(-n2.T)
    w = w.at[3:6, 1, :t].set(e2.T)
    w = w.at[0:3, 1, :t].set(-lm.cross(e2, v0).T)
    w = w.at[3:6, 2, :t].set(-e1.T)
    w = w.at[0:3, 2, :t].set(-lm.cross(v0, e1).T)
    w = w.at[6:9, 3, :t].set(n2.T)
    w = w.at[9, 3, :t].set(-k0)
    return w


def _kernel(mask_ref, feat_ref, w_ref, tminmax_ref, best_t_ref,
            best_col_ref, *, tri_tile, n_clusters, any_hit):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_t_ref[:] = jnp.full_like(best_t_ref, BIG)
        best_col_ref[:] = jnp.full_like(best_col_ref, -1)

    # cluster culling: skip the whole tile when no ray in this ray-tile
    # enters this triangle-cluster's AABB (mask precomputed outside).
    # The mask is flattened to 1D: a 2D (tiles, C) SMEM array pads every
    # row to 128 lanes (512 B), which blows the 1 MB SMEM budget for
    # many-ray-tile few-cluster scenes.
    work = mask_ref[i * n_clusters + j] != 0
    if any_hit:
        # occlusion early-out: once every lane in the ray tile has a hit,
        # the remaining cluster steps have nothing left to decide
        work = work & jnp.any(best_col_ref[:] < 0)

    @pl.when(work)
    def _():
        feats = feat_ref[:]  # (R, 16)
        w = w_ref[0]  # (16, 4*tri_tile)
        # HIGHEST precision: the default f32 matmul runs bf16 passes on the
        # MXU, whose 8-bit mantissa flips hit/miss decisions near triangle
        # edges (9% wrong-triangle rate on silhouette rays before this)
        q = jnp.dot(feats, w, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        det = q[:, 0:tri_tile]
        u_num = q[:, tri_tile:2 * tri_tile]
        v_num = q[:, 2 * tri_tile:3 * tri_tile]
        t_num = q[:, 3 * tri_tile:4 * tri_tile]

        ok = jnp.abs(det) > DET_EPS
        inv = jnp.where(ok, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
        u = u_num * inv
        v = v_num * inv
        t = t_num * inv
        tmin = tminmax_ref[:, 0:1]
        tmax = tminmax_ref[:, 1:2]
        valid = (
            ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > tmin) & (t < tmax)
        )
        t_masked = jnp.where(valid, t, BIG)

        # fold sub-blocks of 128 lanes into the per-column running min
        best_t = best_t_ref[:]
        best_col = best_col_ref[:]
        for k in range(tri_tile // 128):
            sub_t = t_masked[:, k * 128:(k + 1) * 128]
            # global tri index = j*tri_tile + k*128 + column
            sub_idx = j * tri_tile + k * 128
            take = sub_t < best_t
            best_t = jnp.where(take, sub_t, best_t)
            best_col = jnp.where(take, sub_idx, best_col)
        best_t_ref[:] = best_t
        best_col_ref[:] = best_col


def _gather_kernel(ids_ref, cnt_ref, feat_ref, tminmax_ref, w_hbm,
                   best_t_ref, best_col_ref, wbuf, sems, *, tri_tile,
                   n_ids):
    """Per ray-tile: loop over the tile's *active* clusters only, manually
    DMAing each cluster's weight block HBM->VMEM with double buffering.

    The dense-grid kernel above pays one grid step per (ray tile, cluster)
    pair even when the cull mask skips it — at 241 clusters (123k tris)
    skipped-step overhead dominates the render.  Here the grid is ray tiles
    only; the active-cluster id list and count arrive via scalar prefetch
    (SMEM), so the inner fori_loop does exactly as many matmuls as the cull
    lets through.  This is the "two-level MXU scheme" of PERF.md: culling at
    cluster granularity, brute-force MXU inside a cluster.

    The id list is capped at ``n_ids`` entries per tile (its SMEM footprint
    would otherwise scale with cluster count and shrink the ray chunks —
    the round-2 >1M-triangle cliff).  Overflow tiles are flagged with
    ``cnt = total_clusters > n_ids`` and loop *every* cluster by identity
    instead of through the list; after coherence ray sorting almost no
    tile activates more than n_ids clusters, so the overflow path is the
    rare-worst-case fallback, not the norm.
    """
    i = pl.program_id(0)
    best_t_ref[:] = jnp.full_like(best_t_ref, BIG)
    best_col_ref[:] = jnp.full_like(best_col_ref, -1)
    n_act = cnt_ref[i]
    overflow = n_act > n_ids

    def cid(k):
        return jnp.where(overflow, k,
                         ids_ref[i, jnp.minimum(k, n_ids - 1)])

    def dma(k, slot):
        return pltpu.make_async_copy(
            w_hbm.at[cid(k)], wbuf.at[slot], sems.at[slot])

    @pl.when(n_act > 0)
    def _():
        dma(0, 0).start()

    def body(k, carry):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n_act)
        def _():
            dma(k + 1, jax.lax.rem(k + 1, 2)).start()

        dma(k, slot).wait()
        w = wbuf[slot]  # (16, 4*tri_tile)
        feats = feat_ref[:]
        q = jnp.dot(feats, w, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        det = q[:, 0:tri_tile]
        u_num = q[:, tri_tile:2 * tri_tile]
        v_num = q[:, 2 * tri_tile:3 * tri_tile]
        t_num = q[:, 3 * tri_tile:4 * tri_tile]
        ok = jnp.abs(det) > DET_EPS
        inv = jnp.where(ok, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
        u = u_num * inv
        v = v_num * inv
        t = t_num * inv
        tmin = tminmax_ref[:, 0:1]
        tmax = tminmax_ref[:, 1:2]
        valid = (
            ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > tmin) & (t < tmax)
        )
        t_masked = jnp.where(valid, t, BIG)
        base = cid(k) * tri_tile
        best_t = best_t_ref[:]
        best_col = best_col_ref[:]
        for s in range(tri_tile // 128):
            sub_t = t_masked[:, s * 128:(s + 1) * 128]
            take = sub_t < best_t
            best_t = jnp.where(take, sub_t, best_t)
            best_col = jnp.where(take, base + s * 128, best_col)
        best_t_ref[:] = best_t
        best_col_ref[:] = best_col
        return carry

    jax.lax.fori_loop(0, n_act, body, 0)


def _intersect_gather_cull(feats, tminmax, tri_weights_c, ids, cnt, n_pad):
    """pallas_call wrapper for :func:`_gather_kernel`.

    ``tri_weights_c``: (C, 16, 4*TRI_TILE) resident in HBM (memory_space
    ANY); ``ids``/``cnt``: (tiles, C) compacted active-cluster indices and
    (tiles,) counts, delivered by scalar prefetch."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pad // RAY_TILE,),
        in_specs=[
            pl.BlockSpec((RAY_TILE, 16), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 2), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # weights stay in HBM
        ],
        out_specs=(
            pl.BlockSpec((RAY_TILE, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 16, 4 * TRI_TILE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = functools.partial(_gather_kernel, tri_tile=TRI_TILE,
                             n_ids=ids.shape[1])
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 128), jnp.int32),
        ),
    )(ids, cnt, feats, tminmax, tri_weights_c)


def cluster_bounds(mesh: TriangleMesh):
    """(C, 6) AABBs of consecutive TRI_TILE-sized triangle clusters (the
    BVH-reordered mesh gives them spatial locality).  Padding replicates
    the last triangle (harmless for bounds)."""
    v0 = jnp.asarray(mesh.v0)
    v1 = v0 + jnp.asarray(mesh.e1)
    v2 = v0 + jnp.asarray(mesh.e2)
    lo = jnp.minimum(jnp.minimum(v0, v1), v2)
    hi = jnp.maximum(jnp.maximum(v0, v1), v2)
    t = v0.shape[0]
    t_pad = ((t + TRI_TILE - 1) // TRI_TILE) * TRI_TILE
    if t_pad != t:
        lo = jnp.concatenate([lo, jnp.tile(lo[-1:], (t_pad - t, 1))])
        hi = jnp.concatenate([hi, jnp.tile(hi[-1:], (t_pad - t, 1))])
    # scale-relative pad: the f32 slab test in _tile_cluster_mask has
    # coordinate-proportional rounding error, so an absolute 1e-5 pad
    # under-covers scenes with coordinates >> 1 (a grazing ray-tile could
    # be wrongly culled, a silhouette hole brute force would not have)
    eps = 1e-5 * jnp.maximum(
        1.0, jnp.maximum(jnp.abs(lo).max(), jnp.abs(hi).max()))
    c_lo = lo.reshape(-1, TRI_TILE, 3).min(axis=1) - eps
    c_hi = hi.reshape(-1, TRI_TILE, 3).max(axis=1) + eps
    return c_lo, c_hi


def _tile_cluster_mask(origins, directions, tminmax, c_lo, c_hi):
    """(n_ray_tiles, C) int32: does any ray of the tile enter the cluster
    AABB?  Conservative slab test (ignores per-ray running-t pruning)."""
    inv_d = 1.0 / jnp.where(jnp.abs(directions) < 1e-20,
                            jnp.where(directions < 0, -1e-20, 1e-20),
                            directions)
    t1 = (c_lo[None, :, :] - origins[:, None, :]) * inv_d[:, None, :]
    t2 = (c_hi[None, :, :] - origins[:, None, :]) * inv_d[:, None, :]
    tn = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tn <= tf) & (tf >= tminmax[:, 0:1]) & (tn <= tminmax[:, 1:2])
    tiles = hit.reshape(-1, RAY_TILE, hit.shape[-1])
    return jnp.any(tiles, axis=1)  # (n_ray_tiles, C) bool


# SMEM budget for the (n_ray_tiles, C) culling mask — chunk rays so the
# mask stays comfortably inside scalar memory
_MASK_MAX_ENTRIES = 65536

# above this cluster count the dense (ray tile x cluster) grid pays more in
# skipped-step overhead than the gather variant pays in manual DMA
_GATHER_MIN_CLUSTERS = 16

# per-tile active-cluster id list cap (gather path).  Uncapped, the
# (tiles, C) list's SMEM footprint scales with cluster count and shrinks
# the ray chunks — the round-2 >1M-triangle cliff.  Tiles whose cull
# admits more than this many clusters are flagged (cnt = C) and loop every
# cluster by identity inside the kernel; after coherence ray sorting such
# tiles are rare.  512 keeps chunks at >=16k rays at any mesh size.
_A_MAX = 512


def intersect_rays_pallas(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    mesh: TriangleMesh,
    tri_weights: Optional[jnp.ndarray] = None,
    t_min=1e-5,
    t_max=jnp.inf,
    any_hit: bool = False,
    max_dist=None,
    clusters=None,
):
    """Fused MXU brute-force intersection with AABB cluster culling.
    Returns :class:`Hit` (or a bool occlusion mask when ``any_hit``).

    ``clusters``: optional precomputed :func:`cluster_bounds`; computed on
    the fly otherwise (XLA hoists it out of bounce loops)."""
    if tri_weights is None:
        tri_weights = pack_tri_weights(mesh)
    if clusters is None:
        clusters = cluster_bounds(mesh)
    n = origins.shape[0]
    t_pad = tri_weights.shape[2]
    n_clusters = t_pad // TRI_TILE

    # chunk rays so the SMEM mask fits.  The gather path's (tiles, A) ids
    # array is scalar-prefetched 2-D, and 2-D SMEM arrays pad each row to
    # the 128-lane width (see _gather_kernel's layout note) — budget
    # against the PADDED row or mid-size scenes (16 <= C < 128) overshoot
    # SMEM by up to 8x (ADVICE r2).  The row width is capped at _A_MAX, so
    # chunks no longer shrink with cluster count (the >1M-tri cliff).  The
    # dense path's mask is flattened 1-D: raw entry count.
    if n_clusters >= _GATHER_MIN_CLUSTERS:
        row = min(n_clusters, _A_MAX)
        padded_row = ((row + 127) // 128) * 128
        max_tiles = max(1, _MASK_MAX_ENTRIES // padded_row)
    else:
        max_tiles = max(1, _MASK_MAX_ENTRIES // n_clusters)
    chunk = max_tiles * RAY_TILE
    if n > chunk:
        tmax_eff = max_dist if (any_hit and max_dist is not None) else t_max
        tmax_b = jnp.broadcast_to(jnp.asarray(tmax_eff, origins.dtype), (n,))
        pad = (-n) % chunk
        o_p = jnp.concatenate([origins, jnp.zeros((pad, 3), origins.dtype)])
        dz = jnp.zeros((pad, 3), directions.dtype).at[:, 2].set(1.0)
        d_p = jnp.concatenate([directions, dz])
        tx_p = jnp.concatenate([tmax_b, jnp.zeros((pad,), tmax_b.dtype)])
        total = o_p.shape[0]
        out = jax.lax.map(
            lambda args: intersect_rays_pallas(
                args[0], args[1], mesh, tri_weights=tri_weights,
                t_min=t_min, t_max=jnp.inf, any_hit=any_hit,
                max_dist=args[2] if any_hit else None, clusters=clusters,
            ) if any_hit else intersect_rays_pallas(
                args[0], args[1], mesh, tri_weights=tri_weights,
                t_min=t_min, t_max=args[2], any_hit=False,
                clusters=clusters,
            ),
            (o_p.reshape(-1, chunk, 3), d_p.reshape(-1, chunk, 3),
             tx_p.reshape(-1, chunk)),
        )
        return jax.tree.map(
            lambda x: x.reshape(total, *x.shape[2:])[:n], out
        )

    n_pad = ((n + RAY_TILE - 1) // RAY_TILE) * RAY_TILE

    oxd = lm.cross(origins, directions)
    feats = jnp.concatenate(
        [directions, oxd, origins,
         jnp.ones((n, 1), origins.dtype),
         jnp.zeros((n, 6), origins.dtype)], axis=-1,
    )
    tmax_eff = max_dist if (any_hit and max_dist is not None) else t_max
    tminmax = jnp.stack(
        [jnp.broadcast_to(jnp.asarray(t_min, origins.dtype), (n,)),
         jnp.broadcast_to(jnp.asarray(tmax_eff, origins.dtype), (n,))],
        axis=-1,
    )
    if n_pad != n:
        feats = jnp.concatenate(
            [feats, jnp.zeros((n_pad - n, 16), feats.dtype)])
        tminmax = jnp.concatenate(
            [tminmax, jnp.zeros((n_pad - n, 2), tminmax.dtype)])

    # weights laid out (n_tri_tiles, 16, 4*TRI_TILE) so each grid step pulls
    # one contiguous block
    w = tri_weights.reshape(16, 4, -1, TRI_TILE)
    w = jnp.moveaxis(w, 2, 0).reshape(-1, 16, 4 * TRI_TILE)

    # per-(ray tile, cluster) culling mask
    c_lo, c_hi = clusters
    mask2d = _tile_cluster_mask(
        feats[:, 6:9], feats[:, 0:3], tminmax, c_lo, c_hi
    )

    if n_clusters >= _GATHER_MIN_CLUSTERS:
        # compacted active-cluster lists: actives first, ascending (stable
        # argsort of the inverted mask), plus per-tile counts; capped at
        # _A_MAX entries — overflow tiles flagged with cnt = n_clusters
        # loop every cluster by identity inside the kernel
        ids = jnp.argsort(~mask2d, axis=1, stable=True).astype(jnp.int32)
        cnt = mask2d.sum(axis=1).astype(jnp.int32)
        if n_clusters > _A_MAX:
            ids = ids[:, :_A_MAX]
            cnt = jnp.where(cnt > _A_MAX, n_clusters, cnt)
        w_c = jnp.moveaxis(
            tri_weights.reshape(16, 4, n_clusters, TRI_TILE), 2, 0
        ).reshape(n_clusters, 16, 4 * TRI_TILE)
        best_t, best_col = _intersect_gather_cull(
            feats, tminmax, w_c, ids, cnt, n_pad)
    else:
        mask = mask2d.astype(jnp.int32).reshape(-1)
        grid = (n_pad // RAY_TILE, t_pad // TRI_TILE)
        kern = functools.partial(_kernel, tri_tile=TRI_TILE,
                                 n_clusters=n_clusters, any_hit=any_hit)
        best_t, best_col = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # (tiles*C,) mask
                pl.BlockSpec((RAY_TILE, 16), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16, 4 * TRI_TILE), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RAY_TILE, 2), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((RAY_TILE, 128), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RAY_TILE, 128), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, 128), jnp.int32),
            ),
        )(mask, feats, w, tminmax)

    best_t = best_t[:n]
    best_col = best_col[:n]
    if any_hit:
        return jnp.any(best_col >= 0, axis=-1)
    # final 128-way argmin on the host-side XLA graph (cheap)
    lane = jnp.argmin(best_t, axis=-1)
    t_best = jnp.take_along_axis(best_t, lane[:, None], axis=-1)[:, 0]
    col = jnp.take_along_axis(best_col, lane[:, None], axis=-1)[:, 0]
    valid = (col >= 0) & (t_best < BIG)
    tri = jnp.where(valid, col + lane.astype(jnp.int32), -1)
    return Hit(
        t=jnp.where(valid, t_best, jnp.inf),
        tri=tri,
        valid=valid,
    )
