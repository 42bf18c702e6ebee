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

RAY_TILE = 256
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


def _kernel(feat_ref, w_ref, tminmax_ref, best_t_ref, best_col_ref,
            *, tri_tile, any_hit):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_t_ref[:] = jnp.full_like(best_t_ref, BIG)
        best_col_ref[:] = jnp.full_like(best_col_ref, -1)

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


def intersect_rays_pallas(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    mesh: TriangleMesh,
    tri_weights: Optional[jnp.ndarray] = None,
    t_min=1e-5,
    t_max=jnp.inf,
    any_hit: bool = False,
    max_dist=None,
):
    """Fused MXU brute-force intersection. Returns :class:`Hit` (or a bool
    occlusion mask when ``any_hit``)."""
    if tri_weights is None:
        tri_weights = pack_tri_weights(mesh)
    n = origins.shape[0]
    t_pad = tri_weights.shape[2]
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

    grid = (n_pad // RAY_TILE, t_pad // TRI_TILE)
    kern = functools.partial(_kernel, tri_tile=TRI_TILE, any_hit=any_hit)
    best_t, best_col = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
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
    )(feats, w, tminmax)

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
