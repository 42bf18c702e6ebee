"""Coherence sorting for ray batches.

The cluster-culled Pallas intersector (ops/pallas/intersect_kernel.py) culls
at (ray tile x triangle cluster) granularity: a tile of RAY_TILE=128 rays
pays for the union of its rays' cluster footprints (cluster counts below
were measured at the original 256-ray tiles).  Camera rays arrive coherent
and
cull to ~2 of 241 clusters/tile on the 123k-tri soft-shadow scene; bounce
and shadow rays arrive in lane order (= pixel order after one scatter) and
activate ~185/241, a ~10x compute blowup measured on TPU v5e.

Fix: sort lanes by a direction-major locality key before intersecting and
invert the permutation afterwards.  Key layout (32 bits, fits TPU-native
uint32 sorts):

  [6 bits: direction quantized 2 bits/axis][24 bits: origin Morton, 8/axis]

Direction-major wins over origin-major because a tile of co-located but
omnidirectional rays still sweeps the whole scene; 2 bits/axis beats
octant-only (3 bits total) and 3 bits/axis measured on both interior-random
and surface-bounce workloads (1.16 s vs 2.0 s vs 1.26 s for 1.6M interior
rays; unsorted 5.0 s).  The argsort itself costs ~34 ms at 1.6M lanes.

The reference has no analogue (per-ray recursion is order-indifferent);
this is purely a TPU-tiling concern.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _spread3_8(x):
    """Spread the low 8 bits of ``x`` so consecutive bits land 3 apart."""
    x = x & 0xFF
    x = (x | (x << 8)) & jnp.uint32(0xF00F)
    x = (x | (x << 4)) & jnp.uint32(0xC30C3)
    x = (x | (x << 2)) & jnp.uint32(0x249249)
    return x


def scene_bounds(mesh):
    """(lo, hi) AABB of a TriangleMesh, padded; traced as constants."""
    v0 = jnp.asarray(mesh.v0)
    v1 = v0 + jnp.asarray(mesh.e1)
    v2 = v0 + jnp.asarray(mesh.e2)
    lo = jnp.minimum(jnp.minimum(v0, v1), v2).min(0) - 0.1
    hi = jnp.maximum(jnp.maximum(v0, v1), v2).max(0) + 0.1
    return lo, hi


def ray_sort_key(origins, directions, lo, hi, inactive=None):
    """(N,) uint32 direction-major locality key (see module docstring).

    ``inactive``: optional (N,) bool set as the top key bit, packing dead
    lanes into trailing, fully-dead ray tiles — the cluster cull then skips
    those tiles outright instead of diluting live tiles with dead lanes."""
    q = jnp.clip((origins - lo) / (hi - lo), 0.0, 1.0)
    q = (q * 255.0).astype(jnp.uint32)
    m = ((_spread3_8(q[:, 0]) << 2) | (_spread3_8(q[:, 1]) << 1)
         | _spread3_8(q[:, 2]))
    qd = jnp.clip((directions + 1.0) * 0.5 * 3.999, 0.0, 3.0).astype(
        jnp.uint32)
    dk = (qd[:, 0] << 4) | (qd[:, 1] << 2) | qd[:, 2]
    key = (dk << 24) | m
    if inactive is not None:
        key = key | (inactive.astype(jnp.uint32) << 31)
    return key


# below this lane count tiles are too few for sorting to change the cull
MIN_SORT_LANES = 4096


def sorted_apply(fn, mesh, origins, directions, *per_ray, inactive=None):
    """Run ``fn(origins, directions, *per_ray)`` on coherence-sorted lanes
    and un-permute the result pytree back to input order.

    ``per_ray``: extra (N,)-leading arrays to permute alongside (e.g. a
    per-ray max distance).  ``inactive``: optional (N,) bool — dead lanes,
    packed last (see :func:`ray_sort_key`)."""
    if origins.shape[0] < MIN_SORT_LANES:
        return fn(origins, directions, *per_ray)
    lo, hi = scene_bounds(mesh)
    perm = jnp.argsort(
        ray_sort_key(origins, directions, lo, hi, inactive=inactive))
    out = fn(origins[perm], directions[perm],
             *(a[perm] for a in per_ray))
    # invert the permutation with one O(n) scatter instead of a second
    # O(n log n) argsort (the first one already costs ~34 ms at 1.6M lanes)
    n = perm.shape[0]
    inv = jnp.zeros((n,), perm.dtype).at[perm].set(
        jnp.arange(n, dtype=perm.dtype))
    return jax.tree.map(lambda x: x[inv], out)
