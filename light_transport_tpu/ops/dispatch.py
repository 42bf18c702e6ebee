"""Intersector dispatch: pick the fastest correct backend per scene.

Measured on TPU v5e (131k rays, 6320-tri teapot, PERF.md):

- fused Pallas MXU brute force: 39 ms   <- best for small/mid meshes
- XLA MXU brute force:          130 ms  (HBM-bound on the (N,4T) product)
- roped BVH + tail compaction:  232 ms  <- wins for very large meshes
- chunked VPU brute force:      CPU fallback (Pallas needs a real TPU)

Selection is static per scene (shapes + platform known at trace time).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from light_transport_tpu.ops import intersect
from light_transport_tpu.scene.scene import Scene

# above this triangle count the O(N*T) MXU brute force loses to the BVH
MXU_MAX_TRIS = 16384


def _platform() -> str:
    return jax.devices()[0].platform


def _use_pallas_mxu(scene: Scene) -> bool:
    if _platform() == "cpu":
        return False
    t = scene.mesh.v0.shape[0]
    if t > MXU_MAX_TRIS:
        return False
    # tiny scenes: the plain fused VPU brute force is already ~free
    return t > 48


def scene_intersect(scene: Scene, origins, directions,
                    ray_chunk: Optional[int] = None):
    """Nearest-hit against the scene; returns Hit (gradients stopped)."""
    if _use_pallas_mxu(scene):
        from light_transport_tpu.ops.pallas.intersect_kernel import (
            intersect_rays_pallas,
        )

        hit = intersect_rays_pallas(origins, directions, scene.mesh)
    elif scene.bvh is not None:
        from light_transport_tpu.accel import bvh as bvh_mod

        hit = bvh_mod.intersect_bvh(origins, directions, scene.mesh,
                                    scene.bvh)
    else:
        hit = intersect.intersect_rays(origins, directions, scene.mesh,
                                       ray_chunk=ray_chunk)
    return jax.tree.map(jax.lax.stop_gradient, hit)


def scene_occluded(scene: Scene, origins, directions, max_dist,
                   ray_chunk: Optional[int] = None):
    """Any-hit visibility against the scene."""
    if _use_pallas_mxu(scene):
        from light_transport_tpu.ops.pallas.intersect_kernel import (
            intersect_rays_pallas,
        )

        occ = intersect_rays_pallas(origins, directions, scene.mesh,
                                    any_hit=True, max_dist=max_dist)
    elif scene.bvh is not None:
        from light_transport_tpu.accel import bvh as bvh_mod

        occ = bvh_mod.occluded_bvh(origins, directions, scene.mesh,
                                   scene.bvh, max_dist)
    else:
        occ = intersect.occluded(origins, directions, scene.mesh, max_dist,
                                 ray_chunk=ray_chunk)
    return jax.lax.stop_gradient(occ)
