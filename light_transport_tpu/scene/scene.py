"""Scene container — a pure pytree of device arrays.

The reference ``Scene`` jitclass (src/scene.py:30-73) mixes configuration
(width, height, max_depth), derived state (screen bounds), the image buffer,
and the full pre-drawn RNG tensors, and integrators mutate it in place.
Here the Scene is an immutable pytree of geometry/material/light tables plus
the camera; render settings live in :class:`RenderConfig` (static) and all
RNG flows through explicit keys/uniform tensors — functional purity removes
the reference's benign-data-race hazard class (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from light_transport_tpu.scene.geometry import TriangleMesh
from light_transport_tpu.scene.lights import LightTable
from light_transport_tpu.scene.material import MaterialTable


# with_bvh(treelet="auto") attaches treelet slabs past this triangle
# count — the MXU brute-force/BVH crossover (dispatch.MXU_MAX_TRIS; kept
# literal here to avoid a scene<->dispatch import cycle, guarded by a
# cross-check in tests/test_treelet.py).
TREELET_AUTO_MIN_TRIS = 1_048_576


def _auto_treelet(scene: "Scene") -> bool:
    """True when dispatch would actually route this scene through the
    treelet kernel: TPU backend, big mesh, format cap, not watertight."""
    import jax

    n = scene.mesh.v0.shape[0]
    return (not scene.watertight
            and TREELET_AUTO_MIN_TRIS < n < (1 << 24)
            and jax.default_backend() == "tpu")


@struct.dataclass
class Scene:
    mesh: TriangleMesh
    materials: MaterialTable
    lights: LightTable
    camera: np.ndarray  # (3,) pinhole position
    bvh: Optional["BVH"] = None  # set by with_bvh(); None = brute force
    # optional treelet slabs for the Pallas kernel-resident traversal
    # (ops/pallas/treelet_kernel.py) — set by with_treelet(); on TPU,
    # dispatch routes big-mesh BVH queries through it (bit-identical to
    # the roped walk, measured 1.2-8.5x faster at 4.2M tris, PERF.md)
    treelet: Optional["TreeletTables"] = None
    # optional analytic sphere/plane primitives (reference Sphere/Plane,
    # src/primitives.py:41-66, made renderable — scene/analytic.py)
    analytic: Optional["AnalyticPrims"] = None
    # optional point (delta) lights — the reference GUI's 'Point' source
    # (app.py:152-158) as a first-class table instead of a tiny emissive
    # quad; see scene/lights.PointLightTable and with_point_lights()
    point_lights: Optional["PointLightTable"] = None
    # static flag: route ALL triangle queries through the watertight
    # PBRT-style test (ops/intersect.intersect_rays_watertight) — the
    # reference flagship's convention (pc_triangle_intersect for every hit,
    # src/intersects.py:267-445 via src/utils.py:52-68).  Opt-in here
    # because the robust-MT default + inflated BVH bounds already covers
    # crack-freeness for the bundled scenes at better throughput
    # (README §Deviations 9); set it for crack-sensitive geometry.
    watertight: bool = struct.field(pytree_node=False, default=False)

    @staticmethod
    def build(mesh: TriangleMesh, materials: MaterialTable, camera,
              dtype=np.float32, analytic=None) -> "Scene":
        return Scene(
            mesh=mesh,
            materials=materials,
            lights=LightTable.build(mesh, materials, dtype=dtype),
            camera=jnp.asarray(np.asarray(camera, dtype=dtype)),
            analytic=analytic,
        )

    def with_bvh(self, max_leaf: int = 4, treelet="auto") -> "Scene":
        """Attach a BVH (host build; reorders the mesh and rebuilds the
        light table over the reordered triangle indices).

        ``treelet``: whether to also attach treelet slabs for the Pallas
        kernel-resident traversal (the measured-best TPU route for meshes
        past the MXU brute-force crossover — PERF.md §treelet-wavefront).
        ``"auto"`` (default) attaches them exactly when dispatch would use
        them: default backend is TPU, the mesh is past the crossover
        (>2^20 tris), under the table format's 2^24-tri cap, and the scene
        is not in watertight mode.  ``True`` forces the build (any
        backend — used by CPU-mesh tests), ``False`` opts out (saves the
        ~320 B/node slab HBM; a 4.2M-tri mesh carries ~0.85 GB of slabs).
        """
        from light_transport_tpu.accel import bvh as bvh_mod

        bvh, ordered = bvh_mod.build(self.mesh, max_leaf=max_leaf)
        scene = Scene(
            mesh=ordered,
            materials=self.materials,
            # keep the scene's dtype (a float64 scene must not silently
            # get a float32 light table)
            lights=LightTable.build(ordered, self.materials,
                                    dtype=self.camera.dtype),
            camera=self.camera,
            bvh=bvh,
            analytic=self.analytic,
            point_lights=self.point_lights,
            watertight=self.watertight,
        )
        if treelet is True or (treelet == "auto"
                               and _auto_treelet(scene)):
            scene = scene.with_treelet()
        return scene

    def with_treelet(self, T: int = 512) -> "Scene":
        """Attach treelet slabs for the Pallas kernel-resident traversal
        (requires a BVH; ~320 B/node of extra HBM).  On TPU, dispatch then
        routes every BVH-path query through the treelet kernel."""
        import dataclasses

        from light_transport_tpu.ops.pallas.treelet_kernel import (
            build_treelet_tables,
        )

        if self.bvh is None:
            raise ValueError("with_treelet() requires with_bvh() first")
        if self.mesh.v0.shape[0] > (1 << 24):
            # leaf prim indices (first + k) are packed as three 8-bit bf16
            # digits; >= 2^24 would silently drop high bits (ADVICE r4)
            raise ValueError(
                f"treelet tables support up to 2^24 triangles, got "
                f"{self.mesh.v0.shape[0]:,}")
        return dataclasses.replace(
            self, treelet=build_treelet_tables(self.bvh, T=T))

    def with_point_lights(self, positions, intensities, **phong) -> "Scene":
        """Attach point (delta) light sources (reference GUI 'Point'
        option, app.py:152-158).  ``positions``/``intensities`` are
        (P, 3)-broadcastable; ``**phong`` forwards the optional Whitted
        light colors (ambient/diffuse/specular) to
        :class:`~light_transport_tpu.scene.lights.PointLightTable`."""
        import dataclasses

        from light_transport_tpu.scene.lights import PointLightTable

        return dataclasses.replace(
            self, point_lights=PointLightTable.build(
                positions, intensities, dtype=self.camera.dtype, **phong))

    def with_watertight(self, on: bool = True) -> "Scene":
        """Select the watertight triangle test for every scene query (the
        reference flagship's robustness path); see the field docstring."""
        import dataclasses

        return dataclasses.replace(self, watertight=on)
