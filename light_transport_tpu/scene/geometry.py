"""Triangle-soup scene geometry as SoA arrays.

Replaces the reference's per-triangle jitclasses (``Triangle`` /
``PreComputedTriangle``, src/primitives.py:17-38,99-173) with flat
``(T, 3)``-shaped arrays: one HBM-resident tensor per attribute, every kernel
broadcast over the whole soup.  We precompute edges and normals exactly as
``PreComputedTriangle.__init__`` does (src/primitives.py:108-112) but skip
its 12-float Wald transform — batched Möller–Trumbore vectorizes better on
the VPU (SURVEY.md §7 layer 2).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from flax import struct


@struct.dataclass
class TriangleMesh:
    """SoA triangle soup.

    All arrays share leading dim T (triangle count).  ``mat_id`` indexes a
    :class:`~light_transport_tpu.scene.material.MaterialTable`.
    """

    v0: np.ndarray  # (T, 3) first vertex
    e1: np.ndarray  # (T, 3) v1 - v0
    e2: np.ndarray  # (T, 3) v2 - v0
    normal: np.ndarray  # (T, 3) unit geometric normal = norm(e1 x e2)
    centroid: np.ndarray  # (T, 3)
    mat_id: np.ndarray  # (T,) int32
    is_light: np.ndarray  # (T,) bool

    @staticmethod
    def build(
        vertices: np.ndarray,
        mat_id: np.ndarray,
        is_light: Optional[np.ndarray] = None,
        dtype=np.float32,
    ) -> "TriangleMesh":
        """Build from ``(T, 3, 3)`` vertex array (tri, corner, xyz)."""
        vertices = np.asarray(vertices, dtype=np.float64)
        assert vertices.ndim == 3 and vertices.shape[1:] == (3, 3), vertices.shape
        t = vertices.shape[0]
        v0 = vertices[:, 0]
        e1 = vertices[:, 1] - v0
        e2 = vertices[:, 2] - v0
        n = np.cross(e1, e2)
        nlen = np.linalg.norm(n, axis=-1, keepdims=True)
        n = n / np.maximum(nlen, 1e-30)
        centroid = vertices.mean(axis=1)
        if is_light is None:
            is_light = np.zeros((t,), dtype=bool)
        import jax.numpy as jnp

        return TriangleMesh(
            v0=jnp.asarray(v0.astype(dtype)),
            e1=jnp.asarray(e1.astype(dtype)),
            e2=jnp.asarray(e2.astype(dtype)),
            normal=jnp.asarray(n.astype(dtype)),
            centroid=jnp.asarray(centroid.astype(dtype)),
            mat_id=jnp.asarray(np.asarray(mat_id, dtype=np.int32)),
            is_light=jnp.asarray(np.asarray(is_light, dtype=bool)),
        )

    @property
    def num_triangles(self) -> int:
        return self.v0.shape[0]

    def vertices(self) -> np.ndarray:
        """Recover the (T, 3, 3) vertex array (host-side use: BVH build, IO)."""
        from light_transport_tpu.core.hostio import host_get

        v0 = host_get(self.v0).astype(np.float64)
        e1 = host_get(self.e1).astype(np.float64)
        e2 = host_get(self.e2).astype(np.float64)
        return np.stack([v0, v0 + e1, v0 + e2], axis=1)

    def area(self) -> np.ndarray:
        """Per-triangle area = |e1 x e2| / 2."""
        from light_transport_tpu.core.hostio import host_get

        n = np.cross(host_get(self.e1).astype(np.float64),
                     host_get(self.e2).astype(np.float64))
        return 0.5 * np.linalg.norm(n, axis=-1)


def quad_triangles(a, b, c, d) -> np.ndarray:
    """Split quad (a,b,c,d) into two triangles (a,b,c), (a,c,d).

    Matches pyvista ``Rectangle(...).triangulate()`` as used throughout the
    reference's procedural builders (src/cornell_box.py:22-26 etc.).
    """
    a, b, c, d = (np.asarray(p, dtype=np.float64) for p in (a, b, c, d))
    return np.stack([np.stack([a, b, c]), np.stack([a, c, d])])


def concat_meshes(meshes: Sequence[TriangleMesh]) -> TriangleMesh:
    import jax.numpy as jnp

    return TriangleMesh(
        v0=jnp.concatenate([m.v0 for m in meshes]),
        e1=jnp.concatenate([m.e1 for m in meshes]),
        e2=jnp.concatenate([m.e2 for m in meshes]),
        normal=jnp.concatenate([m.normal for m in meshes]),
        centroid=jnp.concatenate([m.centroid for m in meshes]),
        mat_id=jnp.concatenate([m.mat_id for m in meshes]),
        is_light=jnp.concatenate([m.is_light for m in meshes]),
    )
