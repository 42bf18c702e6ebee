"""Detector tallies for the photon engine.

The reference has no tally subsystem (its only detector is the camera image
buffer, src/scene.py:66); this implements the MCML-style detectors the
BASELINE configs require: radial diffuse reflectance/transmittance, an (r, z)
absorption/fluence grid, and specular reflectance — all accumulated by
masked scatter-adds from the whole lane population at once.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from light_transport_tpu.core.config import PhotonRunConfig


@struct.dataclass
class PhotonTallies:
    """Raw (unnormalized) accumulated photon weight.

    Normalization follows MCML conventions: divide by photons launched
    (and cell volume for fluence).  The last radial bin is an overflow bin.
    """

    refl_r: jnp.ndarray  # (nr,) diffuse reflectance weight by exit radius
    trans_r: jnp.ndarray  # (nr,) transmittance weight by exit radius
    absorb_rz: jnp.ndarray  # (nr, nz) absorbed weight
    specular: jnp.ndarray  # () specular reflectance weight at launch
    launched: jnp.ndarray  # () photons launched
    steps: jnp.ndarray  # () photon scatter/boundary events processed
    # cartesian exit-detector image over the top surface (BASELINE config 5);
    # (nx, nx), or (1, 1) when disabled
    detector_xy: jnp.ndarray
    # exact scalar absorbed-weight accumulator: the (r,z) grid loses tiny
    # dw increments to f32 swamping in hot cells (adding ~1e-6 to ~1e3),
    # so energy accounting uses this batched-sum scalar instead
    absorbed: jnp.ndarray  # ()

    @staticmethod
    def zeros(cfg: PhotonRunConfig, dtype=jnp.float32) -> "PhotonTallies":
        nx = max(cfg.detector_nx, 1)
        return PhotonTallies(
            refl_r=jnp.zeros((cfg.nr,), dtype),
            trans_r=jnp.zeros((cfg.nr,), dtype),
            absorb_rz=jnp.zeros((cfg.nr, cfg.nz), dtype),
            specular=jnp.zeros((), dtype),
            launched=jnp.zeros((), dtype),
            steps=jnp.zeros((), dtype),
            detector_xy=jnp.zeros((nx, nx), dtype),
            absorbed=jnp.zeros((), dtype),
        )

    # --- normalized views (host-side convenience) ---------------------------

    def total_reflectance(self) -> float:
        """Diffuse reflectance R_d per launched photon."""
        return float(self.refl_r.sum() / jnp.maximum(self.launched, 1.0))

    def total_transmittance(self) -> float:
        return float(self.trans_r.sum() / jnp.maximum(self.launched, 1.0))

    def total_absorption(self) -> float:
        return float(self.absorbed / jnp.maximum(self.launched, 1.0))

    def total_absorption_grid(self) -> float:
        """Grid-summed absorption (subject to f32 swamping in hot cells;
        kept for cross-checking the spatial tally)."""
        return float(self.absorb_rz.sum() / jnp.maximum(self.launched, 1.0))

    def specular_reflectance(self) -> float:
        return float(self.specular / jnp.maximum(self.launched, 1.0))

    def energy_total(self) -> float:
        """R_sp + R_d + A + T — should be ~1 (exactly 1 in expectation)."""
        return (
            self.specular_reflectance()
            + self.total_reflectance()
            + self.total_absorption()
            + self.total_transmittance()
        )

    def fluence_rz(self, cfg: PhotonRunConfig, mu_a_grid=None) -> np.ndarray:
        """Fluence phi(r, z) = A_rz / (dV * N * mu_a)  [1/cm^2 per photon].

        ``mu_a_grid``: (nz,) absorption coefficient per depth bin (defaults
        to None -> returns A_rz / (dV * N), the absorbed energy density).
        """
        ir = np.arange(cfg.nr)
        # annular cell volume: 2 pi (ir + 0.5) dr^2 dz
        dv = 2.0 * np.pi * (ir + 0.5) * cfg.dr**2 * cfg.dz
        a = np.asarray(self.absorb_rz, np.float64)
        n = max(float(self.launched), 1.0)
        dens = a / (dv[:, None] * n)
        if mu_a_grid is not None:
            dens = dens / np.maximum(np.asarray(mu_a_grid)[None, :], 1e-12)
        return dens

    def reflectance_r(self, cfg: PhotonRunConfig) -> np.ndarray:
        """R_d(r) per unit area [1/cm^2]."""
        ir = np.arange(cfg.nr)
        da = 2.0 * np.pi * (ir + 0.5) * cfg.dr**2
        n = max(float(self.launched), 1.0)
        return np.asarray(self.refl_r, np.float64) / (da * n)
