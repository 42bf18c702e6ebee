"""Device->host fetches with retry.

The tunneled TPU backend intermittently fails device->host transfers with
UNAVAILABLE/FAILED_PRECONDITION for a window of seconds (observed on bool
and float arrays alike).  Host-side build steps (light-table extraction,
BVH construction) fetch scene arrays back from the device; wrap those
fetches so a transient fault doesn't kill a scene build.
"""

from __future__ import annotations

import time

import numpy as np


def host_get(x, retries: int = 5, delay: float = 2.0) -> np.ndarray:
    """np.asarray(x) with retries on transient backend errors."""
    last = None
    for attempt in range(retries):
        try:
            return np.asarray(x)
        except Exception as e:  # jax.errors.JaxRuntimeError and friends
            last = e
            if attempt + 1 < retries:
                time.sleep(delay * (attempt + 1))
    raise last
