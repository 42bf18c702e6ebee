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
    """np.asarray(x) with retries on transient backend errors.

    Only runtime/transport errors are retried — a genuine programming
    error (TypeError, ValueError from a non-array argument) surfaces
    immediately instead of after the full retry ladder."""
    from jax.errors import JaxRuntimeError

    attempts = max(int(retries), 1)
    for attempt in range(attempts):
        try:
            return np.asarray(x)
        except (JaxRuntimeError, RuntimeError, OSError):
            if attempt + 1 >= attempts:
                raise
            time.sleep(delay * (attempt + 1))
