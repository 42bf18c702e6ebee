"""Persistent XLA compilation cache.

Compiles dominate short runs in this environment: the axon tunnel's remote
Mosaic/XLA compile of a full render is 20-40 s (a Pallas photon bench ~4
min) while the steady-state render is seconds.  JAX's persistent cache
works through the tunnel (measured: second-process compile of the same
graph drops ~20x), so example drivers and bench.py opt in via this helper.

Not enabled from the package __init__ — library users keep JAX's default
behavior unless they ask.
"""

from __future__ import annotations

import os

# Three dirnames up = the repo root for an in-tree checkout; for an
# installed package that lands in site-packages' parent, which is usually
# not writable — enable_compile_cache falls back to a per-user cache dir.
DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")
USER_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "light_transport_tpu", "jax_cache")


def enable_compile_cache(path: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache (idempotent).

    Must run before the first compilation to be effective for it; later
    calls still cache subsequent compiles."""
    import jax

    if path is None:
        try:
            os.makedirs(DEFAULT_DIR, exist_ok=True)
            path = DEFAULT_DIR
        except OSError:
            path = USER_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
