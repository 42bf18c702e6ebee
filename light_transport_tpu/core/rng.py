"""Counter-based RNG discipline.

The reference pre-draws every random number for a render into
``(H, W, spp, max_depth)`` tensors stored on the Scene (src/scene.py:68-71) so
that a path is a *pure function of its uniforms* — the property its
control-variates research depends on.  We keep that property two ways:

- **Explicit-uniforms mode** (camera path tracer, CV pipeline): the caller
  draws a ``(lanes, max_depth, K)`` uniform tensor once and passes it in;
  tracing is a pure function of it, so gradients w.r.t. (logit-transformed)
  uniforms are exact ``jax.grad``s.
- **Counter mode** (photon engine at 1e8+ photons): threefry keys are folded
  per (batch, superstep), drawing uniforms on the fly with O(1) state.

Both use JAX's counter-based threefry, so results are reproducible and
independent of device count / sharding layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Slot layout of the per-bounce uniform vector consumed by the surface path
# tracer.  The reference consumes rand_0/rand_1 per bounce for the BSDF and
# *reuses* rand_0 for Russian roulette and the reflect/refract choice
# (src/path_tracing.py:33-34,132,150); we give each decision its own slot —
# statistically cleaner, documented deviation.
U_BSDF0 = 0  # concentric-disk / first BSDF uniform; also reflect-vs-refract
U_BSDF1 = 1  # second BSDF uniform
U_LIGHT0 = 2  # light-surface barycentric u
U_LIGHT1 = 3  # light-surface barycentric v
U_PICK = 4  # light triangle pick
U_RR = 5  # Russian roulette
U_MED = 6  # interior-medium free-flight distance (U_BSDF0/1 are reused for
# the HG scattering cosine / azimuth on in-scatter events — the surface
# BSDF is not consumed on those lanes).  AA jitter is NOT a slot here: it
# gets its own draw at camera-ray generation time (path_tracer._camera_lanes)
NUM_U = 7


def path_uniforms(key: jax.Array, lanes: int, max_depth: int,
                  dtype=jnp.float32) -> jnp.ndarray:
    """Draw the full uniform tensor for a path population: (lanes, depth, NUM_U).

    Replaces the reference's ``scene.rand_0/rand_1`` (src/scene.py:68-69).
    Uniforms are drawn in (0, 1) open interval to keep logit finite.
    """
    u = jax.random.uniform(key, (lanes, max_depth, NUM_U), dtype=dtype,
                           minval=jnp.finfo(dtype).tiny, maxval=1.0)
    return u


def logit(u: jnp.ndarray) -> jnp.ndarray:
    """Reference's logit transform of uniforms (src/scene.py:70-71)."""
    return jnp.log(u) - jnp.log1p(-u)


def sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`logit`.

    NOTE: the reference's ``sigmoid`` (src/path_tracing.py:19-21) computes
    ``1/(1+exp(x))`` — i.e. sigmoid(-x) — which silently *mirrors* its
    perturbed uniforms.  We use the standard sigmoid so that
    ``sigmoid(logit(u)) == u``; deliberate fix, documented.
    """
    return jax.nn.sigmoid(x)


def fold_step(key: jax.Array, step) -> jax.Array:
    """Per-superstep key: pure function of (seed, step counter)."""
    return jax.random.fold_in(key, step)
