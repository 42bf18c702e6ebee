"""Public API.

Mirrors the reference's conceptual surface — build a Scene, call a render —
(``render_scene(scene, primitives, bvh)`` in each integrator module,
e.g. src/path_tracing.py:371) plus ``simulate`` for the photon-transport
capability the reference stubbed out.
"""

from __future__ import annotations

from typing import Optional

import jax

from light_transport_tpu.core.config import PhotonRunConfig, RenderConfig
from light_transport_tpu.scene.scene import Scene


def render(
    scene: Scene,
    cfg: Optional[RenderConfig] = None,
    seed: int = 0,
    integrator: str = "path",
    ray_chunk: Optional[int] = None,
):
    """Render a camera image. ``integrator``: 'path' (flagship NEE path
    tracer), 'adaptive' (path tracer + variance-driven per-pixel budget),
    'whitted' (legacy recursive ray tracer), or 'bdpt'."""
    cfg = cfg or RenderConfig()
    if cfg.sampler != "uniform" and integrator not in ("path", "adaptive"):
        # whitted/bdpt draw their own threefry streams (and the CV solve
        # needs iid samples for its covariance estimate) — refuse rather
        # than silently render with a different sampler than requested
        raise ValueError(
            f"sampler={cfg.sampler!r} applies to the path tracer only "
            f"(got integrator={integrator!r})")
    if cfg.aperture > 0.0 and integrator not in ("path", "adaptive"):
        # whitted traces one deterministic ray per pixel (reference
        # contract, src/render_old.py:202-221) — no stochastic lens to
        # sample; bdpt's camera-importance/pdf terms assume a pinhole
        # (t=1 splat strategy), so a thin lens would silently bias its
        # MIS weights.  (render_cv supports DOF; it has its own entry.)
        raise ValueError(
            f"aperture > 0 (thin-lens DOF) is supported by the path and "
            f"adaptive integrators (and render_cv) only "
            f"(got integrator={integrator!r})")
    if cfg.emission_mode == "mis" and cfg.nee_mode != "one":
        # the power heuristic weighs the NEE strategy's area-sampling
        # density; the 'all' quadrature estimator has no such density
        raise ValueError(
            "emission_mode='mis' requires nee_mode='one' (the power "
            "heuristic needs the NEE sampling density)")
    key = jax.random.key(cfg.seed if seed is None else seed)
    if integrator == "adaptive":
        from light_transport_tpu.integrators.adaptive import render_adaptive

        if cfg.fresnel_mode == "split":
            # the adaptive rounds trace through trace_paths (stochastic
            # Fresnel); silently dropping the split request would change
            # the estimator behind the caller's back
            raise ValueError(
                "integrator='adaptive' supports fresnel_mode='stochastic' "
                "only (the split tracer's host-driven deferred-branch loop "
                "is not wired into the adaptive rounds)")
        # largest round count <= 4 that divides the budget exactly (the
        # renderer requires spp % rounds == 0 for a static per-round lane
        # count); spp=1 degrades to a single uniform round
        rounds = next(r for r in (4, 3, 2, 1) if cfg.spp % r == 0)
        return render_adaptive(scene, cfg, key, rounds=rounds,
                               ray_chunk=ray_chunk)
    if integrator == "path":
        if cfg.fresnel_mode == "split":
            from light_transport_tpu.integrators.path_tracer import (
                render_image_split,
            )

            return render_image_split(scene, cfg, key, ray_chunk=ray_chunk)
        if cfg.compact_tail:
            from light_transport_tpu.integrators.path_tracer import (
                render_image_compact,
            )

            return render_image_compact(scene, cfg, key,
                                        ray_chunk=ray_chunk)
        from light_transport_tpu.integrators.path_tracer import render_image

        return render_image(scene, cfg, key, ray_chunk=ray_chunk)
    if integrator == "whitted":
        from light_transport_tpu.integrators.whitted import render_whitted

        return render_whitted(scene, cfg, key, ray_chunk=ray_chunk)
    if integrator == "bdpt":
        from light_transport_tpu.integrators.bdpt import render_bdpt

        return render_bdpt(scene, cfg, key, ray_chunk=ray_chunk)
    raise ValueError(f"unknown integrator: {integrator}")


def simulate(medium, run_cfg: Optional[PhotonRunConfig] = None, seed: int = 0):
    """Run the photon Monte Carlo engine on a layered medium; returns the
    tally pytree (reflectance, transmittance, fluence, ...)."""
    from light_transport_tpu.transport.photon import simulate_photons

    run_cfg = run_cfg or PhotonRunConfig()
    return simulate_photons(medium, run_cfg, jax.random.key(seed))
