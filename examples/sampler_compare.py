"""Sampler A/B: threefry uniforms vs Owen-scrambled Sobol' (ops/qmc.py).

Renders the reference's Cornell parity scene (src/cornell_box.py geometry)
at equal spp with both samplers, measures per-image MSE against a high-spp
reference, and demonstrates the progressive-QMC property: offset passes
continue one point set, so quality keeps compounding across passes.

Artifacts: artifacts/examples/sampler_uniform.png / sampler_sobol.png and
a JSON line with the measured MSEs.
"""

import dataclasses

import numpy as np

from _common import report, save_image, timer

import jax

from light_transport_tpu.integrators.path_tracer import (
    render_image,
    render_progressive,
)
from light_transport_tpu.scene.cornell import cornell_box_scene


def main():
    scene, cfg = cornell_box_scene(width=96, height=96, spp=16, max_depth=3)
    ref = np.asarray(
        render_progressive(scene, cfg, jax.random.key(999), n_passes=64))

    out = {}
    for sampler in ["uniform", "sobol"]:
        c = dataclasses.replace(cfg, sampler=sampler)
        with timer() as t:
            img = np.asarray(render_image(scene, c, jax.random.key(0)))
        out[sampler] = {
            "mse": float(((img - ref) ** 2).mean()),
            "seconds": round(t.seconds, 3),
        }
        save_image(img, f"sampler_{sampler}.png")

    # progressive sobol: 4 offset passes of spp/4 each — one continued
    # point set, matching the single-shot sobol image (up to per-pass clip)
    c = dataclasses.replace(cfg, sampler="sobol", spp=cfg.spp // 4)
    prog = np.asarray(
        render_progressive(scene, c, jax.random.key(0), n_passes=4))
    out["sobol_progressive_4x"] = {"mse": float(((prog - ref) ** 2).mean())}

    report("sampler_compare", out["uniform"]["seconds"],
           spp=cfg.spp, uniform_mse=out["uniform"]["mse"],
           sobol_mse=out["sobol"]["mse"],
           sobol_progressive_mse=out["sobol_progressive_4x"]["mse"],
           mse_ratio=round(out["uniform"]["mse"] / out["sobol"]["mse"], 3))


if __name__ == "__main__":
    main()
