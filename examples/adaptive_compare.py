"""Adaptive sampling A/B on the glass scene (integrators/adaptive.py).

Equal total budget (H*W*spp paths), uniform vs variance-driven allocation,
MSE against a high-spp reference.  The glass tumbler concentrates variance
in its specular/refracted pixels, which is exactly where the adaptive
rounds steer the budget — artifacts include the per-pixel sample-density
map alongside the renders.
"""

import dataclasses

import numpy as np

from _common import report, save_image, timer

import jax

from light_transport_tpu.integrators.adaptive import render_adaptive
from light_transport_tpu.integrators.path_tracer import (
    render_image,
    render_progressive,
)
from light_transport_tpu.models import presets as P


def main():
    scene, cfg = P.PRESETS["glass"]()
    cfg = dataclasses.replace(cfg, width=96, height=96, spp=16, max_depth=5)
    ref = np.asarray(
        render_progressive(scene, cfg, jax.random.key(999), n_passes=48))

    with timer() as t_u:
        img_u = np.asarray(render_image(scene, cfg, jax.random.key(0)))
    with timer() as t_a:
        img_a, counts = render_adaptive(scene, cfg, jax.random.key(0),
                                        rounds=4, return_counts=True)
    img_a, counts = np.asarray(img_a), np.asarray(counts)

    save_image(img_u, "adaptive_off.png")
    save_image(img_a, "adaptive_on.png")
    # sample-density map (log scale: allocation spans orders of magnitude)
    dens = np.log1p(counts.astype(np.float32))
    save_image(np.repeat((dens / dens.max())[..., None], 3, -1),
               "adaptive_density.png")

    mse_u = float(((img_u - ref) ** 2).mean())
    mse_a = float(((img_a - ref) ** 2).mean())
    report("adaptive_compare", t_a.seconds, spp=cfg.spp,
           uniform_mse=mse_u, adaptive_mse=mse_a,
           mse_ratio=round(mse_u / mse_a, 3),
           uniform_seconds=round(t_u.seconds, 3),
           counts_min=int(counts.min()), counts_max=int(counts.max()))


if __name__ == "__main__":
    main()
