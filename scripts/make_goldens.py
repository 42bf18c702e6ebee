#!/usr/bin/env python3
"""Regenerate the stored golden renders under tests/golden/.

Run on the CPU backend (the same platform the test suite uses) after any
*intentional* estimator change, and commit the result together with the
change that motivated it.
"""

import os
import pathlib
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from light_transport_tpu.integrators.path_tracer import render_image
    from light_transport_tpu.scene.cornell import cornell_box_scene

    out = pathlib.Path(__file__).resolve().parents[1] / "tests" / "golden"
    out.mkdir(parents=True, exist_ok=True)

    scene, cfg = cornell_box_scene(width=48, height=48, spp=4, max_depth=3)
    img = np.asarray(render_image(scene, cfg, jax.random.key(42)),
                     np.float32)
    np.save(out / "lts_cornell_48.npy", img)
    print(f"wrote {out / 'lts_cornell_48.npy'} mean={img.mean():.5f}")


if __name__ == "__main__":
    main()
