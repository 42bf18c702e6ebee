#!/usr/bin/env python3
"""Generate and EXECUTE the interactive notebook drivers (VERDICT r3
"missing" item 3: the reference's real entry points are examples/*.ipynb
with inline CV post-processing — LTS.ipynb cells 29-43; our scripted
drivers cover the function, these restore the exploratory form factor).

Writes examples/LTS_tpu.ipynb and examples/photon_tpu.ipynb with executed
outputs (nbclient, CPU backend so regeneration never depends on the
tunnel).  Re-run after estimator-visible changes.
"""

import sys

import nbformat as nbf
from nbclient import NotebookClient


def code(src):
    return nbf.v4.new_code_cell(src)


def md(src):
    return nbf.v4.new_markdown_cell(src)


LTS_CELLS = [
    md("# LTS on TPU — Cornell box path trace + control variates\n"
       "The notebook form of the reference's flagship workflow "
       "(`examples/LTS.ipynb`): build the Cornell scene, render with the "
       "NEE path tracer, then run the control-variates variance-reduction "
       "post-processing inline (reference cells 29-43).  The scripted "
       "equivalent is `examples/lts_cornell.py`; physics contracts are "
       "cited in each module.  Cells run on whatever backend JAX sees "
       "(one TPU chip here; this copy was executed on CPU so it "
       "regenerates anywhere)."),
    code("%matplotlib inline\n"
         "import numpy as np\n"
         "import jax\n"
         "import matplotlib.pyplot as plt\n"
         "print(jax.devices())"),
    md("## Scene — the LTS parity scene\n"
       "Cornell box, glass cone, ceiling area light "
       "(scene/cornell.py; geometry matches src/cornell_box.py)."),
    code("from light_transport_tpu.scene.cornell import cornell_box_scene\n"
         "scene, cfg = cornell_box_scene(width=96, height=96, spp=8,\n"
         "                               max_depth=4)\n"
         "print(f'{scene.mesh.num_triangles} triangles, '\n"
         "      f'{cfg.width}x{cfg.height} @ {cfg.spp} spp, '\n"
         "      f'depth {cfg.max_depth}')"),
    md("## Render + CV correction in one pass\n"
       "`render_cv` traces the image, records per-bounce log-pdfs, takes "
       "their **exact** `jax.grad` w.r.t. the logit-transformed input "
       "uniforms (the reference approximates this with 4·depth "
       "finite-difference re-traces per sample, src/path_tracing.py:"
       "203-249), and solves the per-pixel control-variate correction "
       "alpha = -S_cs S_cc^-1 (LTS.ipynb cell 32)."),
    code("from light_transport_tpu.integrators.control_variates import "
         "render_cv\n"
         "out = render_cv(scene, cfg, jax.random.key(0))\n"
         "plain = np.asarray(out.image_plain)\n"
         "cv = np.asarray(out.image_cv)\n"
         "var_plain = np.asarray(out.samples).var(axis=2).mean()\n"
         "print('mean plain', plain.mean(), ' mean cv', cv.mean())\n"
         "print('per-pixel sample variance', var_plain)"),
    code("fig, ax = plt.subplots(1, 2, figsize=(8, 4))\n"
         "ax[0].imshow(np.clip(plain, 0, 1)); ax[0].set_title('plain')\n"
         "ax[1].imshow(np.clip(cv, 0, 1)); ax[1].set_title('CV-corrected')\n"
         "for a in ax: a.axis('off')\n"
         "plt.tight_layout(); plt.show()"),
    md("## Pixel deep dive\n"
       "The reference's 500-extra-samples pass at hand-picked pixels "
       "(src/path_tracing.py:310-364): per-pixel sample clouds before and "
       "after the CV correction."),
    code("from light_transport_tpu.integrators.control_variates import "
         "cv_pixel_dive\n"
         "pixels = [(24, 24), (24, 72), (72, 24), (72, 72)]\n"
         "dive = cv_pixel_dive(scene, cfg, jax.random.key(1), pixels,\n"
         "                     n_samples=400)\n"
         "for k, (r, c) in enumerate(pixels):\n"
         "    s = np.asarray(dive.samples[k])\n"
         "    cvs = np.asarray(dive.corrected[k])\n"
         "    print(f'pixel ({r},{c}): mean {s.mean(0).round(4)} '\n"
         "          f'var {s.var(0).mean():.6f} -> cv var '\n"
         "          f'{cvs.var(0).mean():.6f}')"),
    md("## Cross-estimator check\n"
       "The reference's own quality control is pixel MAE between two "
       "renders (LTS.ipynb cells 36-38); same idea here with a fresh "
       "seed."),
    code("from light_transport_tpu.api import render\n"
         "img2 = np.asarray(render(scene, cfg, seed=7))\n"
         "print('MAE between independent renders:',\n"
         "      np.abs(np.clip(plain, 0, 1) - img2).mean())"),
]

PHOTON_CELLS = [
    md("# Photon transport on TPU — the capability the reference stubbed\n"
       "`src/photon_tracing.py` is an empty file; this is the completed "
       "layered-medium photon Monte Carlo (MCML conventions), the "
       "BASELINE north-star workload.  See `examples/photon_mcml.py` for "
       "the scripted driver and `tests/test_oracle.py` for the "
       "golden-value physics checks."),
    code("%matplotlib inline\n"
         "import numpy as np\n"
         "import jax\n"
         "import matplotlib.pyplot as plt\n"
         "import light_transport_tpu as lt\n"
         "from light_transport_tpu.core.config import (MediumConfig,\n"
         "                                             PhotonRunConfig)\n"
         "from light_transport_tpu.scene.medium import LayeredMedium\n"
         "print(jax.devices())"),
    md("## Semi-infinite medium — van de Hulst benchmark\n"
       "albedo 0.9, isotropic: diffuse reflectance must be 0.41550."),
    code("m = LayeredMedium.build([MediumConfig(mu_a=1.0, mu_s=9.0,\n"
         "                                      g=0.0, n=1.0)])\n"
         "res = lt.simulate(m, PhotonRunConfig(n_photons=200_000), seed=3)\n"
         "print('R_d =', res.total_reflectance(), ' (van de Hulst: 0.41550)')\n"
         "print('energy closure:', res.energy_total())"),
    md("## Layered slab with index mismatch — fluence depth profile"),
    code("from light_transport_tpu.models.presets import multilayer_mismatch\n"
         "medium, cfg = multilayer_mismatch()\n"
         "tl = lt.simulate(medium, cfg, seed=1)\n"
         "fz = np.asarray(tl.absorb_rz, np.float64).sum(axis=0)\n"
         "plt.figure(figsize=(5, 3))\n"
         "plt.semilogy(np.arange(cfg.nz) * cfg.dz, np.maximum(fz, 1e-12))\n"
         "plt.xlabel('depth z [cm]'); plt.ylabel('absorbed energy / bin')\n"
         "plt.title('layered fluence depth profile')\n"
         "plt.tight_layout(); plt.show()\n"
         "print('R_d', tl.total_reflectance(), ' T_d',\n"
         "      tl.total_transmittance(), ' A', tl.total_absorption())"),
]


def build(path, cells):
    nb = nbf.v4.new_notebook()
    nb.cells = cells
    nb.metadata.kernelspec = {
        "display_name": "Python 3", "language": "python",
        "name": "python3"}
    client = NotebookClient(nb, timeout=1200,
                            resources={"metadata": {"path": "."}})
    client.execute()
    nbf.write(nb, path)
    print("wrote", path)


if __name__ == "__main__":
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    build("examples/LTS_tpu.ipynb", LTS_CELLS)
    build("examples/photon_tpu.ipynb", PHOTON_CELLS)
