import pytest
import dataclasses

import jax
import numpy as np

from light_transport_tpu.integrators.path_tracer import render_image
from light_transport_tpu.scene.cornell import cornell_box_scene
from light_transport_tpu.tally.stats import image_mae


@pytest.mark.slow
def test_render_with_fat_leaves_matches_brute_force():
    # regression: traversal must honor the tree's own max_leaf (a build with
    # 32-prim leaves once silently tested only the first 4 prims per leaf)
    scene, cfg = cornell_box_scene(width=16, height=16, spp=8, max_depth=2)
    sb = scene.with_bvh(max_leaf=32)
    key = jax.random.key(3)
    img_bvh = np.asarray(render_image(sb, cfg, key))
    img_brute = np.asarray(render_image(sb.replace(bvh=None), cfg, key))
    assert abs(img_bvh.mean() - img_brute.mean()) < 1e-3


def test_render_with_bvh_matches_brute_force_direct():
    # depth-1 (direct lighting only): no chaotic path divergence.  Compare
    # the BVH scene against the *same reordered scene* with the BVH stripped
    # (so the light-table row order — and hence the uniform->light-sample
    # mapping — is identical); this isolates the intersector.
    scene, cfg = cornell_box_scene(width=24, height=24, spp=4, max_depth=1)
    sb = scene.with_bvh()
    brute_scene = sb.replace(bvh=None)
    key = jax.random.key(11)
    img_brute = np.asarray(render_image(brute_scene, cfg, key))
    img_bvh = np.asarray(render_image(sb, cfg, key))
    assert image_mae(img_brute, img_bvh) < 1e-4
    np.testing.assert_allclose(img_brute, img_bvh, atol=0.02)


@pytest.mark.slow
def test_render_with_bvh_statistical_parity_deep():
    # at depth 3 identical uniforms still diverge chaotically from last-ulp
    # hit-t differences; compare the converged estimators instead
    scene, cfg = cornell_box_scene(width=12, height=12, spp=64, max_depth=3)
    sb = scene.with_bvh()
    img_brute = np.asarray(render_image(scene, cfg, jax.random.key(1)))
    img_bvh = np.asarray(render_image(sb, cfg, jax.random.key(2)))
    # independent seeds: difference should be pure MC noise
    assert image_mae(img_brute, img_bvh) < 0.05
