import jax
import numpy as np
import pytest

from light_transport_tpu.integrators.bdpt import (
    generate_camera_subpaths,
    generate_light_subpaths,
    render_bdpt,
)
from light_transport_tpu.integrators.path_tracer import camera_rays, render_image
from light_transport_tpu.scene.cornell import cornell_box_scene
from light_transport_tpu.tally.stats import image_mae


def test_bdpt_matches_path_tracer_diffuse_scene():
    """Both estimators are unbiased on an all-diffuse scene, so the images
    must agree within MC error — the strongest check on the MIS weights:
    any pdf bookkeeping error shifts the brightness."""
    scene, cfg = cornell_box_scene(width=20, height=20, spp=32, max_depth=4,
                                   include_cone=False)
    img_pt = np.asarray(render_image(scene, cfg, jax.random.key(0)))
    img_bd = np.asarray(render_bdpt(scene, cfg, jax.random.key(1)))
    assert abs(img_pt.mean() - img_bd.mean()) < 0.01, (
        img_pt.mean(), img_bd.mean()
    )
    assert image_mae(img_pt, img_bd) < 0.06


def test_bdpt_with_specular_scene_sane():
    scene, cfg = cornell_box_scene(width=16, height=16, spp=8, max_depth=4)
    img = np.asarray(render_bdpt(scene, cfg, jax.random.key(2)))
    assert np.all(np.isfinite(img))
    assert 0 <= img.min() and img.max() <= 1
    assert img.mean() > 0.05


def test_subpath_shapes_and_masks():
    scene, cfg = cornell_box_scene(width=8, height=8, spp=1, max_depth=3,
                                   include_cone=False)
    n = 64
    key = jax.random.key(3)
    u_aa = jax.random.uniform(key, (n, 2))
    import jax.numpy as jnp

    o, d = camera_rays(scene, cfg, jnp.tile(u_aa, (1, 1)))
    o, d = o[:n], d[:n]
    cam_u = jax.random.uniform(jax.random.fold_in(key, 1), (n, 3, 2))
    cam = generate_camera_subpaths(scene, cfg, o, d, cam_u)
    assert cam.pos.shape == (n, 3, 3)
    v = np.asarray(cam.valid)
    # validity is a prefix property: valid[k] implies valid[k-1]
    assert np.all(v[:, 1] <= v[:, 0]) and np.all(v[:, 2] <= v[:, 1])
    # closed box: every camera ray hits something
    assert v[:, 0].all()

    lv, l0 = generate_light_subpaths(scene, cfg, jax.random.fold_in(key, 2),
                                     n, cam_u)
    # light origin on the ceiling cutout
    lp = np.asarray(l0["pos"])
    np.testing.assert_allclose(lp[:, 1], 7.5, atol=1e-4)
    # most first bounces land in the box (the Cornell front face is open —
    # the camera looks in through it — so downward-sampled rays toward +z
    # legitimately escape)
    assert np.asarray(lv.valid)[:, 0].mean() > 0.6
    # light-walk throughput starts from Le * cos / (pdf_pos * pdf_dir):
    # with cosine sampling the cos cancels, leaving Le * A * pi = 800 pi
    # (invalid lanes are masked to zero)
    b0 = np.asarray(lv.beta)[:, 0]
    ok = np.asarray(lv.valid)[:, 0]
    np.testing.assert_allclose(b0[ok], 800.0 * np.pi, rtol=1e-4)


def test_bdpt_deterministic():
    scene, cfg = cornell_box_scene(width=8, height=8, spp=4, max_depth=3,
                                   include_cone=False)
    a = np.asarray(render_bdpt(scene, cfg, jax.random.key(5)))
    b = np.asarray(render_bdpt(scene, cfg, jax.random.key(5)))
    np.testing.assert_array_equal(a, b)


def test_bdpt_light_tracing_matches_path_tracer():
    """With t=1 strategies enabled, the MIS weights repartition across the
    full strategy space — any error in the splat geometry, the camera
    importance density, or the weight partition shifts the image mean."""
    scene, cfg = cornell_box_scene(width=16, height=16, spp=32, max_depth=4,
                                   include_cone=False)
    img_pt = np.asarray(render_image(scene, cfg, jax.random.key(0)))
    img_lt = np.asarray(
        render_bdpt(scene, cfg, jax.random.key(2), light_tracing=True)
    )
    assert abs(img_pt.mean() - img_lt.mean()) < 0.012, (
        img_pt.mean(), img_lt.mean()
    )
    assert image_mae(img_pt, img_lt) < 0.06


def test_bdpt_light_tracing_specular_scene():
    # light tracing adds energy PT structurally misses (light seen through
    # specular chains); the image must stay finite and sane
    scene, cfg = cornell_box_scene(width=12, height=12, spp=8, max_depth=4)
    img = np.asarray(
        render_bdpt(scene, cfg, jax.random.key(3), light_tracing=True)
    )
    assert np.isfinite(img).all() and 0 <= img.min() and img.max() <= 1
