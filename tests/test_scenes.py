"""All nine canonical scenes build and render finite images (device-only
smoke; oracle parity for the tractable ones lives in test_vs_oracle)."""

import numpy as np
import pytest

from another_raytracer_tpu.config import RenderConfig, RenderMode
from another_raytracer_tpu.models import library
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import render as render_lib
from another_raytracer_tpu.utils import assets


@pytest.mark.parametrize("alias", list(library.SceneAlias))
def test_scene_renders(alias):
    if alias == library.SceneAlias.MESH and assets.capsule_obj_path() is None:
        pytest.skip("no mesh asset")
    scene, cam_params = library.build(alias)
    cfg = RenderConfig(width=48, height=36, samples_per_pixel=2, max_depth=4,
                       samples_per_pass=2, mode=RenderMode.SINGLE)
    cam = camera_lib.make_camera(aspect_ratio=cfg.aspect_ratio, **cam_params)
    img, stats = render_lib.render(scene, cam, cfg)
    assert img.shape == (36, 48, 3) and img.dtype == np.uint8
    assert stats["segments"] > 0
    # Every scene should produce some non-black pixels at these settings.
    assert img.max() > 0


def test_scene_counts():
    """Structural expectations per scene_manager.cpp."""
    scene, _ = library.cornell_box()
    # 6 walls/light + 2 boxes x 6 rects
    assert scene.n_rects == 6 + 12
    assert scene.n_media == 0

    scene, _ = library.cornell_smoke()
    assert scene.n_rects == 6
    assert scene.n_media == 2

    scene, _ = library.two_spheres()
    assert scene.n_spheres == 2

    scene, _ = library.final_scene()
    # 400 ground boxes x 6 rects + 1 light rect
    assert scene.n_rects == 2400 + 1
    # 1 moving + glass + metal + boundary + earth + perlin + 1000 cluster
    assert scene.n_spheres == 1006
    assert scene.n_media == 2


def test_random_scene_deterministic_per_seed():
    s1, _ = library.random_scene(seed=7)
    s2, _ = library.random_scene(seed=7)
    s3, _ = library.random_scene(seed=8)
    np.testing.assert_array_equal(np.asarray(s1.sph_c0), np.asarray(s2.sph_c0))
    assert s1.n_spheres != s3.n_spheres or not np.array_equal(
        np.asarray(s1.sph_c0), np.asarray(s3.sph_c0)
    )


def test_unknown_scene_raises():
    with pytest.raises(ValueError, match="unknown scene"):
        library.build(42)


def test_empty_scene_raises():
    from another_raytracer_tpu.models.scene import SceneBuilder
    scene = SceneBuilder().build()
    cfg = RenderConfig(width=12, height=12, samples_per_pixel=1, max_depth=1)
    cam = camera_lib.make_camera(lookfrom=(0, 0, 1), lookat=(0, 0, 0), vfov=60,
                                 aspect_ratio=1.0)
    with pytest.raises(ValueError, match="empty scene"):
        render_lib.render(scene, cam, cfg)
