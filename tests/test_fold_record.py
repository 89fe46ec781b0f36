"""Kernel-folded triangle winner records (intersect.FOLD_TRI_RECORD) vs
the full [N,16] gather recompute, Pallas interpret mode.

The folded path takes (unit normal, barycentric u/v) straight from the
packet kernel's leaf tests; the FULL fold (intersect.FOLD_FULL_RECORD)
additionally takes the interpolated texcoords and material id, so shading
performs no winner-record gather at all.  The algebra differs from the
XLA recompute at ulp level (triple-product identity), so values agree to
tolerance.

FOLD_RECORD_MIN_B is patched to 0 here: the production gate only requests
aux at batch widths >= 131072 (the per-leaf fold cost is only profitable
at wide batches), far above a test-sized render.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from another_raytracer_tpu.models.scene import SceneBuilder
from another_raytracer_tpu.ops import camera as camera_lib, intersect, vec3
from another_raytracer_tpu.ops import render as render_lib

W, H = 28, 20


def _tri_scene():
    b = SceneBuilder(background=(0.7, 0.8, 1.0), seed=3)
    import math

    bary = b.lambertian(texture=b.barycentric_texture(
        (1, 0, 0), (0, 1, 0), (0, 0, 1)))
    gray = b.lambertian(color=(0.6, 0.6, 0.6))
    # An image-textured material exercises the folded texcoords (tu, tv):
    # triangle hits route the blended vertex texcoords into the atlas
    # fetch (barycentric_image_texture semantics, texture.h:135-154).
    img = (np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3) * 3) % 251
    imat = b.lambertian(texture=b.image_texture(img))
    n = 7
    for i in range(n):
        for j in range(n):
            def pt(ii, jj):
                x = -1.0 + 2.0 * ii / n
                z = -2.0 - 2.0 * jj / n
                return (x, 0.2 * math.sin(3.0 * x + 2.0 * z), z)

            def uv(ii, jj):
                return (ii / n, jj / n)

            m = (bary, gray, imat)[(i + j) % 3]
            b.triangle(pt(i, j), pt(i + 1, j), pt(i + 1, j + 1), m,
                       uvs=(uv(i, j), uv(i + 1, j), uv(i + 1, j + 1)))
            b.triangle(pt(i, j), pt(i + 1, j + 1), pt(i, j + 1), m,
                       uvs=(uv(i, j), uv(i + 1, j + 1), uv(i, j + 1)))
    cam = dict(lookfrom=(0, 1.4, 1.0), lookat=(0, 0, -3), vfov=55.0)
    return b.build(bvh=True, pallas_bvh=True), cam


@pytest.mark.parametrize("full", [False, True])
def test_fold_record_matches_recompute(full):
    scene, cam_params = _tri_scene()
    assert scene.use_pallas_bvh and scene.tri_in_bvh
    assert scene.bvh_packed_tris.shape[1] >= 17  # uv/mat columns packed
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cam_params)

    def render():
        render_lib.clear_trace_caches()
        acc, segs = render_lib.render_radiance(
            scene, cam, jnp.uint32(7), width=W, height=H, spp=2,
            samples_per_pass=1, max_depth=4, t_min=1e-3)
        return vec3.to_numpy(acc), int(segs)

    old = (intersect.FOLD_TRI_RECORD, intersect.FOLD_RECORD_MIN_B,
           intersect.FOLD_FULL_RECORD)
    try:
        intersect.FOLD_TRI_RECORD = False
        ref, segs_ref = render()
        intersect.FOLD_TRI_RECORD = True
        intersect.FOLD_RECORD_MIN_B = 0
        intersect.FOLD_FULL_RECORD = full
        got, segs_got = render()
    finally:
        (intersect.FOLD_TRI_RECORD, intersect.FOLD_RECORD_MIN_B,
         intersect.FOLD_FULL_RECORD) = old
        render_lib.clear_trace_caches()

    assert abs(segs_got - segs_ref) <= max(4, 0.01 * segs_ref)
    diff = np.abs(got - ref)
    frac_bad = (diff > 2e-2).mean()
    assert frac_bad <= 0.02, (frac_bad, diff.max())
    assert np.median(diff) < 1e-5


def test_fold_sphere_record_matches_recompute():
    # Sphere-tree analogue (random-scene class): the kernel folds the
    # winner's world outward normal + mat + has_uv; the record recomputes
    # UV from the folded normal with no winner-row gather.
    rng = np.random.default_rng(11)
    b = SceneBuilder(background=(0.7, 0.8, 1.0), seed=5)
    img = (np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3) * 7) % 251
    mats = [b.lambertian(color=(0.6, 0.3, 0.3)),
            b.metal(color=(0.8, 0.8, 0.8), fuzz=0.1),
            b.dielectric(1.5),
            b.lambertian(texture=b.checker_texture((0.1, 0.1, 0.1),
                                                   (0.9, 0.9, 0.9))),
            b.lambertian(texture=b.image_texture(img))]
    b.sphere((0, -1000, 0), 1000, mats[0])
    # TRANSFORMED spheres with non-UV-consuming materials stay fold-safe
    # (the kernel's world normal is exact under rigid transforms; only
    # image/barycentric textures would consume the object-space UV).
    xf = b.transform(rotate_y_deg=25.0, translate=(0.5, 0.0, -1.0))
    for i in range(80):
        c = (rng.uniform(-6, 6), rng.uniform(0.2, 0.6), rng.uniform(-6, 2))
        if i % 7 == 0:
            b.moving_sphere(c, (c[0], c[1] + 0.3, c[2]), 0.0, 1.0, 0.2,
                            mats[i % 5])
        elif i % 5 == 3:  # checker: world-point texture, transform-safe
            b.sphere(c, 0.25, mats[3], xform=xf)
        else:
            b.sphere(c, 0.25, mats[i % 5])
    scene = b.build(sphere_bvh=True, pallas_bvh=True)
    assert scene.sph_in_bvh and scene.use_pallas_bvh and scene.sph_fold_safe
    cam = camera_lib.make_camera(
        lookfrom=(6, 1.5, 2.5), lookat=(0, 0.3, -1), vfov=30,
        aspect_ratio=W / H, time0=0.0, time1=1.0)

    def render():
        render_lib.clear_trace_caches()
        acc, segs = render_lib.render_radiance(
            scene, cam, jnp.uint32(7), width=W, height=H, spp=2,
            samples_per_pass=1, max_depth=4, t_min=1e-3)
        return vec3.to_numpy(acc), int(segs)

    old = (intersect.FOLD_SPH_RECORD, intersect.FOLD_SPH_MIN_B)
    try:
        intersect.FOLD_SPH_RECORD = False
        ref, segs_ref = render()
        intersect.FOLD_SPH_RECORD = True
        intersect.FOLD_SPH_MIN_B = 0
        got, segs_got = render()
    finally:
        intersect.FOLD_SPH_RECORD, intersect.FOLD_SPH_MIN_B = old
        render_lib.clear_trace_caches()

    assert abs(segs_got - segs_ref) <= max(4, 0.01 * segs_ref)
    diff = np.abs(got - ref)
    frac_bad = (diff > 2e-2).mean()
    assert frac_bad <= 0.02, (frac_bad, diff.max())
    assert np.median(diff) < 1e-5


def test_fold_sphere_unsafe_with_transformed_image_sphere():
    # An image-textured sphere UNDER a transform consumes object-space UV
    # the fold cannot provide: the build must mark the scene fold-unsafe.
    b = SceneBuilder(background=(0.7, 0.8, 1.0), seed=6)
    img = np.zeros((4, 4, 3), np.uint8)
    xf = b.transform(rotate_y_deg=30.0)
    b.sphere((0, 0, -2), 1.0, b.lambertian(texture=b.image_texture(img)),
             xform=xf)
    for i in range(70):
        b.sphere((i * 0.1, 0, -4), 0.04, b.lambertian(color=(0.5, 0.5, 0.5)))
    scene = b.build(sphere_bvh=True, pallas_bvh=True)
    assert scene.sph_in_bvh
    assert not scene.sph_fold_safe
