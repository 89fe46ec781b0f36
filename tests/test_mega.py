"""Megakernel (interpret mode) vs the XLA regenerating wavefront.

The megakernel re-derives the whole forward loop (camera, RNG, sweep,
shade, regen) with the same f32 formulas; in interpret mode the arithmetic
runs through the same XLA ops, so agreement here is tight — the only
divergence is the world-baked rect/sphere geometry (world-parallelogram
test vs object-space sweep), which is ulp-level for the canonical scenes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from another_raytracer_tpu.models import library
from another_raytracer_tpu.models.scene import SceneBuilder
from another_raytracer_tpu.ops import camera as camera_lib, integrator, vec3
from another_raytracer_tpu.ops.pallas import mega_kernel

W, H, SPP, DEPTH = 24, 18, 4, 5


def _run_both(scene, cam_params, spp=SPP, seed=3):
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cam_params)
    assert (mega_kernel.supports(scene, cam)
            or mega_kernel.supports_accel(scene, cam))
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    samp0 = jnp.zeros((W * H,), jnp.uint32)
    kw = dict(width=W, height=H, sample_stride=1, sample_end=spp,
              spp_cap=spp, max_depth=DEPTH, t_min=1e-3)
    ref, ref_segs = integrator.trace_regenerative(
        scene, cam, pix, samp0, jnp.uint32(seed), **kw)
    got, got_segs = mega_kernel.trace_regenerative_mega(
        scene, cam, pix, samp0, jnp.uint32(seed), interpret=True, **kw)
    return (vec3.to_numpy(ref), int(ref_segs)), (vec3.to_numpy(got), int(got_segs))


def _check(scene, cam_params, flip_budget=0.02, **kw):
    (ref, ref_segs), (got, got_segs) = _run_both(scene, cam_params, **kw)
    # Segment counts agree to the handful of decision-boundary flips.
    assert abs(got_segs - ref_segs) <= max(4, 0.01 * ref_segs)
    diff = np.abs(got - ref)
    frac_bad = (diff > 2e-2).mean()
    assert frac_bad <= flip_budget, (
        f"{frac_bad:.2%} differ; mean={diff.mean():.2e} max={diff.max():.2e}")
    assert np.median(diff) < 1e-5


def test_cornell_box():
    scene, cam = library.cornell_box()
    _check(scene, cam)


def test_sphere_ground_metal_dielectric():
    # Lens + motion + metal + dielectric + checker in one small scene.
    b = SceneBuilder(background=(0.7, 0.8, 1.0), seed=5)
    b.sphere((0, -100.5, -1), 100,
             b.lambertian(texture=b.checker_texture((0.2, 0.3, 0.1),
                                                    (0.9, 0.9, 0.9))))
    b.sphere((0, 0, -1), 0.5, b.lambertian(color=(0.1, 0.2, 0.5)))
    b.sphere((1, 0, -1), 0.5, b.metal((0.8, 0.6, 0.2), 0.3))
    b.sphere((-1, 0, -1), 0.5, b.dielectric(1.5))
    b.moving_sphere((0, 0.8, -1), (0, 1.0, -1), 0, 1, 0.2,
                    b.lambertian(color=(0.9, 0.2, 0.2)))
    cam = dict(lookfrom=(0, 0.5, 1.5), lookat=(0, 0, -1), vfov=60.0,
               aperture=0.1, focus_dist=2.5, time0=0.0, time1=1.0)
    _check(b.build(), cam)


def test_two_spheres():
    scene, cam = library.two_spheres()
    _check(scene, cam)


def _bvh_sphere_scene():
    b = SceneBuilder(background=(0.7, 0.8, 1.0), seed=9)
    b.sphere((0, -1000, 0), 1000, b.lambertian(
        texture=b.checker_texture((0.2, 0.3, 0.1), (0.9, 0.9, 0.9))))
    rnd = np.random.default_rng(4)
    for i in range(80):
        c = (rnd.uniform(-6, 6), 0.3, rnd.uniform(-8, -1))
        k = i % 4
        if k == 0:
            m = b.lambertian(color=tuple(rnd.uniform(0.2, 0.9, 3)))
        elif k == 1:
            m = b.metal(tuple(rnd.uniform(0.5, 1.0, 3)), rnd.uniform(0, 0.4))
        elif k == 2:
            m = b.dielectric(1.5)
        else:
            m = b.lambertian(color=(0.8, 0.4, 0.2))
        b.sphere(c, 0.3, m)
    b.moving_sphere((0, 0.5, -3), (0, 0.8, -3), 0, 1, 0.3,
                    b.lambertian(color=(0.9, 0.2, 0.2)))
    cam = dict(lookfrom=(0, 1.5, 3), lookat=(0, 0, -4), vfov=50.0,
               time0=0.0, time1=1.0)
    return b.build(sphere_bvh=True), cam


def test_accel_sphere_tree():
    # BVH (accel) megakernel mode: packet DFS + material fold in-kernel
    # vs the XLA wavefront (packed-tree traversal on CPU).
    scene, cam_params = _bvh_sphere_scene()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cam_params)
    assert mega_kernel.supports_accel(scene, cam)
    assert not mega_kernel.supports(scene, cam)
    _check(scene, cam_params, spp=2)


def test_supports_gating():
    scene, cam_params = library.final_scene()
    cam = camera_lib.make_camera(aspect_ratio=1.0, **cam_params)
    assert not mega_kernel.supports(scene, cam)  # BVH + media + textures
    scene, cam_params = library.two_perlin_spheres()
    cam = camera_lib.make_camera(aspect_ratio=1.0, **cam_params)
    assert not mega_kernel.supports(scene, cam)  # perlin texture


def test_padding_and_partial_samples():
    # B not a multiple of the block: padded lanes must contribute nothing.
    scene, cam_params = library.cornell_box()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cam_params)
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    samp0 = jnp.zeros((W * H,), jnp.uint32)
    kw = dict(width=W, height=H, sample_stride=1, sample_end=2, spp_cap=2,
              max_depth=3, t_min=1e-3)
    a, sa = mega_kernel.trace_regenerative_mega(
        scene, cam, pix, samp0, jnp.uint32(0), interpret=True, block=256, **kw)
    b, sb = mega_kernel.trace_regenerative_mega(
        scene, cam, pix, samp0, jnp.uint32(0), interpret=True, block=128, **kw)
    np.testing.assert_allclose(vec3.to_numpy(a), vec3.to_numpy(b), atol=1e-6)
    assert int(sa) == int(sb)
