"""Unit tests for core math against closed-form answers."""

import numpy as np
import jax.numpy as jnp

from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import color, rng, vecmath


def test_reflect():
    v = jnp.array([[1.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(vecmath.reflect(v, n), [[1.0, 1.0, 0.0]], atol=1e-7)


def test_refract_straight_through():
    # Normal incidence, matched IOR: direction unchanged.
    uv = jnp.array([[0.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    out = vecmath.refract(uv, n, jnp.array([1.0]))
    np.testing.assert_allclose(out, uv, atol=1e-6)


def test_refract_snell():
    # 45 degrees into glass (eta ratio 1/1.5): sin(theta_t) = sin(45)/1.5.
    s = np.sqrt(0.5)
    uv = jnp.array([[s, -s, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    out = np.asarray(vecmath.refract(uv, n, jnp.array([1.0 / 1.5])))
    sin_t = out[0, 0] / np.linalg.norm(out[0])
    np.testing.assert_allclose(sin_t, s / 1.5, atol=1e-6)


def test_samplers_distributions():
    u = np.random.default_rng(0).uniform(size=(3, 20000)).astype(np.float32)
    d = np.asarray(vecmath.unit_vector_from_uniforms(jnp.asarray(u[0]), jnp.asarray(u[1])))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert abs(d.mean(0)).max() < 0.02  # uniform on sphere -> zero mean

    p = np.asarray(vecmath.in_unit_sphere_from_uniforms(*map(jnp.asarray, u)))
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0 + 1e-6
    # radius^3 uniform -> E[r] = 3/4
    np.testing.assert_allclose(r.mean(), 0.75, atol=0.01)

    disk = np.asarray(vecmath.in_unit_disk_from_uniforms(jnp.asarray(u[0]), jnp.asarray(u[1])))
    assert np.all(disk[:, 2] == 0.0)
    rd = np.linalg.norm(disk[:, :2], axis=-1)
    np.testing.assert_allclose(rd.mean(), 2.0 / 3.0, atol=0.01)  # E[r] on disk


def test_in_hemisphere_distribution():
    # V3 sampler equivalent of random_in_hemisphere (vec3.h:129-135):
    # a uniform ball point flipped into the normal's hemisphere.
    from another_raytracer_tpu.ops import vec3
    from another_raytracer_tpu.ops.vec3 import V3

    u = np.random.default_rng(1).uniform(size=(3, 20000)).astype(np.float32)
    n = V3.full_like(jnp.asarray(u[0]), 0.0, 1.0, 0.0)
    p = vec3.in_hemisphere_from_uniforms(*map(jnp.asarray, u), n)
    arr = vec3.to_numpy(p)
    # Entirely inside the half-ball about +y.
    assert np.all(arr[:, 1] >= 0.0)
    r = np.linalg.norm(arr, axis=-1)
    assert r.max() <= 1.0 + 1e-6
    np.testing.assert_allclose(r.mean(), 0.75, atol=0.01)  # ball radius dist
    # Folding preserves uniformity in x/z and gives E[y] = E[r]*E[|cos|] = 3/8.
    assert abs(arr[:, 0].mean()) < 0.02
    assert abs(arr[:, 2].mean()) < 0.02
    np.testing.assert_allclose(arr[:, 1].mean(), 3.0 / 8.0, atol=0.01)

    # Array-form flip helper agrees with the V3 sampler's flip rule.
    d = np.stack([u[0] - 0.5, u[1] - 0.5, u[2] - 0.5], axis=-1)
    flipped = np.asarray(vecmath.in_hemisphere(jnp.asarray(d), jnp.asarray([[0.0, 1.0, 0.0]])))
    assert np.all(flipped[:, 1] * np.abs(d[:, 1]) >= 0.0)


def test_write_color_gamma_and_clamp():
    # sum=spp*0.25 -> mean 0.25 -> gamma sqrt -> 0.5 -> 128.
    out = color.to_uint8(jnp.array([[25.0, 0.0, 1e9]]), 100)
    assert out[0, 0] == 128
    assert out[0, 1] == 0
    assert out[0, 2] == 255  # clamp ceiling 0.999 * 256 = 255


def test_camera_center_ray():
    cam = camera_lib.make_camera(
        lookfrom=(0, 0, 0), lookat=(0, 0, -1), vfov=90.0, aspect_ratio=1.0,
        aperture=0.0, focus_dist=1.0,
    )
    # Center of viewport: s = t = 0.5 -> direction straight down -z.
    d = cam.lower_left + 0.5 * cam.horizontal + 0.5 * cam.vertical - cam.origin
    np.testing.assert_allclose(np.asarray(d), [0, 0, -1], atol=1e-6)
    # Corner (s=0,t=0) for vfov 90, focus 1: (-1,-1,-1).
    np.testing.assert_allclose(np.asarray(cam.lower_left), [-1, -1, -1], atol=1e-6)


def test_camera_ray_determinism_and_jitter_range():
    cam = camera_lib.make_camera(
        lookfrom=(0, 0, 0), lookat=(0, 0, -1), vfov=90.0, aspect_ratio=2.0,
        aperture=0.0, focus_dist=1.0, time0=0.0, time1=1.0,
    )
    px = jnp.arange(10, dtype=jnp.uint32)
    sm = jnp.zeros(10, jnp.uint32)
    o1, d1, t1 = camera_lib.generate_rays(cam, px, sm, 20, 10, 7)
    o2, d2, t2 = camera_lib.generate_rays(cam, px, sm, 20, 10, 7)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    assert np.all(np.asarray(t1) >= 0.0) and np.all(np.asarray(t1) < 1.0)
