"""Differentiable renders of Perlin scenes through the forward noise
kernel (shade.noise_value_only): when the declared trainable set cannot
reach the noise argument, the diff path may use the Pallas evaluation
(values f32-ulp identical, zero p-gradient) instead of the one-hot
Lookups.  Gradients must match the Lookup formulation; argument-reaching
trainable sets must keep the Lookup path (nonzero noise-argument grads).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from another_raytracer_tpu.grad import diff
from another_raytracer_tpu.models import library
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import render as render_lib
from another_raytracer_tpu.ops.pallas import perlin_kernel

W, H, SPP, DEPTH = 16, 12, 2, 3


@pytest.fixture
def perlin_scene(monkeypatch):
    # perlin_kernel.enabled refuses CPU (Mosaic needs a chip); interpret
    # mode evaluates the same kernel for the test.
    monkeypatch.setattr(perlin_kernel, "enabled", perlin_kernel.supports)
    scene, cp = library.two_perlin_spheres()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)
    return scene, cam


def _grads(scene, cam, trainable):
    render_lib.clear_trace_caches()
    params, _ = diff.split_params(scene, trainable)
    target = jnp.zeros((W * H, 3), jnp.float32)

    def loss(p):
        return diff.render_loss(
            p, scene, cam, target, jnp.uint32(3), width=W, height=H,
            spp=SPP, samples_per_pass=1, max_depth=DEPTH, t_min=1e-3)

    return jax.tree.map(np.asarray, jax.grad(loss)(params))


def test_value_only_grads_match_lookup(perlin_scene):
    scene, cam = perlin_scene
    trainable = ("tex_ca", "background")  # cannot reach the noise argument
    g_fast = _grads(scene, cam, trainable)
    # Lookup arm: declaring tex_scale (argument-reaching) keeps the gate
    # off, so this arm evaluates noise through the one-hot Lookups.
    g_ref_full = _grads(scene, cam, trainable + ("tex_scale",))
    g_ref = {k: g_ref_full[k] for k in trainable}
    for k in trainable:
        scale = max(np.abs(g_ref[k]).max(), 1e-9)
        np.testing.assert_allclose(g_fast[k], g_ref[k], atol=1e-4 * scale,
                                   rtol=1e-4)
    # noise textures ignore tex_ca; the background gradient is the live one
    assert np.abs(g_ref["background"]).max() > 0


def test_argument_trainables_keep_lookup_path(perlin_scene):
    scene, cam = perlin_scene
    # tex_scale reaches the noise argument: its gradient must be nonzero,
    # proving the Lookup (differentiable) formulation stayed active.
    g = _grads(scene, cam, ("tex_scale",))
    assert np.abs(g["tex_scale"]).max() > 0


def test_metal_noise_keeps_lookup_path(monkeypatch):
    # fuzz steers directions; with a POSITION-CONTINUOUS noise texture in
    # the scene, d(noise)/d(fuzz) is real — the value-only gate must stay
    # off when mat_fuzz is trainable on a metal-bearing scene (caught on
    # the final scene by scripts/ab_noise_diff.py: 100% relative fuzz-grad
    # error before the gate learned this).
    from another_raytracer_tpu.models.scene import SceneBuilder

    monkeypatch.setattr(perlin_kernel, "enabled", perlin_kernel.supports)
    b = SceneBuilder(background=(0.7, 0.8, 1.0), seed=4)
    b.sphere((0, -100.5, -1), 100,
             b.lambertian(texture=b.noise_texture(2.0)))
    b.sphere((0, 0, -1), 0.5, b.metal(color=(0.9, 0.9, 0.9), fuzz=0.4))
    scene = b.build()
    cam = camera_lib.make_camera(lookfrom=(0, 0, 1), lookat=(0, 0, -1),
                                 vfov=70, aspect_ratio=W / H)
    g = _grads(scene, cam, ("mat_fuzz", "background"))
    # Through the Lookup (differentiable) noise path the fuzz gradient is
    # nonzero: metal bounces land on the noise ground at fuzz-dependent
    # points.  A silently-engaged value-only path would zero it.
    assert np.abs(g["mat_fuzz"]).max() > 0
