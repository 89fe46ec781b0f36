"""In-process A/B: fused emit+scatter, threefry rounds, camera RNG gating.

Variant A (old): separate emitted()+scatter(), threefry-20, lens+time camera
draws forced on.  Variant B (new defaults): fused shading, threefry-13,
pinhole/static-scene camera draws gated off.  Also the two intermediate
variants to attribute the win.  Interleaved in one process (cross-process
dispatch variance is ±15-40%, CLAUDE.md rule 8).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from another_raytracer_tpu.grad import diff
from another_raytracer_tpu.models import library
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import integrator, render as render_lib, rng
from another_raytracer_tpu.ops.pallas import mega_kernel

# This A/B measures the XLA wavefront's shading fusion; the megakernel
# ignores FUSE_SHADE and would swallow the forward arm entirely.
mega_kernel.MEGA_FORWARD = False

W, H, SPP, DEPTH, SPASS = 360, 270, 16, 8, 1


def timeit(fn, *args, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    scene, cam_params = library.cornell_box()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cam_params)
    seed = jnp.uint32(0)
    params, _ = diff.split_params(scene)
    target = jnp.zeros((W * H, 3), jnp.float32)

    # "old" pytrees: force the lens + time draws back on.
    scene_old = scene.replace(has_motion=True)
    cam_old = cam.replace(has_lens=True)

    def make(fuse, rounds, gated=None):
        integrator.FUSE_SHADE = fuse
        rng.ROUNDS = rounds
        render_lib.clear_trace_caches()  # trace-time flags (CLAUDE.md rule 11)
        if gated is None:
            gated = fuse
        s = scene if gated else scene_old
        c = cam if gated else cam_old
        fwd = jax.jit(lambda sc, cc: render_lib.render_radiance(
            sc, cc, seed, width=W, height=H, spp=SPP, samples_per_pass=SPASS,
            max_depth=DEPTH, t_min=1e-3, differentiable=False)).lower(s, c).compile()
        fb = jax.jit(lambda p, sc, cc, t: jax.value_and_grad(diff.render_loss)(
            p, sc, cc, t, seed, width=W, height=H, spp=SPP,
            samples_per_pass=SPASS, max_depth=DEPTH, t_min=1e-3,
        )).lower(params, s, c, target).compile()
        return s, c, fwd, fb

    variants = {
        "A old (sep, tf20, all-draws)": make(False, 20),
        "mid1 (fused, tf20)": make(True, 20),
        "mid2 (sep, tf13, all-draws)": make(False, 13),
        "mid3 (sep, tf13, gated)": make(False, 13, gated=True),
        "B new (fused, tf13, gated)": make(True, 13),
    }
    integrator.FUSE_SHADE = True
    rng.ROUNDS = 13

    for rep in range(3):
        print(f"--- rep {rep} ---")
        for name, (s, c, fwd, fb) in variants.items():
            dtf = timeit(fwd, s, c)
            dtb = timeit(fb, params, s, c, target)
            print(f"{name:34s} fwd {dtf*1000:7.2f} ms   fwd+bwd {dtb*1000:7.2f} ms")


if __name__ == "__main__":
    main()
