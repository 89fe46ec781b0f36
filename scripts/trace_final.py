"""Profiler trace of the final-scene forward render — the BVH accel landed
(2,401 rects + 1,006 spheres now traverse packed trees) but wall time stayed
~1.4 s at 240x180 spp8, so the cost is elsewhere; measure, don't guess."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import trace_probe
from another_raytracer_tpu.models import library
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import render as render_lib

W, H, SPP, DEPTH = 240, 180, 8, 8
trace_probe.LOGDIR = "/tmp/artpu_trace_final"


def main():
    scene, cp = library.final_scene()
    print(f"accel: planar={scene.n_bvh_nodes} rect={scene.n_rect_bvh_nodes} "
          f"sphere={scene.n_sph_bvh_nodes} pallas={scene.use_pallas_bvh}")
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)

    f = jax.jit(lambda s, c: render_lib.render_radiance(
        s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
        samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
    jax.block_until_ready(f(scene, cam))

    jax.profiler.start_trace(trace_probe.LOGDIR)
    for _ in range(3):
        jax.block_until_ready(f(scene, cam))
    jax.profiler.stop_trace()
    print("trace captured")
    trace_probe.summarize()
    print("--- top individual ops ---")
    trace_probe.summarize_ops()


if __name__ == "__main__":
    main()
