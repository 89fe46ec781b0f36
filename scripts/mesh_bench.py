"""Recorded mesh-scene benchmark (the reference's default workload,
main.cpp:20): capsule 10,200 textured triangles + light + global mist,
720x540 spp16 depth8 forward render on the real chip."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from another_raytracer_tpu.models import mesh as mesh_lib
from another_raytracer_tpu.models.scene import SceneBuilder
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import render as render_lib
from another_raytracer_tpu.utils import assets

W, H, SPP, DEPTH = 720, 540, 16, 8


def main():
    b = SceneBuilder(background=(0.7, 0.8, 1.0), seed=1234)
    mesh_lib.add_to_builder(b, mesh_lib.parse(assets.capsule_obj_path()))
    b.xz_rect(123, 423, 147, 412, 554, b.diffuse_light(color=(7, 7, 7)))
    b.constant_medium_sphere((0, 0, 0), 5000, 1e-4, color=(1, 1, 1))
    scene = b.build(bvh=True)
    cam = camera_lib.make_camera(
        aspect_ratio=W / H, lookfrom=(2, 2, 1), lookat=(0, 0, 0),
        vup=(0, 1, 0), vfov=75.0, aperture=0.0, focus_dist=10.0,
        time0=0.0, time1=1.0)
    print(f"mesh bench: {W}x{H} spp={SPP} depth={DEPTH} "
          f"({W*H*SPP/1e6:.1f}M primary) leaf={scene.bvh_leaf_size} "
          f"block={scene.bvh_block} backend={jax.default_backend()}")

    f = jax.jit(lambda s, c: render_lib.render_radiance(
        s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
        samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(scene, cam))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s")
    segs = int(out[1])

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(scene, cam)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"RESULT {dt*1000:.1f} ms  {segs/dt/1e6:.2f} Mrays/s  "
          f"({segs} segments, {segs/(W*H*SPP):.2f}/primary)")


if __name__ == "__main__":
    main()
