"""Final-scene (scene 8) TPU measurement — round-1 VERDICT #4.

The reference BVHs its 400 ground boxes and 1000-sphere cluster
(scene_manager.cpp:176,231); this build intersects the resulting 2,401
rects + ~1,006 spheres + 2 media linearly in 512-wide [B, N] chunks.
Records whether that is acceptable and the resulting Mrays/s.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from another_raytracer_tpu.models import library
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import render as render_lib

W, H, SPP, DEPTH = 240, 180, 8, 8


def main():
    scene, cp = library.final_scene()
    print(f"final scene: {scene.n_spheres} spheres, {scene.n_rects} rects, "
          f"{scene.n_triangles} tris, {scene.n_media} media; "
          f"backend={jax.default_backend()}")
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)

    f = jax.jit(lambda s, c: render_lib.render_radiance(
        s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
        samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(scene, cam))
    print(f"compile+first run: {time.perf_counter()-t0:.1f}s")
    segs = int(out[1])

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(scene, cam)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{W}x{H} spp={SPP} depth={DEPTH}: {dt*1000:.1f} ms, "
          f"{segs/dt/1e6:.2f} Mrays/s ({segs} segments, "
          f"{segs/(W*H*SPP):.2f} per primary)")


if __name__ == "__main__":
    main()
