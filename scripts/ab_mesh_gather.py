"""A/B (one process, interleaved — repo rule #9): winner-triangle recompute
via 13 separate column gathers vs ONE packed [N,16] row gather, on the
capsule mesh scene (10,200 triangles > MAX_ONEHOT_K, so the one-hot matmul
path is unavailable and real gathers are mandatory either way).

Also records the mesh-scene forward benchmark at the end (720x540 spp16
depth8 when MESH_BENCH_FULL=1, else the quick 240x180 config).
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from another_raytracer_tpu.models import mesh as mesh_lib
from another_raytracer_tpu.models.scene import SceneBuilder
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import intersect
from another_raytracer_tpu.ops import render as render_lib
from another_raytracer_tpu.ops import vec3
from another_raytracer_tpu.utils import assets

FULL = os.environ.get("MESH_BENCH_FULL")
W, H, SPP, DEPTH = (720, 540, 16, 8) if FULL else (240, 180, 8, 6)


def build_scene():
    b = SceneBuilder(background=(0.7, 0.8, 1.0), seed=1234)
    mesh_lib.add_to_builder(b, mesh_lib.parse(assets.capsule_obj_path()))
    b.xz_rect(123, 423, 147, 412, 554, b.diffuse_light(color=(7, 7, 7)))
    b.constant_medium_sphere((0, 0, 0), 5000, 1e-4, color=(1, 1, 1))
    return b.build(bvh=True)


def main():
    scene = build_scene()
    cam = camera_lib.make_camera(
        aspect_ratio=W / H, lookfrom=(2, 2, 1), lookat=(0, 0, 0),
        vup=(0, 1, 0), vfov=75.0, aperture=0.0, focus_dist=10.0,
        time0=0.0, time1=1.0)
    print(f"workload: {W}x{H} spp={SPP} depth={DEPTH} "
          f"({W*H*SPP/1e6:.2f}M primary) backend={jax.default_backend()}")

    outs, fns = {}, {}
    for name, flag in (("col13", False), ("packed", True)):
        intersect.TRI_PACKED_RECORD = flag
        f = jax.jit(lambda scene, cam, _flag=flag: render_lib.render_radiance(
            scene, cam, jnp.uint32(0), width=W, height=H, spp=SPP,
            samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
        t0 = time.perf_counter()
        outs[name] = jax.block_until_ready(f(scene, cam))
        print(f"{name}: compiled+first run in {time.perf_counter()-t0:.1f}s")
        fns[name] = f
    intersect.TRI_PACKED_RECORD = True

    a = vec3.to_numpy(outs["col13"][0])
    b = vec3.to_numpy(outs["packed"][0])
    print("radiance allclose:", np.allclose(a, b, rtol=1e-4, atol=1e-4),
          " max|diff|:", float(np.abs(a - b).max()))

    # Interleaved timing.
    reps, times = 6, {"col13": [], "packed": []}
    for _ in range(reps):
        for name in ("col13", "packed"):
            t0 = time.perf_counter()
            jax.block_until_ready(fns[name](scene, cam))
            times[name].append(time.perf_counter() - t0)
    segs = int(outs["packed"][1])
    for name in ("col13", "packed"):
        ts = np.array(times[name][1:]) * 1000
        print(f"{name:8s} {ts.mean():8.1f} ms (min {ts.min():.1f})  "
              f"{segs/ts.mean()/1e3:8.2f} Mrays/s")
    print(f"segments={segs} ({segs/(W*H*SPP):.2f} per primary)")


if __name__ == "__main__":
    main()
