"""A/B (one process, interleaved — repo rule #9): regenerating forward
wavefront vs lockstep chunk scan, on the Cornell forward render and the
capsule mesh forward render (the packet-BVH-bound workload)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from another_raytracer_tpu.models import library, mesh as mesh_lib
from another_raytracer_tpu.models.scene import SceneBuilder
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import integrator
from another_raytracer_tpu.ops import render as render_lib
from another_raytracer_tpu.ops import vec3
from another_raytracer_tpu.utils import assets


def mesh_scene():
    b = SceneBuilder(background=(0.7, 0.8, 1.0), seed=1234)
    mesh_lib.add_to_builder(b, mesh_lib.parse(assets.capsule_obj_path()))
    b.xz_rect(123, 423, 147, 412, 554, b.diffuse_light(color=(7, 7, 7)))
    b.constant_medium_sphere((0, 0, 0), 5000, 1e-4, color=(1, 1, 1))
    return b.build(bvh=True)


def bench(tag, scene, cam, W, H, SPP, DEPTH, reps=6):
    outs, fns = {}, {}
    for name, flag in (("lockstep", False), ("regen", True)):
        integrator.REGEN_FORWARD = flag
        render_lib.clear_trace_caches()  # trace-time flag (CLAUDE.md rule 11)
        f = jax.jit(lambda s, c, _f=flag: render_lib.render_radiance(
            s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
            samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
        t0 = time.perf_counter()
        outs[name] = jax.block_until_ready(f(scene, cam))
        print(f"{tag}/{name}: compile+run {time.perf_counter()-t0:.1f}s")
        fns[name] = f
    integrator.REGEN_FORWARD = True

    a = vec3.to_numpy(outs["lockstep"][0])
    b = vec3.to_numpy(outs["regen"][0])
    segs = int(outs["regen"][1])
    print(f"{tag}: bit-equal {np.array_equal(a, b)}  segs {int(outs['lockstep'][1])}"
          f" vs {segs}")

    times = {n: [] for n in fns}
    for _ in range(reps):
        for n, f in fns.items():
            t0 = time.perf_counter()
            jax.block_until_ready(f(scene, cam))
            times[n].append(time.perf_counter() - t0)
    for n in fns:
        ts = np.array(times[n][1:]) * 1000
        print(f"{tag}/{n:9s} {ts.mean():8.1f} ms (min {ts.min():.1f})  "
              f"{segs/ts.mean()/1e3:8.1f} Mrays/s")


def main():
    print("backend:", jax.default_backend())

    scene, cp = library.cornell_box()
    cam = camera_lib.make_camera(aspect_ratio=360 / 270, **cp)
    bench("cornell-fwd", scene, cam, 360, 270, 16, 8)

    mscene = mesh_scene()
    mcam = camera_lib.make_camera(
        aspect_ratio=240 / 180, lookfrom=(2, 2, 1), lookat=(0, 0, 0),
        vup=(0, 1, 0), vfov=75.0, aperture=0.0, focus_dist=10.0,
        time0=0.0, time1=1.0)
    bench("mesh-fwd", mscene, mcam, 240, 180, 8, 6)


if __name__ == "__main__":
    main()
