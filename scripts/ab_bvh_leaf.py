"""A/B (one process, interleaved — repo rule #9): BVH leaf size x kernel
block size on the full capsule-mesh forward render.  Bigger leaves mean
fewer nodes (less shared-cursor stepping for incoherent packets) but more
unrolled triangle tests per visited leaf."""

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
from another_raytracer_tpu.ops import render as render_lib
from another_raytracer_tpu.ops import vec3
from another_raytracer_tpu.ops.pallas import bvh_kernel
from another_raytracer_tpu.utils import assets

W, H, SPP, DEPTH = 240, 180, 8, 6


def mesh_scene(leaf, block):
    b = SceneBuilder(background=(0.7, 0.8, 1.0), seed=1234)
    mesh_lib.add_to_builder(b, mesh_lib.parse(assets.capsule_obj_path()))
    b.xz_rect(123, 423, 147, 412, 554, b.diffuse_light(color=(7, 7, 7)))
    b.constant_medium_sphere((0, 0, 0), 5000, 1e-4, color=(1, 1, 1))
    return b.build(bvh=True, bvh_leaf_size=leaf, bvh_block=block)


def main():
    print("backend:", jax.default_backend())
    cam = camera_lib.make_camera(
        aspect_ratio=W / H, lookfrom=(2, 2, 1), lookat=(0, 0, 0),
        vup=(0, 1, 0), vfov=75.0, aperture=0.0, focus_dist=10.0,
        time0=0.0, time1=1.0)

    configs = [(8, 1024), (16, 1024), (32, 1024), (16, 2048), (8, 2048)]
    scenes, fns, outs = {}, {}, {}
    for leaf, block in configs:
        key = (leaf, block)
        scenes[key] = mesh_scene(leaf, block)
        f = jax.jit(lambda s, c, _k=key: render_lib.render_radiance(
            s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
            samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
        t0 = time.perf_counter()
        outs[key] = jax.block_until_ready(f(scenes[key], cam))
        print(f"leaf={leaf} block={block}: nodes={scenes[key].n_bvh_nodes} "
              f"compile+run {time.perf_counter()-t0:.1f}s")
        fns[key] = f

    ref = vec3.to_numpy(outs[(8, 1024)][0])
    for key, out in outs.items():
        a = vec3.to_numpy(out[0])
        d = np.abs(a - ref)
        print(f"{key}: vs leaf8/blk1024 max|diff| {d.max():.3e} "
              f"close={np.allclose(a, ref, rtol=1e-4, atol=1e-4)}")

    reps = 6
    times = {k: [] for k in fns}
    for _ in range(reps):
        for key, f in fns.items():
            t0 = time.perf_counter()
            jax.block_until_ready(f(scenes[key], cam))
            times[key].append(time.perf_counter() - t0)
    segs = int(outs[(8, 1024)][1])
    for key in fns:
        ts = np.array(times[key][1:]) * 1000
        print(f"leaf={key[0]:3d} block={key[1]:5d}  {ts.mean():8.1f} ms "
              f"(min {ts.min():.1f})  {segs/ts.mean()/1e3:7.1f} Mrays/s")


if __name__ == "__main__":
    main()
