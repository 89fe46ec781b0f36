"""Mesh-scene (capsule, 10,200 triangles) TPU performance: BVH lockstep
while_loop traversal vs linear chunked sweep, forward render."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from another_raytracer_tpu.models import library, mesh as mesh_lib
from another_raytracer_tpu.models.scene import SceneBuilder
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import render as render_lib
from another_raytracer_tpu.utils import assets

W, H, SPP, DEPTH, SPASS = 240, 180, 8, 6, 2


def build_mesh_scene(use_bvh, pallas="auto"):
    b = SceneBuilder(background=(0.7, 0.8, 1.0), seed=1234)
    mesh = mesh_lib.parse(assets.capsule_obj_path())
    mesh_lib.add_to_builder(b, mesh)
    b.xz_rect(123, 423, 147, 412, 554, b.diffuse_light(color=(7, 7, 7)))
    b.constant_medium_sphere((0, 0, 0), 5000, 1e-4, color=(1, 1, 1))
    return b.build(bvh=use_bvh, pallas_bvh=pallas)


def run(name, scene, cam):
    try:
        f = jax.jit(lambda s, c: render_lib.render_radiance(
            s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
            samples_per_pass=SPASS, max_depth=DEPTH, t_min=1e-3))
        out = f(scene, cam)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(scene, cam)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        segs = int(out[1])
        print(f"{name:28s} {dt*1000:9.1f} ms  {segs/dt/1e6:8.2f} Mrays/s ({segs/1e6:.2f}M segs)")
        return out
    except Exception as e:
        print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return None


def main():
    cam_params = dict(lookfrom=(2, 2, 1), lookat=(0, 0, 0), vup=(0, 1, 0),
                      vfov=75.0, aperture=0.0, focus_dist=10.0, time0=0.0, time1=1.0)
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cam_params)
    print(f"workload: {W}x{H} spp={SPP} depth={DEPTH} ({W*H*SPP/1e6:.2f}M primary)")

    pal_scene = build_mesh_scene(True, pallas=True)
    xla_scene = build_mesh_scene(True, pallas=False)
    lin_scene = build_mesh_scene(False)
    print(f"triangles={pal_scene.n_triangles} bvh_nodes={pal_scene.n_bvh_nodes}")

    import os
    p = run("BVH pallas packet kernel", pal_scene, cam)
    # NOTE: the linear sweep's XLA compile for 10k triangles takes >25 min
    # through the remote compiler; enable explicitly when needed.
    b = run("linear chunked sweep", lin_scene, cam) if os.environ.get("MESH_PERF_LINEAR") else None
    # NOTE: the XLA while_loop traversal FAULTS the TPU device on this mesh
    # (per-lane gathers over an 8k-node tree); enable explicitly to test.
    a = run("BVH XLA while_loop", xla_scene, cam) if os.environ.get("MESH_PERF_XLA_BVH") else None

    import numpy as np
    from another_raytracer_tpu.ops import vec3
    if p is not None and b is not None:
        ip = vec3.to_numpy(p[0])
        ib = vec3.to_numpy(b[0])
        print("pallas~linear:", np.allclose(ip, ib, rtol=1e-3, atol=1e-3),
              "mean diff:", float(np.abs(ip - ib).mean()))


if __name__ == "__main__":
    main()
