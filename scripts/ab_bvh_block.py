"""Packet-BVH kernel micro-benchmark on real TPU: traversal cost vs ray
coherence and block size (one process, interleaved).

Hypothesis from the 425 ms mesh render: incoherent bounce rays defeat the
shared-cursor packet traversal — any ray wanting any subtree drags the whole
block through it, degrading to O(n_nodes) per block.  Measures:
  * coherent primary rays (Morton camera order) vs randomly permuted rays vs
    hemisphere-random directions from hit points (bounce-like);
  * block sizes 256..2048;
  * optional direction-octant+origin sort preprocessing.
"""

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
from another_raytracer_tpu.ops.pallas import bvh_kernel
from another_raytracer_tpu.ops.vec3 import V3
from another_raytracer_tpu.utils import assets

W, H = 240, 180
B = W * H


def build_scene():
    b = SceneBuilder(background=(0.7, 0.8, 1.0), seed=1234)
    mesh_lib.add_to_builder(b, mesh_lib.parse(assets.capsule_obj_path()))
    return b.build(bvh=True)


def main():
    scene = build_scene()
    print(f"tris={scene.n_triangles} nodes={scene.n_bvh_nodes} "
          f"backend={jax.default_backend()} B={B}")

    cam = camera_lib.make_camera(
        aspect_ratio=W / H, lookfrom=(2, 2, 1), lookat=(0, 0, 0),
        vup=(0, 1, 0), vfov=75.0, aperture=0.0, focus_dist=10.0,
        time0=0.0, time1=1.0)
    order, _ = render_lib.morton_order(W, H)
    pix = jnp.asarray(order)
    samp = jnp.zeros((B,), jnp.uint32)
    o, d, _ = camera_lib.generate_rays(cam, pix, samp, W, H, jnp.uint32(0),
                                       needs_time=False)

    rng = np.random.default_rng(0)

    def v3np(v):
        return np.stack([np.asarray(c) for c in v], axis=-1)

    on, dn = v3np(o), v3np(d)

    # bounce-like rays: origins at primary hit points (or random in bbox),
    # directions uniform on the sphere.
    init_t = jnp.full((B,), bvh_kernel.BIG, jnp.float32)
    init_i = jnp.zeros((B,), jnp.int32)
    t0_, i0_, h0_ = jax.block_until_ready(bvh_kernel.bvh_closest_hit(
        scene.bvh_packed_nodes, scene.bvh_packed_tris, o, d, init_t, init_i,
        leaf_size=scene.bvh_leaf_size, block=scene.bvh_block))
    t_np = np.asarray(t0_)
    hit_np = np.asarray(h0_).astype(bool)
    p_np = on + np.where(hit_np, t_np, 2.0)[:, None] * dn
    dirs = rng.normal(size=(B, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    perm = rng.permutation(B)

    cases = {
        "coherent(primary)": (on, dn),
        "shuffled(primary)": (on[perm], dn[perm]),
        "bounce(randdir)": (p_np.astype(np.float32), dirs),
    }

    # octant+origin-morton sorted variant of the bounce case
    key_oct = ((dirs[:, 0] > 0).astype(np.int64) << 2) | \
              ((dirs[:, 1] > 0).astype(np.int64) << 1) | (dirs[:, 2] > 0)
    q = np.clip(((p_np - p_np.min(0)) / np.ptp(p_np, 0).clip(1e-6) * 1023), 0, 1023).astype(np.int64)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    sort_key = (key_oct << 30) | morton
    sorted_idx = np.argsort(sort_key, kind="stable")
    cases["bounce(sorted)"] = (p_np[sorted_idx].astype(np.float32), dirs[sorted_idx])

    fns = {}
    for blk in (1024, 2048, 4096):
        fns[blk] = jax.jit(
            lambda o, d, _b=blk: bvh_kernel.bvh_closest_hit(
                scene.bvh_packed_nodes, scene.bvh_packed_tris, o, d,
                jnp.full((B,), bvh_kernel.BIG, jnp.float32),
                jnp.zeros((B,), jnp.int32), block=_b,
                leaf_size=scene.bvh_leaf_size))

    inputs = {
        name: (V3(*[jnp.asarray(a[:, i]) for i in range(3)]),
               V3(*[jnp.asarray(b_[:, i]) for i in range(3)]))
        for name, (a, b_) in cases.items()
    }

    # warm up all combos
    for blk, f in fns.items():
        for name, (ov, dv) in inputs.items():
            jax.block_until_ready(f(ov, dv))

    reps = 10
    print(f"{'case':20s}" + "".join(f"  blk={b_:<5d}" for b_ in fns))
    for name, (ov, dv) in inputs.items():
        row = []
        for blk, f in fns.items():
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f(ov, dv)
            jax.block_until_ready(out)
            row.append((time.perf_counter() - t0) / reps * 1000)
        print(f"{name:20s}" + "".join(f"  {ms:7.2f}ms" for ms in row))


if __name__ == "__main__":
    main()
