"""In-process A/B: sphere-tree leaf size x packet-kernel block size on the
random-scene bench (round-4 profile: bvh_closest_hit = 45 ms of ~95 ms,
1.21 ms/call x 37 stage-1 iterations; leaf/block were never swept for the
sphere tree — CLAUDE.md's leaf/block numbers are all capsule-mesh).

Usage: python scripts/ab_random_accel.py [--iters N]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from another_raytracer_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from another_raytracer_tpu.models import library
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import render as render_lib, vec3

W, H, SPP, DEPTH = 400, 225, 8, 8
CONFIGS = [(16, 2048), (32, 4096), (48, 4096), (40, 4096), (32, 8192),
           (48, 8192)]


def timeit(fn, *args, iters=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    iters = 4
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    cam = None
    fns = {}
    for leaf, block in CONFIGS:
        scene, cp = library.random_scene(bvh_leaf_size=leaf, bvh_block=block)
        if cam is None:
            cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)
        f = jax.jit(lambda s, c, _k=(leaf, block): render_lib.render_radiance(
            s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
            samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
        t0 = time.perf_counter()
        acc, segs = jax.block_until_ready(f(scene, cam))
        print(f"compiled leaf={leaf} blk={block} "
              f"(sph nodes={scene.n_sph_bvh_nodes}) in "
              f"{time.perf_counter()-t0:.1f} s  segments={int(segs)}")
        fns[(leaf, block)] = (f, scene)

    results = {}
    for rnd in range(3):
        for key, (f, scene) in fns.items():
            t = timeit(f, scene, cam, iters=iters)
            results.setdefault(key, []).append(t)
            print(f"round {rnd} leaf={key[0]:2d} blk={key[1]:4d}  "
                  f"{t*1000:8.2f} ms")
    print()
    for key in CONFIGS:
        print(f"leaf={key[0]:2d} blk={key[1]:4d}: {min(results[key])*1000:8.2f} ms")


if __name__ == "__main__":
    main()
