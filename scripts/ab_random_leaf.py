"""In-process A/B: random-scene sphere-tree leaf/block retune AFTER the
in-kernel sphere-record fold (leaf 32 / block 8192 was tuned pre-fold;
the fold adds ~9 vector ops per leaf-slot test, shifting the balance
toward smaller leaves).

Usage: python scripts/ab_random_leaf.py
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
from another_raytracer_tpu.ops import color as color_lib
from another_raytracer_tpu.ops import render as render_lib, vec3

W, H, SPP, DEPTH = 400, 225, 8, 8
CONFIGS = [(32, 8192), (16, 8192), (8, 8192), (32, 4096), (16, 4096)]


def main():
    fns, images = {}, {}
    for leaf, block in CONFIGS:
        scene, cp = library.random_scene(bvh_leaf_size=leaf, bvh_block=block)
        cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)
        f = jax.jit(lambda s, c: render_lib.render_radiance(
            s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
            samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
        t0 = time.perf_counter()
        acc, segs = jax.block_until_ready(f(scene, cam))
        print(f"leaf {leaf:2d} blk {block:5d} compiled "
              f"{time.perf_counter()-t0:6.1f} s  segs={int(segs)}")
        fns[(leaf, block)] = (f, scene, cam)
        images[(leaf, block)] = np.asarray(
            color_lib.to_uint8(vec3.to_numpy(acc), SPP))

    ref = images[CONFIGS[0]].astype(np.int32)
    for k, img in images.items():
        close = (np.abs(ref - img.astype(np.int32)) <= 2).all(-1)
        print(f"VALIDATE {k}: {close.mean():.4%} pixels within 2/255")

    results = {k: [] for k in fns}
    for rnd in range(3):
        for k, (f, scene, cam) in fns.items():
            out = f(scene, cam)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(5):
                out = f(scene, cam)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 5
            results[k].append(dt)
            print(f"round {rnd} leaf{k[0]:2d}/blk{k[1]:5d} {dt*1000:8.2f} ms")
    best = {k: min(v) * 1000 for k, v in results.items()}
    for k in sorted(best, key=best.get):
        print(f"{k}: {best[k]:.2f} ms")


if __name__ == "__main__":
    main()
